"""Native C++ parser vs Python readers: bit-identical semantics."""

import numpy as np
import pytest

from cffm_tpu.config import get_config
from cffm_tpu.data import native
from cffm_tpu.data.hashing import bucketize_log2, hash_strings

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable")


def _criteo_lines(n, rng):
    lines = []
    for i in range(n):
        label = rng.integers(0, 2)
        ints = [("" if rng.random() < 0.2 else str(rng.integers(-1, 10000)))
                for _ in range(13)]
        cats = [("" if rng.random() < 0.1 else f"{rng.integers(0, 2**32):08x}")
                for _ in range(26)]
        lines.append("\t".join([str(label)] + ints + cats))
    return ("\n".join(lines) + "\n").encode()


def test_fnv_parity():
    rng = np.random.default_rng(0)
    vals = np.array([f"{i:08x}".encode() for i in rng.integers(0, 2**32, 500)],
                    dtype="S16")
    got = native.hash_strings_native(vals, 99991)
    want = hash_strings(vals, 99991)
    np.testing.assert_array_equal(got, want)


def test_parse_criteo_matches_python():
    cfg = get_config("criteo_kaggle").model
    rng = np.random.default_rng(1)
    buf = _criteo_lines(200, rng)
    ids, dense, labels, consumed = native.parse_criteo_buffer(
        buf, 200, cfg.vocab_sizes)
    assert consumed == len(buf)
    assert ids.shape == (200, 39)

    # python reference on the same rows
    rows = [ln.split(b"\t") for ln in buf.rstrip(b"\n").split(b"\n")]
    want_labels = np.array([float(r[0]) for r in rows], np.float32)
    np.testing.assert_array_equal(labels, want_labels)
    ints = np.array([[int(x) if x else -1 for x in r[1:14]] for r in rows],
                    np.int64)
    for f in range(13):
        want = bucketize_log2(ints[:, f], cfg.vocab_sizes[f])
        np.testing.assert_array_equal(ids[:, f], want, err_msg=f"int field {f}")
    for f in range(26):
        col = np.array([r[14 + f] for r in rows], dtype="S16")
        want = hash_strings(col, cfg.vocab_sizes[13 + f])
        np.testing.assert_array_equal(ids[:, 13 + f], want,
                                      err_msg=f"cat field {f}")
    want_dense = np.log1p(np.maximum(ints, 0)).astype(np.float32)
    np.testing.assert_allclose(dense, want_dense, rtol=1e-6)


def test_parse_criteo_partial_row():
    cfg = get_config("criteo_kaggle").model
    rng = np.random.default_rng(2)
    buf = _criteo_lines(10, rng)
    truncated = buf[:-5]  # chop the final newline + bytes
    ids, dense, labels, consumed = native.parse_criteo_buffer(
        truncated, 10, cfg.vocab_sizes)
    assert len(ids) == 9  # last incomplete row not parsed
    assert consumed < len(truncated)


def test_parse_avazu_matches_python():
    cfg = get_config("avazu").model
    rng = np.random.default_rng(3)
    lines = []
    for i in range(100):
        ident = f"{rng.integers(0, 2**40):x}"
        click = rng.integers(0, 2)
        hour = f"1410{rng.integers(21, 31):02d}{rng.integers(0, 24):02d}"
        cats = [f"{rng.integers(0, 2**24):06x}" for _ in range(21)]
        lines.append(",".join([ident, str(click), hour] + cats))
    buf = ("\n".join(lines) + "\n").encode()
    ids, labels, consumed = native.parse_avazu_buffer(buf, 100, cfg.vocab_sizes)
    assert consumed == len(buf)

    rows = [ln.split(b",") for ln in buf.rstrip(b"\n").split(b"\n")]
    np.testing.assert_array_equal(
        labels, np.array([float(r[1]) for r in rows], np.float32))
    hh = np.array([int(r[2][-2:]) for r in rows])
    from cffm_tpu.data.readers import day_of_week_yymmdd
    dow = day_of_week_yymmdd(np.array([int(r[2][:6]) for r in rows]))
    np.testing.assert_array_equal(ids[:, 0], np.minimum(hh, cfg.vocab_sizes[0] - 1))
    np.testing.assert_array_equal(ids[:, 1], dow)
    for f in range(21):
        col = np.array([r[3 + f] for r in rows], dtype="S24")
        want = hash_strings(col, cfg.vocab_sizes[2 + f])
        np.testing.assert_array_equal(ids[:, 2 + f], want)
