"""File readers end-to-end: tiny on-disk Criteo/Avazu fixtures through
python and native paths produce identical batches."""

import numpy as np
import pytest

from cffm_tpu.config import get_config
from cffm_tpu.data import native
from cffm_tpu.data.readers import (avazu_batches, criteo_batches,
                                   criteo_batches_native, day_of_week_yymmdd)


@pytest.fixture()
def criteo_file(tmp_path):
    rng = np.random.default_rng(0)
    lines = []
    for i in range(300):
        label = rng.integers(0, 2)
        ints = [("" if rng.random() < 0.2 else str(rng.integers(-1, 5000)))
                for _ in range(13)]
        cats = [f"{rng.integers(0, 2**32):08x}" for _ in range(26)]
        lines.append("\t".join([str(label)] + ints + cats))
        if i == 150:  # malformed row: both readers must skip it
            lines.append("1\tgarbage\trow")
    p = tmp_path / "criteo.tsv"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_criteo_python_reader(criteo_file):
    cfg = get_config("criteo_kaggle").model
    it = criteo_batches(criteo_file, cfg, 128, repeat=False)
    ids, dense, labels = next(it)
    assert ids.shape == (128, 39) and dense.shape == (128, 13)
    assert set(np.unique(labels)) <= {0.0, 1.0}
    assert ids.min() >= 0
    for f in range(39):
        assert ids[:, f].max() < cfg.vocab_sizes[f]


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_criteo_native_matches_python_reader(criteo_file):
    cfg = get_config("criteo_kaggle").model
    py = list(criteo_batches(criteo_file, cfg, 100, repeat=False))
    nat = list(criteo_batches_native(criteo_file, cfg, 100, repeat=False))
    assert len(nat) >= 2
    for (pi, pd, pl), (ni, nd, nl) in zip(py, nat):
        np.testing.assert_array_equal(pi, ni)
        np.testing.assert_allclose(pd, nd, rtol=1e-6)
        np.testing.assert_array_equal(pl, nl)


def test_avazu_python_reader(tmp_path):
    rng = np.random.default_rng(1)
    lines = ["id,click,hour," + ",".join(f"C{i}" for i in range(21))]
    for _ in range(200):
        lines.append(",".join(
            [f"{rng.integers(0, 2**40):x}", str(rng.integers(0, 2)),
             f"1410{rng.integers(21, 31):02d}{rng.integers(0, 24):02d}"]
            + [f"{rng.integers(0, 2**24):06x}" for _ in range(21)]))
    p = tmp_path / "avazu.csv"
    p.write_text("\n".join(lines) + "\n")
    cfg = get_config("avazu").model
    ids, dense, labels = next(avazu_batches(str(p), cfg, 128, repeat=False))
    assert ids.shape == (128, 23) and dense is None
    assert ids[:, 0].max() < 24 and ids[:, 1].max() < 7


def test_day_of_week_real_calendar():
    # Known dates (0 = Sunday): 2014-10-21 Tue, 2014-10-31 Fri,
    # 2014-11-01 Sat (month boundary), 2014-12-31 Wed, 2015-01-01 Thu
    # (year boundary), 2016-02-29 Mon (leap day), 2016-03-01 Tue.
    got = day_of_week_yymmdd(
        np.array([141021, 141031, 141101, 141231, 150101, 160229, 160301]))
    np.testing.assert_array_equal(got, [2, 5, 6, 3, 4, 1, 2])
    # the old yymmdd % 7 proxy breaks exactly at these rollovers:
    assert (141101 - 141031) % 7 == 0  # proxy would collide, real dow differs


def test_python_reader_exact_batches_across_chunks(criteo_file):
    # 300 valid rows + 1 malformed; chunk loss from the malformed row and
    # filtering must re-accumulate to exact batch_size batches.
    cfg = get_config("criteo_kaggle").model
    batches = list(criteo_batches(criteo_file, cfg, 128, repeat=False))
    # 300 valid rows -> 2 exact batches + the flushed partial tail
    assert [len(b[2]) for b in batches] == [128, 128, 44]
    # repeat mode wraps the epoch and keeps yielding exact batches
    it = criteo_batches(criteo_file, cfg, 128, repeat=True)
    for _ in range(5):
        ids, dense, labels = next(it)
        assert ids.shape == (128, 39)


def test_multifile_dir_equals_concatenated_file(tmp_path):
    """A directory of day-files reads identically to their concatenation
    (full Criteo ships as day_0..day_23)."""
    from bench_input import _write_criteo

    cfg = get_config("criteo_kaggle").model
    whole = tmp_path / "all.tsv"
    _write_criteo(str(whole), 600)
    text = whole.read_text().splitlines(keepends=True)
    d = tmp_path / "days"
    d.mkdir()
    (d / "day_0").write_text("".join(text[:250]))
    (d / "day_1").write_text("".join(text[250:400]))
    (d / "day_2").write_text("".join(text[400:]))
    one = list(criteo_batches(str(whole), cfg, 128, repeat=False))
    many = list(criteo_batches(str(d), cfg, 128, repeat=False))
    assert len(many) == len(one)
    for (ai, ad, al), (bi, bd, bl) in zip(one, many):
        np.testing.assert_array_equal(ai, bi)
        np.testing.assert_allclose(ad, bd, rtol=1e-6)
        np.testing.assert_array_equal(al, bl)


def test_glob_and_gzip_paths(tmp_path):
    """Glob patterns resolve in sorted order, and .gz files decompress
    transparently, through both the python and native byte readers."""
    import gzip

    from bench_input import _write_criteo
    from cffm_tpu.data.readers import resolve_paths

    cfg = get_config("criteo_kaggle").model
    plain = tmp_path / "p.tsv"
    _write_criteo(str(plain), 300)
    gz = tmp_path / "day_0.tsv.gz"
    with gzip.open(gz, "wb") as f:
        f.write(plain.read_bytes())
    assert resolve_paths(str(tmp_path / "day_*.gz")) == [str(gz)]

    ref = list(criteo_batches(str(plain), cfg, 100, repeat=False))
    via_gz = list(criteo_batches(str(gz), cfg, 100, repeat=False))
    assert len(via_gz) == len(ref)
    for (ai, ad, al), (bi, bd, bl) in zip(ref, via_gz):
        np.testing.assert_array_equal(ai, bi)
        np.testing.assert_array_equal(al, bl)
    if native.available():
        nat = list(criteo_batches_native(str(gz), cfg, 100, repeat=False))
        for (ai, _, al), (bi, _, bl) in zip(ref, nat):
            np.testing.assert_array_equal(ai, bi)


def test_multifile_no_trailing_newline(tmp_path):
    """Byte chunker: a file whose last row lacks a trailing newline
    still yields that row (previously silently dropped)."""
    from bench_input import _write_criteo

    cfg = get_config("criteo_kaggle").model
    p = tmp_path / "t.tsv"
    _write_criteo(str(p), 50)
    data = p.read_bytes().rstrip(b"\n")
    p.write_bytes(data)
    if native.available():
        rows = sum(len(ids) for ids, _, _ in
                   criteo_batches_native(str(p), cfg, 32, repeat=False))
        assert rows == 50
