"""Multi-threaded native reader: bit-identical ordered stream + scaling
machinery (ordered_parallel_map)."""

import numpy as np
import pytest

from cffm_tpu.config import get_config
from cffm_tpu.data import native
from cffm_tpu.data.parallel_reader import ordered_parallel_map
from cffm_tpu.data.readers import criteo_batches, criteo_batches_native_mt


def test_ordered_parallel_map_preserves_order():
    items = list(range(257))
    out = list(ordered_parallel_map(iter(items), lambda x: x * x,
                                    num_threads=7, depth=5))
    assert out == [x * x for x in items]


def test_ordered_parallel_map_propagates_exception_in_order():
    def fn(x):
        if x == 5:
            raise ValueError("boom")
        return x

    gen = ordered_parallel_map(iter(range(10)), fn, num_threads=3)
    got = []
    with pytest.raises(ValueError, match="boom"):
        for v in gen:
            got.append(v)
    assert got == [0, 1, 2, 3, 4]  # everything before the failure, in order


def test_ordered_parallel_map_single_thread():
    assert list(ordered_parallel_map(iter([3, 1, 2]), lambda x: x + 1,
                                     num_threads=1)) == [4, 2, 3]


@pytest.fixture()
def criteo_file(tmp_path):
    rng = np.random.default_rng(11)
    lines = []
    for _ in range(2000):
        label = rng.integers(0, 2)
        ints = [("" if rng.random() < 0.2 else str(rng.integers(-1, 5000)))
                for _ in range(13)]
        cats = [f"{rng.integers(0, 2**32):08x}" for _ in range(26)]
        lines.append("\t".join([str(label)] + ints + cats))
    p = tmp_path / "criteo.tsv"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_mt_reader_matches_python_reader(criteo_file):
    """The MT stream must equal the python reader row-for-row when both
    use the same chunking — here we only require identical ROW SETS and
    exact batching, since chunk granularities differ."""
    cfg = get_config("criteo_kaggle").model
    mt = list(criteo_batches_native_mt(criteo_file, cfg, 256, repeat=False,
                                       num_threads=4))
    py = list(criteo_batches(criteo_file, cfg, 256, repeat=False))
    assert all(b[0].shape == (256, 39) for b in mt[:-1])
    assert len(mt[-1][0]) <= 256  # flushed tail may be partial
    # same total coverage and same per-row content (incl. the tail)
    n = min(len(mt), len(py))
    assert n >= 7 and len(mt) == len(py)
    for (mi, md, ml), (pi, pd, pl) in zip(mt[:n], py[:n]):
        np.testing.assert_array_equal(mi, pi)
        np.testing.assert_allclose(md, pd, rtol=1e-6)
        np.testing.assert_array_equal(ml, pl)


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_mt_reader_deterministic_across_thread_counts(criteo_file):
    cfg = get_config("criteo_kaggle").model
    a = list(criteo_batches_native_mt(criteo_file, cfg, 128, repeat=False,
                                      num_threads=1))
    b = list(criteo_batches_native_mt(criteo_file, cfg, 128, repeat=False,
                                      num_threads=6))
    assert len(a) == len(b)
    for (ai, ad, al), (bi, bd, bl) in zip(a, b):
        np.testing.assert_array_equal(ai, bi)
        np.testing.assert_array_equal(al, bl)


def test_feeder_bounded_when_consumer_stalls():
    """A stalled consumer (e.g. hung device) must NOT let the pipeline
    parse unboundedly ahead — total unconsumed items are capped at
    depth + num_threads."""
    import time

    from cffm_tpu.data.parallel_reader import ordered_parallel_map

    produced = []

    def src():
        for i in range(10000):
            produced.append(i)
            yield i

    g = ordered_parallel_map(src(), lambda x: x * 2, num_threads=4, depth=8)
    first = next(g)
    time.sleep(0.5)  # consumer stall: feeder must park on the slot cap
    assert first == 0
    assert len(produced) <= 8 + 4 + 2, f"feeder ran ahead: {len(produced)}"
    out = [first] + [next(g) for _ in range(99)]
    assert out == [2 * i for i in range(100)]
