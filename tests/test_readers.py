"""File readers end-to-end: tiny on-disk Criteo/Avazu fixtures through
python and native paths produce identical batches."""

import numpy as np
import pytest

from cffm_tpu.config import get_config
from cffm_tpu.data import native
from cffm_tpu.data.readers import (avazu_batches, criteo_batches,
                                   criteo_batches_native)


@pytest.fixture()
def criteo_file(tmp_path):
    rng = np.random.default_rng(0)
    lines = []
    for _ in range(300):
        label = rng.integers(0, 2)
        ints = [("" if rng.random() < 0.2 else str(rng.integers(-1, 5000)))
                for _ in range(13)]
        cats = [f"{rng.integers(0, 2**32):08x}" for _ in range(26)]
        lines.append("\t".join([str(label)] + ints + cats))
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
