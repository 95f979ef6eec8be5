"""MXU block cumsum (ops/scan.py) vs jnp.cumsum, exactly."""

import jax.numpy as jnp
import numpy as np
import pytest

from cffm_tpu.ops.scan import cumsum_i32


@pytest.mark.parametrize("n", [7, 128, 129, 4096, 100_000, 1 << 20])
def test_cumsum_matches(n):
    rng = np.random.default_rng(n)
    x = rng.integers(0, 2, size=n).astype(np.int32)  # 0/1 flags (the use case)
    got = np.asarray(cumsum_i32(jnp.asarray(x)))
    np.testing.assert_array_equal(got, np.cumsum(x))


def test_cumsum_all_ones_large():
    n = (1 << 21) + 77  # forces one recursion level; total fits 2^24
    got = np.asarray(cumsum_i32(jnp.ones((n,), jnp.int32)))
    np.testing.assert_array_equal(got, np.arange(1, n + 1))
