"""JAX model vs independent torch-CPU oracle (SURVEY.md §4.4).

The oracle substitutes for the unavailable reference repo as the
golden-value source: identical params (exported to numpy) must produce
identical logits to ~1e-5 in f32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cffm_tpu.config import ModelConfig
from cffm_tpu.models.cffm import field_offsets, forward, init_params
from oracle.torch_cffm import forward_numpy as torch_forward


def _cfg(cross: str, num_dense: int = 0) -> ModelConfig:
    return ModelConfig(
        num_fields=6,
        vocab_sizes=(40, 50, 60, 30, 20, 25),
        embed_dim=8,
        cross=cross,
        conv_channels=(12, 8),
        conv_kernel=3,
        conv_pool=2,
        tower_hidden=(24, 16),
        num_dense=num_dense,
        compute_dtype="float32",
    )


@pytest.mark.parametrize("cross", ["hadamard", "field_aware"])
@pytest.mark.parametrize("num_dense", [0, 4])
def test_logits_match_torch_oracle(cross, num_dense):
    cfg = _cfg(cross, num_dense)
    params = init_params(jax.random.key(42), cfg)
    np_params = jax.tree.map(np.asarray, params)

    rng = np.random.default_rng(7)
    ids_local = np.stack(
        [rng.integers(0, v, size=32) for v in cfg.vocab_sizes], axis=1
    ).astype(np.int32)
    ids = ids_local + field_offsets(cfg)[None, :].astype(np.int32)
    dense = rng.normal(size=(32, num_dense)).astype(np.float32) if num_dense else None

    jax_logits = np.asarray(
        forward(params, jnp.asarray(ids), None if dense is None else jnp.asarray(dense), cfg)
    )
    torch_logits = torch_forward(np_params, ids, dense, cfg)
    np.testing.assert_allclose(jax_logits, torch_logits, rtol=2e-4, atol=2e-5)


def test_logits_match_torch_oracle_padded_fused_linear():
    """Covers lane-padded tables + fused first-order column (F=15,d=16:
    row_width 240 -> table_width 256, fused_linear=True)."""
    cfg = ModelConfig(
        num_fields=15,
        vocab_sizes=(50,) * 15,
        embed_dim=16,
        cross="field_aware",
        conv_channels=(8,),
        conv_pool=2,
        tower_hidden=(16,),
        compute_dtype="float32",
        use_pallas=False,
    )
    assert cfg.fused_linear and cfg.table_width == 256
    params = init_params(jax.random.key(3), cfg)
    np_params = jax.tree.map(np.asarray, params)
    rng = np.random.default_rng(11)
    ids_local = np.stack(
        [rng.integers(0, v, size=16) for v in cfg.vocab_sizes], axis=1
    ).astype(np.int32)
    ids = ids_local + field_offsets(cfg)[None, :].astype(np.int32)
    jax_logits = np.asarray(forward(params, jnp.asarray(ids), None, cfg))
    torch_logits = torch_forward(np_params, ids, None, cfg)
    np.testing.assert_allclose(jax_logits, torch_logits, rtol=2e-4, atol=2e-5)
