import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cffm_tpu.config import ModelConfig
from cffm_tpu.models.cffm import field_offsets, forward, init_params
from cffm_tpu.ops.cross import build_cross_map, pair_indices


def small_cfg(**kw) -> ModelConfig:
    base = dict(
        num_fields=5,
        vocab_sizes=(50, 60, 70, 80, 90),
        embed_dim=8,
        cross="field_aware",
        conv_channels=(16, 16),
        conv_pool=2,
        tower_hidden=(32,),
        num_dense=0,
        compute_dtype="float32",
    )
    base.update(kw)
    return ModelConfig(**base)


def test_pair_indices():
    pi, pj = pair_indices(4)
    assert list(zip(pi.tolist(), pj.tolist())) == [
        (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)
    ]


def test_cross_map_hadamard():
    cfg = small_cfg(cross="hadamard")
    e = jnp.asarray(np.random.default_rng(0).normal(size=(3, 5, 8)), jnp.float32)
    m = build_cross_map(e, cfg)
    assert m.shape == (3, 10, 8)
    np.testing.assert_allclose(m[0, 0], e[0, 0] * e[0, 1], rtol=1e-6)
    np.testing.assert_allclose(m[2, -1], e[2, 3] * e[2, 4], rtol=1e-6)


def test_cross_map_field_aware():
    cfg = small_cfg()
    e = jnp.asarray(np.random.default_rng(0).normal(size=(2, 5, 5, 8)), jnp.float32)
    m = build_cross_map(e, cfg)
    assert m.shape == (2, 10, 8)
    np.testing.assert_allclose(m[0, 0], e[0, 0, 1] * e[0, 1, 0], rtol=1e-6)
    np.testing.assert_allclose(m[1, 4], e[1, 1, 2] * e[1, 2, 1], rtol=1e-6)


@pytest.mark.parametrize("cross", ["hadamard", "field_aware"])
@pytest.mark.parametrize("num_dense", [0, 3])
def test_forward_shapes_and_grads(cross, num_dense):
    cfg = small_cfg(cross=cross, num_dense=num_dense)
    params = init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    ids_local = np.stack(
        [rng.integers(0, v, size=16) for v in cfg.vocab_sizes], axis=1
    ).astype(np.int32)
    ids = jnp.asarray(ids_local + field_offsets(cfg)[None, :].astype(np.int32))
    dense = jnp.asarray(rng.normal(size=(16, num_dense)), jnp.float32) if num_dense else None
    logits = forward(params, ids, dense, cfg)
    assert logits.shape == (16,)
    assert bool(jnp.all(jnp.isfinite(logits)))

    def loss(p):
        return jnp.mean(forward(p, ids, dense, cfg) ** 2)

    g = jax.grad(loss)(params)
    flat, _ = jax.tree.flatten(g)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in flat)
    # conv + tower + embedding grads all nonzero
    assert float(jnp.abs(g["conv"][0]["w"]).sum()) > 0
    assert float(jnp.abs(g["tower"][0]["w"]).sum()) > 0
    assert float(jnp.abs(g["embed"]["table"]).sum()) > 0


def test_field_offsets():
    cfg = small_cfg()
    off = field_offsets(cfg)
    assert off.tolist() == [0, 50, 110, 180, 260]
    assert cfg.total_vocab == 350
