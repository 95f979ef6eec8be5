"""Pairwise cross construction + conv core — jnp reference path.

This is the semantic ground truth for the convolutional
feature-interaction core (SURVEY.md §1.1): build the field-pair ×
embedding-dim interaction map from pairwise Hadamard crosses (FM-style)
or field-aware crosses (FFM-style), then run a 1D conv stack over the
embedding-dim axis with the pair axis as input channels
(CCPM/FGCNN-style, SURVEY.md §1.1 "conv core").

The Pallas fused kernels (cffm_tpu/ops/interaction_conv.py) must match
this module bit-for-bit in f32 (tests/test_kernel_parity.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cffm_tpu.config import ModelConfig


@functools.lru_cache(maxsize=None)
def pair_indices(num_fields: int):
    """Static (i, j) index arrays for all ordered pairs i < j.

    Returns (pair_i, pair_j), each of shape (P,) with P = F(F-1)/2.
    """
    idx = [(i, j) for i in range(num_fields) for j in range(i + 1, num_fields)]
    pi = np.asarray([p[0] for p in idx], dtype=np.int32)
    pj = np.asarray([p[1] for p in idx], dtype=np.int32)
    return pi, pj


def build_cross_map(emb: jax.Array, cfg: ModelConfig) -> jax.Array:
    """Interaction map M of shape (B, P, d).

    emb: (B, F, d) for "hadamard", (B, F, F, d) for "field_aware"
    (emb[b, i, j] is e_{i->j}, field i's embedding dedicated to peer j).
    """
    pi, pj = pair_indices(cfg.num_fields)
    if cfg.cross == "hadamard":
        assert emb.ndim == 3
        return emb[:, pi, :] * emb[:, pj, :]
    assert emb.ndim == 4
    return emb[:, pi, pj, :] * emb[:, pj, pi, :]


def conv_core_reference(cross_map: jax.Array, conv_params, cfg: ModelConfig) -> jax.Array:
    """1D conv stack over the interaction map.

    cross_map: (B, P, d). Channels = pair axis, spatial = embed-dim axis.
    Each layer: conv1d(SAME) -> bias -> relu -> maxpool(conv_pool).
    Returns flattened (B, C_last * d_final).
    """
    x = cross_map
    dn = ("NCH", "OIH", "NCH")
    for layer in conv_params:
        w = layer["w"].astype(x.dtype)
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(1,), padding="SAME", dimension_numbers=dn,
        )
        x = x + layer["b"].astype(x.dtype)[None, :, None]
        x = jax.nn.relu(x)
        if cfg.conv_pool > 1:
            # -inf init (not finfo.min): reverse-mode autodiff of max
            # reduce_window requires the identity element.
            x = jax.lax.reduce_window(
                x, -jnp.inf,
                jax.lax.max,
                window_dimensions=(1, 1, cfg.conv_pool),
                window_strides=(1, 1, cfg.conv_pool),
                padding="VALID",
            )
    return x.reshape(x.shape[0], -1)


def interaction_conv_reference(emb: jax.Array, conv_params, cfg: ModelConfig) -> jax.Array:
    """Reference (non-Pallas) fused path: cross build + conv core."""
    return conv_core_reference(build_cross_map(emb, cfg), conv_params, cfg)
