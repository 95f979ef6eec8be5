"""Packed host->device wire format for training batches.

The axon-relay H2D link on this rig moves ~54 MB/s and transfers
serialize with device compute (scripts/probe_h2d.py), so the reader-fed
step pays the FULL transfer time on top of compute. Bytes on the wire
are therefore the lever: the raw feed ships (B,F) int32 ids + f32 dense
+ f32 labels (212 B/row on criteo_kaggle); this format ships 96 B/row:

  - fields with vocab <= 256        -> one uint8 column each
  - fields with vocab <= 65536      -> one uint16 column each
  - bigger fields                   -> uint16 low half + their high
    bits (ceil(log2(vocab)) - 16 per field) bit-packed little-endian
    into shared uint32 words
  - dense                           -> float16 (range after Criteo's
    log transform is tiny; f16's 10-bit mantissa beats bf16's 7)
  - labels                          -> uint8 (0/1)

Packing is vectorized numpy on the host (GB/s — negligible next to the
reader); unpacking is a handful of VPU shift/mask ops inside the jit'd
step. ids and labels are bit-exact through the wire; dense rounds to
float16 (eval AUC must be revalidated when enabling — see
docs/PLATFORM_NOTES.md).

Reference behavior target: the reference's input pipeline feeds
device-ready batches; this is the TPU-native equivalent shaped by the
relay's measured bandwidth, not a translation.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class WireSpec:
    """Static wire layout derived from the model config (hashable so it
    can ride into jit as a static argument)."""

    vocab_sizes: Tuple[int, ...]
    num_dense: int
    u8_fields: Tuple[int, ...]      # field indices, vocab <= 2**8
    u16_fields: Tuple[int, ...]     # field indices, 2**8 < vocab <= 2**16
    big_fields: Tuple[int, ...]     # field indices, vocab > 2**16
    big_hi_bits: Tuple[int, ...]    # per big field: bits above the low 16
    big_hi_offset: Tuple[int, ...]  # per big field: LSB offset in the
    # concatenated hi bitstream (word = offset // 32, shift = offset % 32;
    # a field's hi bits never straddle a word boundary — see from_vocabs)
    hi_words: int                   # number of uint32 hi words per row

    @property
    def num_fields(self) -> int:
        return len(self.vocab_sizes)

    @property
    def has_dense(self) -> bool:
        return self.num_dense > 0

    def bytes_per_row(self) -> int:
        return (len(self.u8_fields) + 2 * len(self.u16_fields)
                + 2 * len(self.big_fields) + 4 * self.hi_words + 1
                + 2 * self.num_dense)


def from_vocabs(vocab_sizes, num_dense: int = 0) -> WireSpec:
    u8, u16, big, hi_bits, hi_off = [], [], [], [], []
    off = 0
    for f, v in enumerate(vocab_sizes):
        if v <= 1 << 8:
            u8.append(f)
        elif v <= 1 << 16:
            u16.append(f)
        else:
            b = max(1, math.ceil(math.log2(v)) - 16)
            # 15, not 16: ids are int32 everywhere downstream, so vocab
            # must stay <= 2^31 — at 16 hi bits unpack's (h<<16)|lo
            # would wrap negative and clip-gather to row 0 silently.
            assert b <= 15, f"field {f} vocab {v} too large for wire format"
            # keep each field's hi bits inside one uint32 word so the
            # unpack is a single shift+mask (pad to the next word if a
            # straddle would occur)
            if off // 32 != (off + b - 1) // 32:
                off = ((off // 32) + 1) * 32
            big.append(f)
            hi_bits.append(b)
            hi_off.append(off)
            off += b
    return WireSpec(
        vocab_sizes=tuple(int(v) for v in vocab_sizes),
        num_dense=int(num_dense),
        u8_fields=tuple(u8), u16_fields=tuple(u16), big_fields=tuple(big),
        big_hi_bits=tuple(hi_bits), big_hi_offset=tuple(hi_off),
        hi_words=(off + 31) // 32,
    )


def spec_for_model(mcfg) -> WireSpec:
    return from_vocabs(mcfg.vocab_sizes, num_dense=mcfg.num_dense)


def pack(ids_local: np.ndarray, dense: Optional[np.ndarray],
         labels: np.ndarray, spec: WireSpec) -> dict:
    """Host side: LOCAL (per-field) ids (B,F) -> wire dict of numpy arrays.

    All ops are whole-array numpy; ~GB/s, negligible next to the reader.
    """
    ids_local = np.asarray(ids_local)
    b = ids_local.shape[0]
    out = {}
    if spec.u8_fields:
        out["u8"] = ids_local[:, spec.u8_fields].astype(np.uint8)
    if spec.u16_fields:
        out["u16"] = ids_local[:, spec.u16_fields].astype(np.uint16)
    if spec.big_fields:
        bigs = ids_local[:, spec.big_fields].astype(np.uint32)
        out["big_lo"] = (bigs & 0xFFFF).astype(np.uint16)
        hi = np.zeros((b, spec.hi_words), np.uint32)
        for i in range(len(spec.big_fields)):
            word = spec.big_hi_offset[i] // 32
            shift = spec.big_hi_offset[i] % 32
            # mask to the field's own hi width: an out-of-range id
            # (e.g. a .cfb written with a larger-vocab config) must not
            # OR stray bits into NEIGHBORING fields' words — contained
            # corruption matches the raw path's clip-mode gather.
            mask = np.uint32((1 << spec.big_hi_bits[i]) - 1)
            hi[:, word] |= ((bigs[:, i] >> 16) & mask) << np.uint32(shift)
        out["hi"] = hi
    if spec.has_dense and dense is not None:
        out["dense"] = np.asarray(dense).astype(np.float16)
    labels = np.asarray(labels)
    # uint8 floors soft labels silently; the wire carries binary only.
    assert labels.size == 0 or (
        (labels == 0) | (labels == 1)).all(), \
        "packed wire format carries binary labels only"
    out["labels"] = labels.astype(np.uint8)
    return out


def unpack(wire: dict, spec: WireSpec):
    """Device side (jit-friendly): wire dict -> (ids_local int32 (B,F),
    dense f32 | None, labels f32). Field order is restored exactly."""
    import jax.numpy as jnp

    cols = [None] * spec.num_fields
    if spec.u8_fields:
        u8 = wire["u8"].astype(jnp.int32)
        for j, f in enumerate(spec.u8_fields):
            cols[f] = u8[:, j]
    if spec.u16_fields:
        u16 = wire["u16"].astype(jnp.int32)
        for j, f in enumerate(spec.u16_fields):
            cols[f] = u16[:, j]
    if spec.big_fields:
        lo = wire["big_lo"].astype(jnp.uint32)
        hi = wire["hi"]
        for j, f in enumerate(spec.big_fields):
            word = spec.big_hi_offset[j] // 32
            shift = spec.big_hi_offset[j] % 32
            mask = (1 << spec.big_hi_bits[j]) - 1
            h = (hi[:, word] >> jnp.uint32(shift)) & jnp.uint32(mask)
            cols[f] = ((h << jnp.uint32(16)) | lo[:, j]).astype(jnp.int32)
    ids = jnp.stack(cols, axis=1)
    dense = None
    if spec.has_dense and "dense" in wire:
        dense = wire["dense"].astype(jnp.float32)
    labels = wire["labels"].astype(jnp.float32)
    return ids, dense, labels
