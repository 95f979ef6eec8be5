"""Independent PyTorch-CPU CFFM oracle (SURVEY.md §4.4 test strategy).

Implements the same model math as cffm_tpu.models.cffm, written
independently against torch ops, consuming numpy parameter dicts
exported from the JAX model. tests/test_oracle_parity.py asserts the
two produce identical logits (~1e-5) — this substitutes for the
unavailable reference repo (SURVEY.md §0) as the golden-value source.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F

from cffm_tpu.config import ModelConfig


def _t(x) -> torch.Tensor:
    return torch.from_numpy(np.asarray(x)).to(torch.float32)


def forward_torch(pt: dict, idt: torch.Tensor, dense_t, cfg: ModelConfig
                  ) -> torch.Tensor:
    """Differentiable core over a torch-tensor param dict. idt: (B, F)
    int64 global ids. Returns logits (B,)."""
    b, f = idt.shape
    table = pt["embed"]["table"]
    rows = F.embedding(idt, table)  # (B, F, table_width)
    rows_tr = rows[..., : cfg.row_width]

    if cfg.cross == "field_aware":
        e = rows_tr.view(b, f, f, cfg.embed_dim)
        pi, pj = np.triu_indices(f, k=1)
        m = e[:, pi, pj, :] * e[:, pj, pi, :]  # (B, P, d)
    else:
        e = rows_tr  # (B, F, d)
        pi, pj = np.triu_indices(f, k=1)
        m = e[:, pi, :] * e[:, pj, :]

    x = m  # (B, P, d): channels=P, length=d
    for layer in pt["conv"]:
        x = F.conv1d(x, layer["w"], bias=layer["b"], padding="same")
        x = F.relu(x)
        if cfg.conv_pool > 1:
            x = F.max_pool1d(x, cfg.conv_pool)
    x = x.reshape(b, -1)

    if dense_t is not None and cfg.num_dense > 0:
        x = torch.cat([x, dense_t], dim=-1)

    for layer in pt["tower"][:-1]:
        x = F.relu(x @ layer["w"] + layer["b"])
    last = pt["tower"][-1]
    logits = (x @ last["w"] + last["b"])[:, 0]

    if cfg.use_first_order:
        if cfg.fused_linear:
            lin = rows[..., cfg.row_width : cfg.row_width + 1]
        else:
            lin = F.embedding(idt, pt["linear"]["table"])  # (B, F, 1)
        logits = logits + lin.sum(dim=(1, 2)) + pt["linear"]["bias"].reshape(())
    return logits


def params_to_torch(params: dict, requires_grad: bool = False) -> dict:
    """Exported numpy param pytree -> torch tensors (nested dicts/lists)."""
    def conv(x):
        if isinstance(x, dict):
            return {k: conv(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            return [conv(v) for v in x]
        t = _t(x)
        if requires_grad:
            t.requires_grad_(True)
        return t

    return conv(params)


def forward_numpy(params: dict, ids: np.ndarray, dense, cfg: ModelConfig) -> np.ndarray:
    """ids: (B, F) global ids. Returns logits (B,) as numpy float32."""
    with torch.no_grad():
        pt = params_to_torch(params)
        idt = torch.from_numpy(ids.astype(np.int64))
        dense_t = None if dense is None else _t(dense)
        return forward_torch(pt, idt, dense_t, cfg).numpy()


def train_oracle(params: dict, cfg: ModelConfig, opt, batches) -> dict:
    """Train the oracle from exported numpy params, mirroring
    cffm_tpu.train.train_step semantics (cffm_tpu/train.py:76): dense
    Adam + per-ROW Adagrad on the tables (row-wise scalar accumulator,
    dedup-summed grads == the dense table.grad here). Returns the
    trained numpy params. SURVEY.md §5.4 convergence cross-check."""
    assert opt.dense_optimizer == "adam" and opt.sparse_optimizer == "adagrad"
    pt = params_to_torch(params)
    tables = [pt["embed"]["table"]]
    if cfg.use_first_order and not cfg.fused_linear:
        tables.append(pt["linear"]["table"])
    for t in tables:
        t.requires_grad_(True)
    dense_leaves = []

    def collect(sub):
        for v in (sub.values() if isinstance(sub, dict) else sub):
            if isinstance(v, (dict, list)):
                collect(v)
            elif isinstance(v, torch.Tensor) and not v.requires_grad:
                v.requires_grad_(True)
                dense_leaves.append(v)

    collect({"conv": pt["conv"], "tower": pt["tower"]})
    if cfg.use_first_order:
        bias = pt["linear"]["bias"]
        bias.requires_grad_(True)
        dense_leaves.append(bias)

    adam = torch.optim.Adam(dense_leaves, lr=opt.dense_lr,
                            betas=(opt.adam_b1, opt.adam_b2), eps=opt.eps)
    accums = [torch.full((t.shape[0], 1), opt.adagrad_init) for t in tables]

    for ids, dense, labels in batches:
        idt = torch.from_numpy(ids.astype(np.int64))
        dense_t = None if dense is None else _t(dense)
        logits = forward_torch(pt, idt, dense_t, cfg)
        loss = F.binary_cross_entropy_with_logits(logits, _t(labels))
        adam.zero_grad()
        for t in tables:
            t.grad = None
        loss.backward()
        adam.step()
        with torch.no_grad():
            for t, acc in zip(tables, accums):
                g = t.grad  # dense: untouched rows have g == 0 -> no-op
                acc += g.pow(2).mean(dim=1, keepdim=True)
                t -= opt.sparse_lr * g / (acc.sqrt() + opt.eps)

    def to_np(sub):
        if isinstance(sub, dict):
            return {k: to_np(v) for k, v in sub.items()}
        if isinstance(sub, list):
            return [to_np(v) for v in sub]
        return sub.detach().numpy()

    return to_np(pt)
