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


def forward_numpy(params: dict, ids: np.ndarray, dense, cfg: ModelConfig) -> np.ndarray:
    """ids: (B, F) global ids. Returns logits (B,) as numpy float32."""
    with torch.no_grad():
        table = _t(params["embed"]["table"])
        idt = torch.from_numpy(ids.astype(np.int64))
        b, f = ids.shape
        rows = F.embedding(idt, table)  # (B, F, table_width)
        rows = rows[..., : cfg.row_width]

        if cfg.cross == "field_aware":
            e = rows.view(b, f, f, cfg.embed_dim)
            pi, pj = np.triu_indices(f, k=1)
            m = e[:, pi, pj, :] * e[:, pj, pi, :]  # (B, P, d)
        else:
            e = rows  # (B, F, d)
            pi, pj = np.triu_indices(f, k=1)
            m = e[:, pi, :] * e[:, pj, :]

        x = m  # (B, P, d): channels=P, length=d
        for layer in params["conv"]:
            w = _t(layer["w"])  # (C_out, C_in, k)
            bconv = _t(layer["b"])
            x = F.conv1d(x, w, bias=bconv, padding="same")
            x = F.relu(x)
            if cfg.conv_pool > 1:
                x = F.max_pool1d(x, cfg.conv_pool)
        x = x.reshape(b, -1)

        if dense is not None and cfg.num_dense > 0:
            x = torch.cat([x, _t(dense)], dim=-1)

        for layer in params["tower"][:-1]:
            x = F.relu(x @ _t(layer["w"]) + _t(layer["b"]))
        last = params["tower"][-1]
        logits = (x @ _t(last["w"]) + _t(last["b"]))[:, 0]

        if cfg.use_first_order:
            if cfg.fused_linear:
                full_rows = F.embedding(idt, table)
                lin = full_rows[..., cfg.row_width : cfg.row_width + 1]
            else:
                lin = F.embedding(idt, _t(params["linear"]["table"]))  # (B, F, 1)
            logits = logits + lin.sum(dim=(1, 2)) + float(np.asarray(params["linear"]["bias"]))
        return logits.numpy()
