"""On-SILICON parity sweep for the Pallas kernels' numeric contracts.

The CPU test tier runs every kernel in interpret mode, which executes
the Python semantics — NOT the Mosaic lowering. Mosaic-only bugs are
invisible there: on 2026-08-20 `hi << 16` on an (EB, 1) int32 value
lowered to 0 on silicon (ids >= 2^16 silently lost their high bytes in
sorted_segment's uid flush) while every interpret-mode test passed,
and the flagship AUC quietly dropped 0.6187 -> 0.6092. Run this after
ANY kernel change, on the real chip (it is part of the verify skill).

Exit code 0 = all parities hold.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys

import jax
import jax.numpy as jnp
import numpy as np


def check_sorted_segment() -> bool:
    """uids/gsum/count vs numpy reference, incl. ids >= 2^16 and >= 2^24
    (bytes 2 and 3 of the base-256 rider), non-EB-multiple n, and a
    heavy-duplicate stream."""
    from cffm_tpu.ops.sorted_segment import sorted_segment_sum_compact

    ok = True
    cases = [(8000, 26_000_000), (8192, 2_600_000), (12345, 70_000),
             (8192, 3_000), (300, 17_000_000)]
    for trial, (n, vmax) in enumerate(cases):
        rng = np.random.default_rng(trial)
        w = 256
        sid = np.sort(rng.integers(0, vmax, size=n)).astype(np.int32)
        grads = rng.normal(size=(n, w)).astype(np.float32)
        uu, inv = np.unique(sid, return_inverse=True)
        m_pad = ((len(uu) + 255) // 128) * 128
        # alternate the static id-bound hint so BOTH rider paths run on
        # silicon: narrow (1-component, vmax < 2^24) and wide (2-half)
        max_id = vmax if trial % 2 == 0 else None
        uids, gsum, count = sorted_segment_sum_compact(
            jnp.asarray(sid), jnp.asarray(grads), m_pad, interpret=False,
            max_id=max_id)
        uids = np.asarray(uids)
        ref = np.zeros((len(uu), w), np.float32)
        np.add.at(ref, inv, grads)
        gerr = float(np.max(np.abs(
            np.asarray(gsum[: len(uu)]).astype(np.float32) - ref)
            / (np.abs(ref) + 1)))
        good = (np.array_equal(uids[: len(uu)], uu)
                and int(count) == len(uu)
                and bool(np.all(uids[int(count):] == -1))
                and gerr < 0.05)  # bf16 grad inputs
        print(f"sorted_segment[{trial}] n={n} vmax={vmax} "
              f"uniq={len(uu)} gerr={gerr:.4f} -> "
              f"{'ok' if good else 'FAIL'}")
        ok &= good
    return ok


def check_streamed_apply() -> bool:
    """Streamed adagrad apply vs the XLA scatter reference on a bf16
    table with ids spanning > 2^16 rows."""
    import dataclasses

    from cffm_tpu.config import OptimizerConfig
    from cffm_tpu.optim.rowwise import rowwise_init, rowwise_update

    rng = np.random.default_rng(7)
    v, w, n = 140_000, 256, 4096
    table = (0.01 * rng.normal(size=(v, w))).astype(np.float32)
    ids = rng.integers(0, v, size=n).astype(np.int32)
    grads = (0.01 * rng.normal(size=(n, w))).astype(np.float32)
    opt_s = OptimizerConfig(sparse_optimizer="adagrad", sparse_lr=0.05,
                            streamed_update="on")
    opt_x = dataclasses.replace(opt_s, streamed_update="off")
    outs = {}
    for name, opt in (("streamed", opt_s), ("scatter", opt_x)):
        t = jnp.asarray(table)
        st = rowwise_init(t, opt)
        nt, nst = rowwise_update(t, st, jnp.asarray(ids), jnp.asarray(grads),
                                 opt, max_unique=n + 1)
        outs[name] = (np.asarray(nt), np.asarray(nst["accum"]))
    dt = float(np.max(np.abs(outs["streamed"][0] - outs["scatter"][0])))
    da = float(np.max(np.abs(outs["streamed"][1] - outs["scatter"][1])))
    # streamed sums grads in bf16 windows; scatter path is exact f32
    good = dt < 5e-3 and da < 5e-4
    print(f"streamed_apply dtable={dt:.2e} daccum={da:.2e} -> "
          f"{'ok' if good else 'FAIL'}")
    return good


def check_interaction_kernel() -> bool:
    """fm + batch-major full-rows kernels vs the XLA reference forward
    on silicon (bf16 compute, loose tolerance)."""
    from cffm_tpu.config import ModelConfig
    from cffm_tpu.models import cffm as model_lib
    from cffm_tpu.ops.interaction_conv import make_interaction_fn

    f, d = 15, 16
    cfg = ModelConfig(num_fields=f, vocab_sizes=tuple([32] * f),
                      embed_dim=d, cross="field_aware",
                      conv_channels=(16,), conv_kernel=3,
                      compute_dtype="float32", use_first_order=True)
    rng = np.random.default_rng(5)
    params = model_lib.init_params(jax.random.key(0), cfg)
    b = 256
    rows = jnp.asarray(rng.normal(size=(b, f, cfg.table_width)) * 0.1,
                       jnp.float32)
    fn = make_interaction_fn(use_pallas=True, interpret=False)
    ref = model_lib.forward_from_rows(params, rows, None, None, cfg,
                                      interaction_fn=None)
    got_bm = model_lib.forward_from_rows(params, rows, None, None, cfg,
                                         interaction_fn=fn)
    got_fm = model_lib.forward_from_rows_fm(
        params, jnp.swapaxes(rows, 0, 1), None, cfg, interaction_fn=fn)
    e_bm = float(np.max(np.abs(np.asarray(got_bm) - np.asarray(ref))))
    e_fm = float(np.max(np.abs(np.asarray(got_fm) - np.asarray(ref))))
    good = e_bm < 1e-3 and e_fm < 1e-3
    print(f"interaction fwd err bm={e_bm:.2e} fm={e_fm:.2e} -> "
          f"{'ok' if good else 'FAIL'}")

    # bwd: compare grads w.r.t. rows + conv weight between the Pallas
    # custom_vjp (fm path) and XLA autodiff of the reference, on chip.
    def loss_ref(p, r):
        out = model_lib.forward_from_rows(p, r, None, None, cfg,
                                          interaction_fn=None)
        return jnp.sum(out ** 2)

    def loss_fm(p, r3):
        out = model_lib.forward_from_rows_fm(p, r3, None, cfg,
                                             interaction_fn=fn)
        return jnp.sum(out ** 2)

    def loss_bm(p, r):
        out = model_lib.forward_from_rows(p, r, None, None, cfg,
                                          interaction_fn=fn)
        return jnp.sum(out ** 2)

    gr_p, gr_r = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(params, rows)
    gf_p, gf_r = jax.jit(jax.grad(loss_fm, argnums=(0, 1)))(
        params, jnp.swapaxes(rows, 0, 1))
    e_r = float(np.max(np.abs(np.asarray(jnp.swapaxes(gf_r, 0, 1) - gr_r))))
    e_w = float(np.max(np.abs(np.asarray(
        gf_p["conv"][0]["w"] - gr_p["conv"][0]["w"]))))
    scale = float(np.max(np.abs(np.asarray(gr_r)))) + 1e-9
    w_scale = float(np.max(np.abs(np.asarray(gr_p["conv"][0]["w"])))) + 1e-9
    good_b = e_r / scale < 2e-2 and e_w / w_scale < 2e-2
    print(f"interaction bwd err drows={e_r:.2e} (rel {e_r/scale:.2e}) "
          f"dw={e_w:.2e} -> {'ok' if good_b else 'FAIL'}")

    # batch-major full-rows bwd on silicon too (ADVICE r4: it was only
    # interpret-covered, which cannot catch Mosaic-lowering-only bugs)
    gb_p, gb_r = jax.jit(jax.grad(loss_bm, argnums=(0, 1)))(params, rows)
    e_rb = float(np.max(np.abs(np.asarray(gb_r - gr_r))))
    e_wb = float(np.max(np.abs(np.asarray(
        gb_p["conv"][0]["w"] - gr_p["conv"][0]["w"]))))
    good_bm = e_rb / scale < 2e-2 and e_wb / w_scale < 2e-2
    print(f"interaction bwd(bm full-rows) err drows={e_rb:.2e} "
          f"(rel {e_rb/scale:.2e}) dw={e_wb:.2e} -> "
          f"{'ok' if good_bm else 'FAIL'}")
    return good and good_b and good_bm


def main() -> int:
    if jax.devices()[0].platform not in ("tpu", "axon"):
        print("no TPU visible — this sweep only means something on "
              "silicon; refusing to pass vacuously")
        return 2
    ok = check_sorted_segment()
    ok &= check_streamed_apply()
    ok &= check_interaction_kernel()
    print("ONCHIP PARITY: " + ("OK" if ok else "FAIL"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
