"""Full-train-step roofline: speed-of-light device time for the EXACT
reference-scale program (VERDICT r2 item 3 / weak #4).

The healthy measured step is ~400 ms (112,128 rays at 279k rays/s) while the
summed per-component device timings are ~30-50 ms — this tool quantifies the
gap's physical floor without needing a healthy relay window: compile the
exact full-scale train step (fwd+bwd+adam, K=1) on the local CPU backend and
read XLA's cost analysis. FLOP counts are backend-independent (same HLO
math); bytes-accessed is layout-dependent so it is reported as indicative.

Speed-of-light on one v5e chip:
  t_sol = max(flops / peak_flops, bytes / hbm_bw)
with peak 197 TFLOP/s bf16 / 98.5 f32, HBM 819 GB/s (public v5e specs).

Prints a JSON summary; docs/PERFORMANCE.md carries the interpretation.

COUNTING CAVEAT: XLA's cost_analysis counts a rolled `while` loop body ONCE
regardless of trip count. The nff chunk scan stays rolled at full scale (it
unrolls at micro), so raw full-scale numbers fit `total = outside + body/n`.
`--fit` compiles at two chunk counts, solves that linear system, and prints
the corrected per-step totals (outside + full scan work). The JSON always
reports `while_loops` so a nonzero count flags the caveat. Gathers/scatters
are charged as dense operand read+write either way — bytes are an upper
bound on physical HBM traffic wherever they dominate.

Run: python tools/roofline_fullstep.py [--scale full|micro] [--chunks 8]
     [--remat-policy all|save_grid] [--no-hoist] [--fit]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402
from neuradar_tpu.utils.cache_dirs import jax_cache_dir

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", jax_cache_dir("cpu"))

V5E_BF16_FLOPS = 197e12
V5E_F32_FLOPS = 98.5e12
V5E_HBM_BPS = 819e9


def main(scale: str, chunks: int, remat_policy: str = "save_grid", hoist: bool = True,
         packed_cells: bool = False) -> dict:
    import jax.numpy as jnp
    import optax

    from neuradar_tpu.configs.bench_program import bench_pipeline
    from neuradar_tpu.engine.optimizers import build_optimizer, default_optimizer_groups

    # exact bench.py configuration — shared single definition
    pipeline = bench_pipeline(scale=scale, chunks=chunks, remat_policy=remat_policy, hoist=hoist,
                              packed_cells=packed_cells)
    rays = pipeline.layout.total

    variables = pipeline.init_variables(0)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = build_optimizer(params, default_optimizer_groups(20001))
    opt_state = tx.init(params)
    loss_fn = pipeline.make_train_loss_fn()

    def train_step(params, opt_state, batch_stats, batch, rng):
        (total, (_, _, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, batch, rng
        )
        updates, new_opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt_state, new_bs, total

    batch = jax.tree.map(jnp.asarray, pipeline.datamanager.sample_train_batch())
    print(f"[roofline] compiling full train step ({rays} rays, chunks={chunks}) on CPU...",
          file=sys.stderr, flush=True)
    compiled = jax.jit(train_step).lower(params, opt_state, batch_stats, batch,
                                         jax.random.PRNGKey(0)).compile()
    while_loops = compiled.as_text().count(" while(")
    ca_list = compiled.cost_analysis()
    ca = ca_list[0] if isinstance(ca_list, (list, tuple)) else ca_list
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))

    # param/optimizer traffic floor: the step must at minimum read params +
    # 2 adam moments and write them back (donated, in-place)
    param_bytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
    state_bytes = param_bytes * 3
    out = {
        "scale": scale, "chunks": chunks, "remat_policy": remat_policy, "hoist": hoist,
        "while_loops": while_loops,
        "rays_per_step": rays,
        "flops_per_step": flops,
        "bytes_accessed_cpu_layout": bytes_acc,
        "param_bytes": param_bytes,
        "t_sol_ms_bf16_compute": round(flops / V5E_BF16_FLOPS * 1e3, 2),
        "t_sol_ms_f32_compute": round(flops / V5E_F32_FLOPS * 1e3, 2),
        "t_sol_ms_hbm_cpu_layout": round(bytes_acc / V5E_HBM_BPS * 1e3, 2),
        "t_sol_ms_state_rw": round(2 * state_bytes / V5E_HBM_BPS * 1e3, 2),
        "note": ("flops exact (backend-independent HLO math); bytes from the CPU "
                 "layout/fusion so HBM-side time is indicative only"),
    }
    # memory-bound vs compute-bound at speed of light
    out["sol_step_ms"] = max(out["t_sol_ms_bf16_compute"],
                             out["t_sol_ms_hbm_cpu_layout"], out["t_sol_ms_state_rw"])
    out["sol_rays_per_sec"] = round(rays / (out["sol_step_ms"] / 1e3))
    print(json.dumps(out), flush=True)
    return out


def fit(scale: str, remat_policy: str, hoist: bool, n1: int = 8, n2: int = 16) -> None:
    """Solve total = outside + scan_body/n from two chunk counts (the
    rolled-while counting caveat, module docstring) and print corrected
    per-step totals.

    n2 must DIVIDE the batch total — a non-divisor silently falls back to 1
    chunk (models/neuradar.py) and corrupts the fit. The parity-corrected
    3531-ray radar scan makes the full batch 113,840 = 2^4*5*1423, so 16 is
    the largest usable power of two (32 was valid for the old 112,128)."""
    a = main(scale, n1, remat_policy, hoist)
    b = main(scale, n2, remat_policy, hoist)
    assert a["while_loops"] and b["while_loops"], \
        "a fit arm compiled without the chunk scan (non-divisor chunk count?)"

    def solve(ka, kb):
        body = (a[ka] - b[kb]) / (1.0 / n1 - 1.0 / n2)
        outside = a[ka] - body / n1
        return outside, body

    out_b, body_b = solve("bytes_accessed_cpu_layout", "bytes_accessed_cpu_layout")
    out_f, body_f = solve("flops_per_step", "flops_per_step")
    corrected = {
        "fit": True, "scale": scale, "n1": n1, "n2": n2,
        "bytes_outside_scan": round(out_b), "bytes_scan_total": round(body_b),
        "bytes_corrected": round(out_b + body_b),
        "flops_outside_scan": round(out_f), "flops_scan_total": round(body_f),
        "flops_corrected": round(out_f + body_f),
        "t_sol_ms_hbm_corrected": round((out_b + body_b) / V5E_HBM_BPS * 1e3, 2),
        "t_sol_ms_bf16_corrected": round((out_f + body_f) / V5E_BF16_FLOPS * 1e3, 2),
    }
    print(json.dumps(corrected), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", choices=("full", "micro"), default="full")
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("--remat-policy", choices=("all", "save_grid", "save_corners"), default="save_grid")
    ap.add_argument("--no-hoist", action="store_true")
    ap.add_argument("--packed-cells", action="store_true")
    ap.add_argument("--fit", action="store_true",
                    help="compile at chunks 8 and 32, solve the rolled-loop "
                         "counting caveat, print corrected totals")
    a = ap.parse_args()
    if a.fit:
        fit(a.scale, a.remat_policy, not a.no_hoist)
    else:
        main(a.scale, a.chunks, a.remat_policy, not a.no_hoist, a.packed_cells)
