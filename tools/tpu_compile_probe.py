"""Compile the train step for TPU WITHOUT executing it and report what the
TPU backend actually emits for the hash-table hot path.

Answers (from the optimized TPU HLO + TPU cost analysis) questions the CPU
cost model cannot (docs/PERFORMANCE.md "Full-step roofline"):
  * does TPU keep the table-gradient scatter-adds in bf16, or promote to
    f32 with convert pairs the way XLA:CPU does?
  * how many full-table converts/scatters/broadcasts survive optimization?
  * TPU-layout flops / bytes-accessed for the whole step.

Compile-only is deliberately relay-friendly: degraded episodes crash big
program EXECUTIONS while compiles (served by the remote compiler cache)
still complete. Run under `timeout -k 60 1500`.

Usage: python tools/tpu_compile_probe.py [--scale micro] [--chunks 8]
       [--no-hoist]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from neuradar_tpu.utils.cache_dirs import jax_cache_dir


def main(scale: str, chunks: int, hoist: bool, dump: str = "", remat_policy: str = "save_grid",
         packed_cells: bool = False) -> None:
    t0 = time.perf_counter()
    import jax

    jax.config.update("jax_compilation_cache_dir", jax_cache_dir("tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    print(f"[probe +{time.perf_counter() - t0:.0f}s] backend: {jax.devices()[0].platform}"
          f" x{jax.device_count()}", file=sys.stderr, flush=True)

    import jax.numpy as jnp
    import optax

    from neuradar_tpu.configs.bench_program import bench_pipeline
    from neuradar_tpu.engine.optimizers import build_optimizer, default_optimizer_groups

    # exact bench.py configuration — shared single definition
    pipeline = bench_pipeline(scale=scale, chunks=chunks, remat_policy=remat_policy, hoist=hoist,
                              packed_cells=packed_cells)

    # abstract init: no device execution at all (eval_shape), so the probe
    # works even when the relay crashes real executions
    s = pipeline.config.model.field.grid.static
    table_elems = (2 ** s.log2_hashmap_size) * s.num_levels * s.hashgrid_dim
    variables = jax.eval_shape(lambda: pipeline.init_variables(0))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    # abstract leaves are fine: build_optimizer only reads tree paths
    tx = build_optimizer(params, default_optimizer_groups(20001))
    opt_state = jax.eval_shape(tx.init, params)
    loss_fn = pipeline.make_train_loss_fn()

    def train_step(params, opt_state, batch_stats, batch, rng):
        (total, (_, _, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, batch, rng
        )
        updates, new_opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt_state, new_bs, total

    batch = jax.eval_shape(lambda: jax.tree.map(jnp.asarray, pipeline.datamanager.sample_train_batch()))
    print(f"[probe +{time.perf_counter() - t0:.0f}s] lowering+compiling ({scale}, chunks={chunks}, "
          f"hoist={hoist})...", file=sys.stderr, flush=True)
    compiled = jax.jit(train_step).lower(
        params, opt_state, batch_stats, batch, jax.ShapeDtypeStruct((2,), jnp.uint32)
    ).compile()
    print(f"[probe +{time.perf_counter() - t0:.0f}s] compiled", file=sys.stderr, flush=True)

    hlo = compiled.as_text()
    if dump:
        with open(dump, "w") as f:
            f.write(hlo)
        print(f"[probe] optimized HLO -> {dump} ({len(hlo) / 1e6:.1f} MB)", file=sys.stderr)
    # every instruction whose RESULT is full-table-sized, by opcode+dtype
    pat = re.compile(rf"= (bf16|f32|f16|s32|u32)\[{table_elems}\]\S* (\w+)")
    tally = Counter(f"{op}:{dt}" for dt, op in pat.findall(hlo))
    ca_list = compiled.cost_analysis()
    ca = ca_list[0] if isinstance(ca_list, (list, tuple)) else ca_list
    out = {
        "backend": jax.devices()[0].platform,
        "scale": scale, "chunks": chunks, "hoist": hoist, "remat_policy": remat_policy,
        "table_elems": table_elems,
        "full_table_ops": dict(sorted(tally.items())),
        "flops": float(ca.get("flops", 0.0)),
        "bytes_accessed": float(ca.get("bytes accessed", 0.0)),
        "compile_s": round(time.perf_counter() - t0, 1),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", choices=("full", "micro"), default="micro")
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("--no-hoist", action="store_true")
    ap.add_argument("--dump", default="", help="write optimized HLO text to this path")
    ap.add_argument("--remat-policy", choices=("all", "save_grid", "save_corners"), default="save_grid")
    ap.add_argument("--packed-cells", action="store_true",
                    help="enable the packed-cell dense-level path (encodings.pack_cells)")
    a = ap.parse_args()
    main(a.scale, a.chunks, not a.no_hoist, a.dump, a.remat_policy, a.packed_cells)
