"""Component micro-benchmarks on real TPU hardware.

Times the hot pieces of the NeuRadar train step in isolation at the exact
reference-batch shapes (112,128 rays, nff_chunks=8 -> 14,016-ray chunks) so
optimization effort goes where the time is. Each component is timed fwd-only
and fwd+bwd (value_and_grad), with block_until_ready.

Run: python tools/profile_components.py [--iters 20]
Prints one JSON dict {component: {fwd_ms, fwdbwd_ms}} plus rough per-step
cost attribution (x chunks / x groups multipliers applied).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo root


def _time(fn, *args, iters=20):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--chunk-rays", type=int, default=14016)
    args = parser.parse_args(argv)

    global jax
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/neuradar_tpu_jax_cache")

    from neuradar_tpu.field_components.encodings import hash_encode
    from neuradar_tpu.field_components.mlp import MLP
    from neuradar_tpu.model_components.radar_decoder import RadarDecoder
    from neuradar_tpu.model_components.cnns import RGBDecoder

    R = args.chunk_rays
    results = {}
    key = jax.random.PRNGKey(0)

    # ---- 1. hashgrids. NOTE: a standalone jit(grad(hash_encode)) does NOT
    # get the cross-op fusion the real (scan+remat) step gets — the [N, L, d]
    # corner coords materialize with (8,128)-tile padding (21-42x), so large
    # N OOMs the standalone program. Bench at a reduced N and record the
    # multiplier; per-position cost is what matters for ranking.
    def bench_grid(name, n_pos, levels, log2_T, F, min_res, max_res, d=3, mult=1):
        import math

        T = 2**log2_T
        growth = math.exp((math.log(max_res) - math.log(min_res)) / (levels - 1))
        scalings = tuple(float(int(min_res * growth**i)) for i in range(levels))
        table = (jax.random.uniform(key, (T * levels * F,), jnp.bfloat16) - 0.5) * 2e-4
        pos = jax.random.uniform(jax.random.PRNGKey(1), (n_pos * d,), jnp.bfloat16)

        fwd = jax.jit(lambda p, t: hash_encode(p, t, scalings, T, levels, F, d))
        loss = jax.jit(
            jax.grad(lambda p, t: jnp.sum(hash_encode(p, t, scalings, T, levels, F, d).astype(jnp.float32)),
                     argnums=(0, 1))
        )
        results[name] = {
            "fwd_ms": round(_time(fwd, pos, table, iters=args.iters), 3),
            "fwdbwd_ms": round(_time(loss, pos, table, iters=args.iters), 3),
            "n_pos": n_pos,
            "mult": mult,
        }
        print(f"[profile] {name}: {results[name]}", file=sys.stderr, flush=True)

    bench_grid("main_static_grid_33s", R * 33, 8, 22, 4, 32, 8192)
    bench_grid("prop1_static_grid_32s", R * 32, 6, 20, 1, 128, 4096, mult=4)
    bench_grid("prop2_static_grid_32s", R * 32, 6, 20, 1, 128, 4096, mult=2)
    bench_grid("actor_grid_33s_4d", R * 33, 4, 17, 4, 64, 1024, d=4)

    # ---- 2. geometry + feature MLPs at main-field shape
    mlp = MLP(out_dim=33, num_layers=2, layer_width=32, compute_dtype=jnp.bfloat16)
    x = jax.random.normal(key, (R, 33, 32), jnp.float32)
    params = mlp.init(key, x)
    fwd = jax.jit(lambda v, x: mlp.apply(v, x))
    gd = jax.jit(jax.grad(lambda v, x: jnp.sum(mlp.apply(v, x).astype(jnp.float32))))
    results["mlp_geo_33s"] = {
        "fwd_ms": round(_time(fwd, params, x, iters=args.iters), 3),
        "fwdbwd_ms": round(_time(gd, params, x, iters=args.iters), 3),
    }
    print(f"[profile] mlp_geo_33s: {results['mlp_geo_33s']}", file=sys.stderr, flush=True)

    # ---- 3. radar decoder: one group of 4 scans x 3424 rays
    dec = RadarDecoder(d_model=48)
    feats = jax.random.normal(key, (4, 3424, 48), jnp.float32)
    geom = jax.random.normal(key, (4, 3424, 3), jnp.float32) * 10
    dparams = dec.init({"params": key, "dropout": key}, feats, geom, False)
    fwd = jax.jit(lambda v, f, g: dec.apply(v, f, g, False))
    gd = jax.jit(jax.grad(lambda v, f, g: jnp.sum(dec.apply(v, f, g, False)[0].astype(jnp.float32))))
    results["radar_decoder_4scans"] = {
        "fwd_ms": round(_time(fwd, dparams, feats, geom, iters=args.iters), 3),
        "fwdbwd_ms": round(_time(gd, dparams, feats, geom, iters=args.iters), 3),
    }
    print(f"[profile] radar_decoder_4scans: {results['radar_decoder_4scans']}", file=sys.stderr, flush=True)

    # ---- 4. rgb decoder: 40 patches 32^2 -> 96^2
    rgbd = RGBDecoder(hidden_dim=32, upsample_factor=3)
    patches = jax.random.normal(key, (40, 32, 32, 48), jnp.float32)
    rparams = rgbd.init(key, patches, train=False)
    fwd = jax.jit(lambda v, p: rgbd.apply(v, p, train=False))
    gd = jax.jit(jax.grad(lambda v, p: jnp.sum(rgbd.apply(v, p, train=False).astype(jnp.float32))))
    results["rgb_decoder_40p"] = {
        "fwd_ms": round(_time(fwd, rparams, patches, iters=args.iters), 3),
        "fwdbwd_ms": round(_time(gd, rparams, patches, iters=args.iters), 3),
    }

    # ---- rough per-step attribution (x8 chunks, x4 radar groups, x mult)
    attribution = {
        "grids_per_step_ms": round(
            8 * sum(results[k]["fwdbwd_ms"] * results[k].get("mult", 1)
                    for k in ("main_static_grid_33s", "prop1_static_grid_32s",
                              "prop2_static_grid_32s", "actor_grid_33s_4d")), 2),
        "radar_decode_per_step_ms": round(4 * results["radar_decoder_4scans"]["fwdbwd_ms"], 2),
        "rgb_decode_per_step_ms": round(results["rgb_decoder_40p"]["fwdbwd_ms"], 2),
    }
    print(json.dumps({"components": results, "attribution": attribution}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
