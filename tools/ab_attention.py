"""A/B: fused Pallas radar self-attention vs flax MHA, on real TPU.

Times forward+backward of the radar encoder layer at the production shape
(16 scans x 3531 rays x d_model 48, and the remat-grouped 4-scan chunk the
model actually runs). One JSON line per configuration. Timing fetches a
scalar (honest sync on the relay — block_until_ready does not wait on this
backend, CLAUDE.md). Run during a healthy window (docs/PERFORMANCE.md
playbook); the keep/kill decision gates NeuRadarModelConfig
.use_pallas_attention's auto default.

Usage: python tools/ab_attention.py [--iters 8] [--inner 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo root
from neuradar_tpu.utils.cache_dirs import jax_cache_dir


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--inner", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", jax_cache_dir("tpu"))
    import jax.numpy as jnp

    from neuradar_tpu.model_components.radar_decoder import TransformerEncoderLayer

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    shapes = [("full16", 16, 3531), ("group4", 4, 3531)]
    impls = [("flax", "flax"), ("pallas", "pallas" if on_tpu else "pallas_interpret")]

    for shape_name, B, S in shapes:
        src = jax.random.normal(jax.random.PRNGKey(0), (B, S, 48), dtype)
        pos = jax.random.normal(jax.random.PRNGKey(1), (B, S, 48), dtype)
        for impl_name, impl in impls:
            layer = TransformerEncoderLayer(attn_impl=impl)
            variables = layer.init(jax.random.PRNGKey(2), src, pos)

            def loss(params, src, pos):
                return jnp.sum(layer.apply({"params": params}, src, pos) ** 2).astype(jnp.float32)

            g = jax.grad(loss)

            @jax.jit
            def scan_g(params, src, pos):
                def body(carry, i):
                    gr = g(params, src + (carry * 1e-7).astype(src.dtype), pos)
                    s = sum(jnp.sum(x).astype(jnp.float32) for x in jax.tree_util.tree_leaves(gr))
                    return s, None

                out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(args.inner))
                return out

            _ = float(scan_g(variables["params"], src, pos))  # compile + warm
            t0 = time.perf_counter()
            acc = 0.0
            for i in range(args.iters):
                acc = scan_g(variables["params"], src + jnp.asarray(i * 1e-6, dtype), pos)
            _ = float(acc)
            ms = (time.perf_counter() - t0) / (args.iters * args.inner) * 1e3
            rec = {
                "metric": f"radar_attn_fwdbwd_ms_{shape_name}_{impl_name}",
                "value": round(ms, 3), "unit": "ms",
                "dtype": args.dtype, "backend": jax.default_backend(),
            }
            print(json.dumps(rec), flush=True)
            if on_tpu:
                # bank real-hardware readings like bench.py does — the
                # healthy-window playbook runs unattended (relay_watch
                # auto-launch) and the committed history is the record
                with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                                       "BENCH_HISTORY.jsonl"), "a") as f:
                    f.write(json.dumps({"ts": time.time(), "args": ["tools/ab_attention.py"], **rec}) + "\n")


if __name__ == "__main__":
    main()
