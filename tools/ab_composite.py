"""A/B: fused Pallas compositing vs the XLA formulation, on real TPU.

Times forward+backward of the compositing block at NeuRadar production
shapes (nff-chunked ray counts x samples x feature channels). One JSON line
per configuration. Timing fetches a scalar (honest sync on the relay —
block_until_ready does not wait on this backend, CLAUDE.md).

Usage: python tools/ab_composite.py [--iters 30]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo root
from neuradar_tpu.utils.cache_dirs import jax_cache_dir


def main(iters: int = 30):
    import jax

    jax.config.update("jax_compilation_cache_dir", jax_cache_dir("tpu"))
    import jax.numpy as jnp

    from neuradar_tpu.cameras.rays import render_weights_from_alpha
    from neuradar_tpu.ops.volumetric import fused_composite_sky

    interpret = jax.default_backend() != "tpu"

    def xla_path(alpha, feats):
        w = render_weights_from_alpha(alpha)
        accum = jnp.sum(w, axis=-1, keepdims=True)
        w_sky = jnp.concatenate([w[..., :-1], w[..., -1:] + 1 - accum], axis=-1)
        features = jnp.sum(w_sky[..., None] * feats, axis=-2)
        return w_sky, features, accum

    def pallas_path(alpha, feats):
        return fused_composite_sky(alpha, feats, interpret)

    INNER = 32  # grad steps per dispatch: the ~37 ms relay round trip would
    # otherwise dwarf the sub-ms kernel (measured: all configs ~24 ms/iter)

    def make_loss(path):
        def loss(alpha, feats, coef):
            w, f, a = path(alpha, feats)
            return jnp.sum(f * coef) + jnp.sum(w * w) + jnp.sum(a)

        g = jax.grad(loss, argnums=(0, 1))

        @jax.jit
        def scan_g(alpha, feats, coef):
            def body(carry, i):
                da, df = g(alpha + carry * 1e-7, feats, coef)
                return jnp.sum(da).astype(jnp.float32), None

            out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(INNER))
            return out

        return scan_g

    # nff_chunks=8 at the reference batch: 112640/8 = 14080 rays per chunk;
    # samples = num_nerf(32) + 1 sky; feature dim 32 (cf. method_configs)
    shapes = [
        (14080, 33, 32, "full/8 chunks f32", jnp.float32),
        (14080, 33, 32, "full/8 chunks bf16", jnp.bfloat16),
        (112640, 33, 32, "full unchunked f32", jnp.float32),
    ]
    for R, S, C, label, dtype in shapes:
        key = jax.random.PRNGKey(0)
        alpha = jax.random.uniform(key, (R, S), dtype, 0.0, 0.9)
        feats = jax.random.normal(jax.random.PRNGKey(1), (R, S, C), dtype)
        coef = jax.random.normal(jax.random.PRNGKey(2), (R, C), dtype)
        for name, path in (("xla", xla_path), ("pallas", pallas_path)):
            try:
                g = make_loss(path)
                _ = float(g(alpha, feats, coef))  # compile + sync
                t0 = time.perf_counter()
                acc = None
                for i in range(iters):
                    # vary inputs: identical (program, args) hit the relay cache
                    acc = g(alpha + i * 1e-6, feats, coef)
                _ = float(acc)
                dt = (time.perf_counter() - t0) / (iters * INNER)
                print(json.dumps({"config": label, "impl": name, "ms_per_grad": round(dt * 1e3, 4),
                                  "rays_per_sec": round(R / dt, 1)}), flush=True)
            except Exception as e:  # noqa: BLE001 — record and continue
                print(json.dumps({"config": label, "impl": name, "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    iters = int(sys.argv[sys.argv.index("--iters") + 1]) if "--iters" in sys.argv else 30
    main(iters)
