"""Component-level device-time attribution at reference shapes, real TPU.

The axon relay does not expose device traces to the local jax.profiler
(host-side events only), so attribution is measured directly: each hot
component runs fwd+bwd in a lax.scan of INNER iterations per dispatch
(amortizing the ~37 ms relay round trip) with inputs varied per iteration
(identical (program, args) pairs are served from a relay cache — CLAUDE.md).
One JSON line per component; the full train-step number to compare against
comes from bench.py.

Usage: python tools/profile_components.py [--inner 16] [--iters 6]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo root
from neuradar_tpu.utils.cache_dirs import jax_cache_dir

INNER = 16
ITERS = 6


DEGRADED = False  # set by the hashgrid sentinel (first component timed)
# healthy hashgrid_static_main is ~2.4 ms/iter (docs/PERFORMANCE.md); a
# degraded-relay episode inflates gather-heavy programs 100-1000x while
# matmul-bound ones stay healthy-looking — flag EVERY banked entry so the
# committed history can't pass degraded attributions off as healthy
_SENTINEL = ("hashgrid_static_main", 25.0)


def timed(name, fn, *args):
    """fn must be a jitted (carry, *args) -> scalar scan runner."""
    import jax.numpy as jnp

    try:
        # warmup with the SAME arity as the timed calls (a different arity
        # would compile a second executable inside the timed loop)
        _ = float(fn(*args, jnp.float32(-1)))
        t0 = time.perf_counter()
        acc = 0.0
        for i in range(ITERS):
            acc = fn(*args, jnp.float32(i))
        _ = float(acc)
        dt = (time.perf_counter() - t0) / (ITERS * INNER)
        rec = {"component": name, "ms_per_iter": round(dt * 1e3, 4)}
        global DEGRADED
        if name == _SENTINEL[0] and rec["ms_per_iter"] > _SENTINEL[1]:
            DEGRADED = True
        if DEGRADED:
            rec["relay_degraded"] = True
        print(json.dumps(rec), flush=True)
        import jax

        if jax.default_backend() == "tpu":
            # bank real-hardware attributions: the healthy-window playbook
            # runs unattended (relay_watch auto-launch), so the committed
            # history — not a scrollback log — is the record
            hist = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                                "BENCH_HISTORY.jsonl")
            with open(hist, "a") as f:
                f.write(json.dumps({"ts": time.time(), "args": ["tools/profile_components.py"],
                                    "metric": f"component_ms_{name}", "value": rec["ms_per_iter"],
                                    "unit": "ms",
                                    **({"relay_degraded": True} if DEGRADED else {})}) + "\n")
        return dt
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"component": name, "error": str(e)[:200]}), flush=True)
        return None


def scanner(step_fn):
    """Wrap step_fn(x, eps) -> scalar into a jitted INNER-iteration scan."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*args):
        eps0 = args[-1] if isinstance(args[-1], jax.Array) and args[-1].ndim == 0 else jnp.float32(0)
        real = args[:-1] if args[-1] is eps0 else args

        def body(carry, i):
            return step_fn(*real, carry * 1e-7 + eps0 * 1e-7), None

        out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(INNER))
        return out

    return run


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", jax_cache_dir("tpu"))
    import jax.numpy as jnp

    print(json.dumps({"platform": jax.devices()[0].platform, "inner": INNER}), flush=True)

    # reference operating point (BASELINE.md): 112640 rays/step, bf16 compute
    R_CAM, R_LIDAR, R_RADAR = 40 * 32 * 32, 16384, 16 * 3531
    R_TOTAL = R_CAM + R_LIDAR + R_RADAR
    S_PROP1, S_PROP2, S_MAIN = 128, 64, 33
    DT = jnp.bfloat16

    # ---- hash encodings (static grid, main field shapes) -------------------
    from neuradar_tpu.field_components.encodings import HashEncoding

    R_chunk = R_TOTAL // 8  # nff_chunks=8 production setting
    for name, levels, feats, logT, n_pts in (
        ("hashgrid_static_main", 8, 4, 22, R_chunk * S_MAIN),
        ("hashgrid_prop", 8, 1, 20, R_chunk * S_PROP2),
    ):
        enc = HashEncoding(num_levels=levels, features_per_level=feats, log2_hashmap_size=logT)
        pts = jax.random.uniform(jax.random.PRNGKey(0), (n_pts, 3), jnp.float32)
        v = enc.init(jax.random.PRNGKey(1), pts)

        def step(pts, v, eps, _enc=enc):
            def loss(v):
                return jnp.sum(_enc.apply(v, pts + eps).astype(jnp.float32) ** 2)

            return jax.grad(loss)(v)["params"]["hash_table"].sum().astype(jnp.float32)

        timed(name, scanner(step), pts, v)

    # ---- MLPs at NFF shapes ------------------------------------------------
    from neuradar_tpu.field_components.mlp import MLP

    mlp = MLP(out_dim=33, num_layers=2, layer_width=32)
    x = jax.random.normal(jax.random.PRNGKey(2), (R_chunk * S_MAIN, 32), DT)
    vm = mlp.init(jax.random.PRNGKey(3), x)

    def mlp_step(x, vm, eps):
        def loss(vm):
            return jnp.sum(mlp.apply(vm, x + eps.astype(DT)).astype(jnp.float32) ** 2)

        return sum(jnp.sum(g).astype(jnp.float32) for g in jax.tree.leaves(jax.grad(loss)(vm)))

    timed("field_mlp_main", scanner(mlp_step), x, vm)

    # ---- compositing (XLA formulation, what the model runs) ----------------
    from neuradar_tpu.cameras.rays import render_weights_from_alpha

    alpha = jax.random.uniform(jax.random.PRNGKey(4), (R_chunk, S_MAIN), DT, 0.0, 0.9)
    feats = jax.random.normal(jax.random.PRNGKey(5), (R_chunk, S_MAIN, 32), DT)

    def comp_step(alpha, feats, eps):
        def loss(alpha, feats):
            w = render_weights_from_alpha(alpha)
            accum = jnp.sum(w, axis=-1, keepdims=True)
            w_sky = jnp.concatenate([w[..., :-1], w[..., -1:] + 1 - accum], axis=-1)
            f = jnp.sum(w_sky[..., None] * feats, axis=-2)
            return jnp.sum(f.astype(jnp.float32) ** 2)

        da, df = jax.grad(loss, argnums=(0, 1))(alpha + eps.astype(DT), feats)
        return jnp.sum(da).astype(jnp.float32)

    timed("composite_xla", scanner(comp_step), alpha, feats)

    # ---- PDF resampling core (vmapped searchsorted + interp) ---------------
    bins = jnp.linspace(0, 1, S_PROP1 + 1)[None].repeat(R_chunk, 0)
    w = jax.random.uniform(jax.random.PRNGKey(6), (R_chunk, S_PROP1))

    def pdf_step(bins, w, eps):
        pdf = (w + eps + 0.01) / jnp.sum(w + eps + 0.01, -1, keepdims=True)
        cdf = jnp.concatenate([jnp.zeros_like(pdf[:, :1]), jnp.cumsum(pdf, -1)], -1)
        u = (jnp.arange(S_PROP2) + 0.5) / S_PROP2
        u = jnp.broadcast_to(u, (cdf.shape[0], S_PROP2))
        inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
        below = jnp.clip(inds - 1, 0, bins.shape[-1] - 1)
        above = jnp.clip(inds, 0, bins.shape[-1] - 1)
        s = (jnp.take_along_axis(bins, below, -1) + jnp.take_along_axis(bins, above, -1)) / 2
        return jnp.sum(s).astype(jnp.float32)

    timed("pdf_resample_core", scanner(pdf_step), bins, w)

    # ---- radar decoder attention ------------------------------------------
    from neuradar_tpu.model_components.radar_decoder import RadarDecoder

    ns, nr, dm = 4, 3531, 32 + 16  # one remat group of 4 scans
    rf = jax.random.normal(jax.random.PRNGKey(7), (ns, nr, dm), DT)
    geom = jax.random.normal(jax.random.PRNGKey(8), (ns, nr, 3))
    dec = RadarDecoder(d_model=dm)
    vd = dec.init({"params": jax.random.PRNGKey(9), "dropout": jax.random.PRNGKey(10)}, rf, geom, False)

    def radar_step(rf, geom, vd, eps):
        def loss(vd):
            out, _ = dec.apply(vd, rf + eps.astype(DT), geom, False)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        gs = jax.grad(loss)(vd)
        return sum(jnp.sum(g).astype(jnp.float32) for g in jax.tree.leaves(gs))

    timed("radar_decoder_group4", scanner(radar_step), rf, geom, vd)

    # ---- RGB CNN decoder ---------------------------------------------------
    from neuradar_tpu.model_components.cnns import RGBDecoder

    cnn = RGBDecoder(hidden_dim=32, upsample_factor=3)
    patches = jax.random.normal(jax.random.PRNGKey(11), (40, 32, 32, 48), DT)
    vc = cnn.init(jax.random.PRNGKey(12), patches, False)

    def cnn_step(patches, vc, eps):
        def loss(vc):
            return jnp.sum(cnn.apply(vc, patches + eps.astype(DT), False).astype(jnp.float32) ** 2)

        gs = jax.grad(loss)(vc)
        return sum(jnp.sum(g).astype(jnp.float32) for g in jax.tree.leaves(gs))

    timed("rgb_cnn_decoder", scanner(cnn_step), patches, vc)


if __name__ == "__main__":
    if "--inner" in sys.argv:
        INNER = int(sys.argv[sys.argv.index("--inner") + 1])
    if "--iters" in sys.argv:
        ITERS = int(sys.argv[sys.argv.index("--iters") + 1])
    main()
