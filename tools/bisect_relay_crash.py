"""Bisect which program feature crashes the relay's TPU worker.

2026-08-17 episode: every TRAIN STEP crashes the worker at first execution
(any batch scale, Pallas on or off) while microbenches/probes run fine. This
script escalates from tiny op programs toward the tiny train step, one
feature at a time, printing a JSON verdict per stage — the first failing
stage names the trigger.

Stages:
  1 matmul_fetch        plain MXU program + value fetch
  2 scatter_add         table-gradient-style scatter-add
  3 tiny_field_grad     hashgrid+MLP fwd+bwd (scatter-add via custom VJP)
  4 tiny_model_loss     full NeuRadar loss fwd (no grad) on the 2-ray bundle
  5 tiny_model_grad     loss + grad
  6 tiny_train_step     grad + adam update (no donation)
  7 tiny_train_donated  same with buffer donation (the production step)

Usage: python tools/bisect_relay_crash.py [--stop-after N]
"""

from __future__ import annotations

import json
import sys
import traceback

sys.path.insert(0, ".")
from neuradar_tpu.utils.cache_dirs import jax_cache_dir

STOP_AFTER = int(sys.argv[sys.argv.index("--stop-after") + 1]) if "--stop-after" in sys.argv else 99


def stage(n, name, fn):
    if n > STOP_AFTER:
        return True
    try:
        fn()
        print(json.dumps({"stage": n, "name": name, "ok": True}), flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"stage": n, "name": name, "ok": False, "error": str(e)[:200]}), flush=True)
        traceback.print_exc(limit=2, file=sys.stderr)
        return False


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", jax_cache_dir("tpu"))
    import functools

    import jax.numpy as jnp
    import numpy as np
    import optax

    print(json.dumps({"platform": jax.devices()[0].platform}), flush=True)

    def s1():
        x = jax.random.normal(jax.random.PRNGKey(0), (512, 512), jnp.bfloat16)
        y = jax.jit(lambda a: (a @ a).astype(jnp.float32).sum())(x)
        assert np.isfinite(float(y))

    if not stage(1, "matmul_fetch", s1):
        return

    def s2():
        tbl = jnp.zeros((1 << 16,), jnp.float32)
        idx = jax.random.randint(jax.random.PRNGKey(1), (4096,), 0, 1 << 16)
        upd = jax.random.normal(jax.random.PRNGKey(2), (4096,))
        y = jax.jit(lambda t, i, u: t.at[i].add(u).sum())(tbl, idx, upd)
        assert np.isfinite(float(y))

    if not stage(2, "scatter_add", s2):
        return

    def s3():
        from neuradar_tpu.field_components.encodings import HashEncoding
        from neuradar_tpu.field_components.mlp import MLP

        enc = HashEncoding(num_levels=4, log2_hashmap_size=12, features_per_level=2)
        mlp = MLP(out_dim=8, num_layers=2, layer_width=16)
        pts = jax.random.uniform(jax.random.PRNGKey(0), (256, 3))
        ve = enc.init(jax.random.PRNGKey(1), pts)
        vm = mlp.init(jax.random.PRNGKey(2), jnp.zeros((256, enc.get_out_dim())))

        @jax.jit
        def loss(ve, vm, pts):
            return jnp.sum(mlp.apply(vm, enc.apply(ve, pts)) ** 2)

        g = jax.jit(jax.grad(loss, argnums=(0, 1)))(ve, vm, pts)
        assert np.isfinite(float(jax.tree.leaves(g)[0].sum()))

    if not stage(3, "tiny_field_grad", s3):
        return

    import __graft_entry__

    pipeline = __graft_entry__._tiny_pipeline(1)
    variables = pipeline.init_variables(0)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    loss_fn = pipeline.make_train_loss_fn()
    batch = jax.tree.map(jnp.asarray, pipeline.datamanager.sample_train_batch())
    rng = jax.random.PRNGKey(0)

    def s4():
        total, _aux = jax.jit(loss_fn)(params, batch_stats, batch, rng)
        assert np.isfinite(float(total))

    if not stage(4, "tiny_model_loss", s4):
        return

    def s5():
        (total, _aux), grads = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(
            params, batch_stats, batch, rng
        )
        assert np.isfinite(float(total))

    if not stage(5, "tiny_model_grad", s5):
        return

    from neuradar_tpu.engine.optimizers import build_optimizer, default_optimizer_groups

    tx = build_optimizer(params, default_optimizer_groups(100))
    opt_state = tx.init(params)

    def make_step(donate):
        deco = functools.partial(jax.jit, donate_argnums=(0, 1)) if donate else jax.jit

        @deco
        def step(params, opt_state, batch, rng):
            (total, _aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch_stats, batch, rng
            )
            updates, new_opt = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_opt, total

        return step

    def s6():
        _, _, total = make_step(False)(params, opt_state, batch, rng)
        assert np.isfinite(float(total))

    if not stage(6, "tiny_train_step", s6):
        return

    def s7():
        p = jax.tree.map(jnp.array, params)  # fresh copies to donate
        o = jax.tree.map(jnp.array, opt_state)
        _, _, total = make_step(True)(p, o, batch, rng)
        assert np.isfinite(float(total))

    stage(7, "tiny_train_donated", s7)


if __name__ == "__main__":
    main()
