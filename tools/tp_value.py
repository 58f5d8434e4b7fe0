"""When does the tensor-parallel (tp) hash-table axis pay? (VERDICT r2 item 7)

Two halves:

1. **Measured** (8-device virtual CPU mesh): the full tiny NeuRadar train
   step with an enlarged static table, jitted as dp(8), dp(4)xtp(2) and
   dp(2)xtp(4). Asserts loss parity and reports wall ms/step plus which
   parameter leaves actually sharded (the 4D actor grids are flat 1-D
   `hash_table` leaves too, so `param_shardings` covers them by
   construction — this prints the proof). CPU collectives are not
   ICI-representative; the timing ratio is a lower-bound sanity check on
   collective overhead, not a TPU prediction.

2. **Analytic** (exact by construction): per-chip HBM for the hash tables
   (param + 2 Adam moments) of the real presets, replicated vs tp-sharded,
   against the 16 GB of a v5e chip. Table bytes are exact:
   levels * 2^log2_hashmap_size * features * 4 B (encodings.py:276 allocates
   exactly this, flat 1-D).

Run: PYTHONPATH=.:/root/.axon_site python tools/tp_value.py [--log2 19] [--steps 6]
Writes one JSON line per finding; the conclusion lives in
docs/PERFORMANCE.md ("When tp pays").
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402
import numpy as np  # noqa: E402
from neuradar_tpu.utils.cache_dirs import jax_cache_dir

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", jax_cache_dir("cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

V5E_HBM_GB = 16.0


def _table_pipeline(log2_static: int):
    """The __graft_entry__ tiny pipeline, with the main static table enlarged
    so the hash tables dominate the parameter mass (as at reference scale)."""
    from neuradar_tpu.data.datamanager import ADDataManagerConfig
    from neuradar_tpu.data.dataparsers.synthetic import SyntheticDataParser, SyntheticDataParserConfig
    from neuradar_tpu.pipelines.ad_neuradar_pipeline import ADNeuRadarPipeline, ADNeuRadarPipelineConfig

    cfg = SyntheticDataParserConfig(num_frames=8, image_height=24, image_width=36, lidar_points_per_scan=256)
    out = SyntheticDataParser(cfg).get_dataparser_outputs()
    pipe_cfg = ADNeuRadarPipelineConfig(
        datamanager=ADDataManagerConfig(
            num_rgb_patches=8, patch_size=4, num_lidar_rays=256, num_radar_scans=8, max_radar_gt=16
        )
    )
    m = pipe_cfg.model
    m.field.grid.static.log2_hashmap_size = log2_static
    m.field.grid.actor.log2_hashmap_size = 14
    for pf in (m.sampling.proposal_field_1, m.sampling.proposal_field_2):
        pf.grid.static.log2_hashmap_size = log2_static - 2
        pf.grid.actor.log2_hashmap_size = 12
    m.sampling.num_proposal_samples = (16, 8)
    m.sampling.num_nerf_samples = 6
    m.loss.vgg_mult = 0.0
    return ADNeuRadarPipeline(pipe_cfg, out)


def measure(log2_static: int, n_steps: int) -> list:
    import jax.numpy as jnp
    import optax

    from neuradar_tpu.engine.optimizers import build_optimizer, default_optimizer_groups
    from neuradar_tpu.parallel.sharding import (
        make_mesh,
        make_mesh_2d,
        multichip_train_step,
        multichip_train_step_tp,
        param_shardings,
        replicate_tree,
        replicated,
        shard_batch,
        shard_params,
    )

    pipeline = _table_pipeline(log2_static)
    variables = pipeline.init_variables(0)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = build_optimizer(params, default_optimizer_groups(100))
    opt_state = tx.init(params)
    loss_fn = pipeline.make_train_loss_fn()

    table_bytes = sum(
        leaf.size * leaf.dtype.itemsize
        for path, leaf in jax.tree_util.tree_leaves_with_path(params)
        if any("hash_table" in str(getattr(p, "key", "")) for p in path)
    )
    total_bytes = sum(leaf.size * leaf.dtype.itemsize for leaf in jax.tree.leaves(params))
    print(f"# params: {total_bytes / 1e6:.1f} MB total, {table_bytes / 1e6:.1f} MB "
          f"({100 * table_bytes / total_bytes:.0f}%) in hash tables", flush=True)

    def train_step(params, opt_state, batch_stats, batch, rng):
        (total, (loss_dict, metrics, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, batch, rng
        )
        updates, new_opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt_state, new_bs, total, loss_dict, metrics

    batches = [jax.tree.map(jnp.asarray, pipeline.datamanager.sample_train_batch())
               for _ in range(n_steps + 1)]
    results = []

    def bench(tag, step_fn, place_state, place_batch):
        p, o, bs = place_state(params), place_state(opt_state), place_state(batch_stats)
        rng = place_state(jax.random.PRNGKey(0))
        # warmup/compile
        p, o, bs, total, _, _ = step_fn(p, o, bs, place_batch(batches[0]), rng)
        loss0 = float(total)
        t0 = time.perf_counter()
        for i in range(n_steps):
            p, o, bs, total, _, _ = step_fn(p, o, bs, place_batch(batches[i + 1]), rng)
        jax.block_until_ready(total)  # real sync on CPU backend
        dt = (time.perf_counter() - t0) / n_steps
        results.append({"config": tag, "ms_per_step": round(dt * 1e3, 1), "warmup_loss": round(loss0, 6)})
        print(json.dumps(results[-1]), flush=True)
        return loss0

    # single-device reference for parity
    ref_loss = bench("single", jax.jit(train_step), lambda x: x, lambda b: b)

    mesh8 = make_mesh(8)
    bench("dp8", multichip_train_step(train_step, mesh8),
          lambda x: replicate_tree(x, mesh8), lambda b: shard_batch(b, mesh8))

    for n_data, n_model in ((4, 2), (2, 4)):
        mesh = make_mesh_2d(n_data, n_model)
        shard = param_shardings(params, mesh)
        if n_model == 2:  # print the placement proof once
            sharded_names = sorted(
                "/".join(str(getattr(p, "key", "")) for p in path)
                for path, s in jax.tree_util.tree_leaves_with_path(shard)
                if s.spec != jax.sharding.PartitionSpec()
            )
            print(f"# tp-sharded leaves ({len(sharded_names)}):", flush=True)
            for n in sharded_names:
                print(f"#   {n}", flush=True)
            assert any("actor" in n for n in sharded_names), "actor tables must shard too"
        step = multichip_train_step_tp(train_step, mesh, params, opt_state)
        o_shard = param_shardings(opt_state, mesh)
        import jax.sharding as jsh

        def place_state(x, mesh=mesh, shard=shard, o_shard=o_shard):
            if x is params:
                return shard_params(params, shard)
            if x is opt_state:
                return shard_params(opt_state, o_shard)
            return jax.tree.map(lambda v: jax.device_put(v, replicated(mesh)), x)

        def place_batch(b, mesh=mesh):
            return jax.tree.map(
                lambda x: jax.device_put(x, jsh.NamedSharding(mesh, jsh.PartitionSpec("data"))), b
            )

        bench(f"dp{n_data}xtp{n_model}", step, place_state, place_batch)

    losses = {r["config"]: r["warmup_loss"] for r in results}
    for tag, v in losses.items():
        np.testing.assert_allclose(v, ref_loss, rtol=2e-4, err_msg=f"{tag} loss parity")
    print(f"# loss parity ok across {list(losses)} (rtol 2e-4)", flush=True)
    return results


def analytic() -> list:
    """Exact per-chip table HBM for real presets, replicated vs sharded."""
    from neuradar_tpu.configs.method_configs import method_configs

    out = []
    for preset in ("neuradar", "neurader", "neurad-2x-paper"):
        m = method_configs[preset]().pipeline.model
        fields = [("main", m.field.grid), ("prop1", m.sampling.proposal_field_1.grid),
                  ("prop2", m.sampling.proposal_field_2.grid)]
        table_params = 0
        for _, grid in fields:
            for s in (grid.static, grid.actor):
                table_params += s.num_levels * (2 ** s.log2_hashmap_size) * s.hashgrid_dim
        # param + Adam m/v, f32 (tables train in f32; bf16 is a compute cast)
        train_state_gb = table_params * 4 * 3 / 1e9
        rec = {
            "preset": preset,
            "table_params_M": round(table_params / 1e6, 1),
            "train_state_gb_replicated": round(train_state_gb, 2),
            "train_state_gb_tp2": round(train_state_gb / 2, 2),
            "train_state_gb_tp4": round(train_state_gb / 4, 2),
            "fits_one_v5e_replicated": train_state_gb < 0.6 * V5E_HBM_GB,
        }
        out.append(rec)
        print(json.dumps(rec), flush=True)
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--log2", type=int, default=19, help="static main-table log2 size for the measured half")
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--analytic-only", action="store_true")
    args = ap.parse_args()
    analytic()
    if not args.analytic_only:
        measure(args.log2, args.steps)
