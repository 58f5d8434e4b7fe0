"""Worker for the real 2-process multi-host test (test_distributed.py).

Each process runs this script with its own --process-id; together they form
a multi-controller jax runtime over localhost (the CI stand-in for one
process per TPU host, cf. reference scripts/train.py:110-231 whose
_distributed_worker + init_process_group this bootstraps natively via
jax.distributed). 2 virtual CPU devices per process -> 4 global devices.

Exercises the actual repo surface a pod launch would hit:
  * parallel.distributed.setup_distributed / rank helpers / sync_hosts
  * parallel.sharding.make_mesh over GLOBAL devices
  * shard_batch (same-seed global batch on every host)
  * shard_local_batch (per-host slices via local_batch_slice)
  * replicate_tree + a jitted grad step whose gradient all-reduce XLA
    inserts across processes (the DDP-equivalent psum)
  * make_mesh_2d + param_shardings + shard_params (dp x tp placement)

Writes a JSON result blob to --out for the parent test to assert on.
"""

from __future__ import annotations

import argparse
import json
import sys
from neuradar_tpu.utils.cache_dirs import jax_cache_dir


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--trainer", action="store_true",
                    help="also run a 2-step tiny NeuRadar Trainer with data_parallel over the global mesh")
    args = ap.parse_args()

    # force the CPU platform BEFORE any device query (sitecustomize
    # pre-registers a TPU plugin; env alone is ignored — cf. tests/conftest.py)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", jax_cache_dir("cpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp
    import numpy as np

    from neuradar_tpu.parallel import distributed as dist
    from neuradar_tpu.parallel.sharding import (
        make_mesh,
        make_mesh_2d,
        param_shardings,
        replicate_tree,
        shard_batch,
        shard_local_batch,
        shard_params,
    )

    initialized = dist.setup_distributed(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    res = {
        "initialized": initialized,
        "world_size": dist.world_size(),
        "rank": dist.rank(),
        "is_main": dist.is_main_process(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }

    # --- global mesh over all processes' devices -------------------------
    mesh = make_mesh()  # all 4 global devices on the 'data' axis
    res["mesh_size"] = int(mesh.size)

    # shard_batch: every host holds the same full batch (same seed)
    batch = {"x": np.arange(8, dtype=np.float32)}
    gbatch = shard_batch(batch, mesh)
    res["shard_batch_sum"] = float(jax.jit(lambda b: jnp.sum(b["x"]))(gbatch))

    # shard_local_batch: each host contributes only its slice
    full = np.arange(8, dtype=np.float32) * 10.0
    sl = dist.local_batch_slice(8)
    res["local_slice"] = [sl.start, sl.stop]
    lbatch = shard_local_batch({"x": full[sl]}, mesh)
    res["local_batch_shape"] = list(lbatch["x"].shape)
    res["shard_local_batch_sum"] = float(jax.jit(lambda b: jnp.sum(b["x"]))(lbatch))

    # replicated params + data-sharded input: the grad of the mean forces a
    # cross-process all-reduce (the DDP gradient psum equivalent)
    w = replicate_tree({"w": np.full((1,), 2.0, np.float32)}, mesh)

    def loss(params, b):
        return jnp.mean(b["x"] * params["w"][0])

    g = jax.jit(jax.grad(loss))(w, gbatch)
    res["grad_w"] = float(np.asarray(g["w"])[0])  # mean(x) = 3.5

    # dp x tp placement of a flat hash table
    mesh2 = make_mesh_2d(args.num_processes, jax.device_count() // args.num_processes)
    params = {"static": {"hash_table": np.arange(16, dtype=np.float32)}, "mlp": np.ones((3,), np.float32)}
    shardings = param_shardings(params, mesh2)
    sharded = shard_params(params, shardings)
    res["table_sum"] = float(jax.jit(lambda p: jnp.sum(p["static"]["hash_table"]))(sharded))
    # tp=2 over the model axis: each device holds half the 16-entry table
    res["table_shard_len"] = int(sharded["static"]["hash_table"].addressable_shards[0].data.shape[0])

    dist.sync_hosts("test")
    res["synced"] = True

    if args.trainer:
        # the full Trainer data-parallel path across PROCESSES: every host
        # samples the same batches (same seed) and _device_batch assembles
        # them into globally-sharded arrays; XLA all-reduces the gradients.
        from neuradar_tpu.data.datamanager import ADDataManagerConfig
        from neuradar_tpu.data.dataparsers.synthetic import SyntheticDataParser, SyntheticDataParserConfig
        from neuradar_tpu.engine.trainer import Trainer, TrainerConfig
        from neuradar_tpu.pipelines.ad_neuradar_pipeline import ADNeuRadarPipelineConfig

        pcfg = SyntheticDataParserConfig(num_frames=8, image_height=48, image_width=72,
                                         lidar_points_per_scan=512)
        out = SyntheticDataParser(pcfg).get_dataparser_outputs()
        out.radar_fov = dict(min_azimuth=-0.8, max_azimuth=0.8, min_elevation=-0.08,
                             max_elevation=0.32, azimuth_step=0.1, elevation_step=0.1)
        pipe = ADNeuRadarPipelineConfig(
            datamanager=ADDataManagerConfig(
                num_rgb_patches=4, patch_size=8, num_lidar_rays=256, num_radar_scans=4,
                max_radar_gt=32, prefetch_depth=2,
            )
        )
        m = pipe.model
        m.field.grid.static.log2_hashmap_size = 12
        m.field.grid.actor.log2_hashmap_size = 10
        for pf in (m.sampling.proposal_field_1, m.sampling.proposal_field_2):
            pf.grid.static.log2_hashmap_size = 11
            pf.grid.actor.log2_hashmap_size = 9
        m.sampling.num_proposal_samples = (16, 8)
        m.sampling.num_nerf_samples = 6
        m.loss.vgg_mult = 0.0
        tcfg = TrainerConfig(
            pipeline=pipe, max_num_iterations=2, steps_per_dispatch=1,
            steps_per_eval_batch=0, steps_per_eval_image=0, steps_per_eval_all_images=0,
            steps_per_eval_all_radars=0, steps_per_save=0, steps_per_log=1,
            save_final_checkpoint=False, experiment_name="multihost",
            output_dir=f"/tmp/neuradar_multihost_{args.process_id}",
        )
        trainer = Trainer(tcfg, dataparser_outputs=out)
        trainer.setup()
        res["trainer_multihost"] = trainer._batch_shardings is not None
        metrics = trainer.train(2)
        # eval/render/save paths need host-LOCAL variables (they build
        # host-local inputs); eval_variables must localize the global state
        ev = trainer.eval_variables()
        res["eval_vars_local"] = all(
            (not isinstance(x, jax.Array)) or x.is_fully_addressable
            for x in jax.tree.leaves(ev)
        )
        # rank 0 logs; other ranks' writers are quiet (reference
        # @check_main_thread semantics)
        res["writer_active"] = trainer.writer.log_path is not None
        trainer.pipeline.datamanager.stop()
        res["trainer_loss"] = float(metrics["loss"])

    with open(args.out, "w") as f:
        json.dump(res, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
