"""Auction-vs-Hungarian assignment agreement on REAL training cost matrices.

VERDICT r4 item 5's second half: the on-device Jacobi auction
(model_components/radar_utils.py:81-140) is the production default over the
reference's exact scipy Hungarian (reference radar_utils.py:78, ours via
host callback). Toy-matrix equivalence is tested in
tests/test_radar_utils.py; this tool quantifies agreement where it matters —
the euclidean GT-to-MB cost matrices produced by an actual training run:

  * trains the tiny synthetic scene for --steps with the AUCTION default,
  * every step solves the step's real cost matrices with BOTH methods,
  * records row-level agreement and the matched-cost regret
    (C_auction - C_hungarian) / |C_hungarian|  (>= 0; 0 = equally optimal —
    identical assignments are sufficient but not necessary).

Writes artifacts/assignment_agreement.json. Interpreting: the auction is
eps-optimal, so small positive regret with high agreement justifies the
default; the curve-level A/B (validate_learning --radar-assignment) is the
end-to-end check.

Usage: python tools/assignment_agreement.py --steps 300
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from neuradar_tpu.utils.cache_dirs import jax_cache_dir

jax.config.update("jax_compilation_cache_dir", jax_cache_dir("cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import optax


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--lr", type=float, default=5e-3)
    ap.add_argument("--output", default="artifacts/assignment_agreement.json")
    args = ap.parse_args(argv)

    from tools.ref_trajectory_ab import build_scene
    from tests import test_reference_model_parity as P
    from neuradar_tpu.data.datamanager import build_train_bundle
    from neuradar_tpu.model_components import radar_utils
    import neuradar_tpu.models.neuradar as mymod

    outputs, dm = build_scene()
    layout = dm.layout
    mine, _ = P._build_our_model(
        scene_scale=float(np.abs(outputs.scene_box.aabb).max()), duration=outputs.duration,
        num_sensors=len(outputs.sensor_idx_to_name),
        num_train_frames=int(len(outputs.camera_to_worlds) + len(outputs.lidar_to_worlds)
                             + len(outputs.radar_to_worlds)),
    )
    # production default on the training side
    mine.config.loss.radar_assignment = "auction"

    ref_model = P._build_reference_model(
        scene_scale=float(np.abs(outputs.scene_box.aabb).max()), duration=outputs.duration,
        num_sensors=len(outputs.sensor_idx_to_name),
        num_train_data=int(len(outputs.camera_to_worlds) + len(outputs.lidar_to_worlds)
                           + len(outputs.radar_to_worlds)),
    )
    variables = P.copy_reference_params(ref_model)
    del ref_model

    tables = dm.tables
    tx = optax.adam(args.lr)
    opt_state = tx.init(variables["params"])
    batch_stats = variables["batch_stats"]
    batch_keys = ("cam_frame_idx", "patch_tl", "image", "lidar_scan_idx", "lidar_points",
                  "lidar_distance", "lidar_intensity", "did_return", "radar_scan_idx",
                  "radar_gt", "radar_gt_mask")

    @jax.jit
    def step(params, batch_stats, opt_state, batch):
        bundle = build_train_bundle(tables, batch, layout, rgb_upsample_factor=3)

        def fn(p):
            (tot, (losses, _m, out)), mut = mine.apply(
                {"params": p, "batch_stats": batch_stats},
                bundle, batch, layout, True,
                method=mine.loss_and_metrics,
                rngs={"sampling": jax.random.PRNGKey(0), "flip": jax.random.PRNGKey(1),
                      "dropout": jax.random.PRNGKey(2)},
                mutable=["batch_stats"],
            )
            return tot, (losses, mut["batch_stats"], out["radar_output"])

        (tot, (losses, new_stats, radar_out)), grads = jax.value_and_grad(fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        gt, mask = batch["radar_gt"], batch["radar_gt_mask"]
        cost = jax.vmap(
            lambda g, m, p: radar_utils.radar_cost_matrix(g, m, p, "euclidean")
        )(gt, mask, jax.lax.stop_gradient(radar_out))
        a_auc = radar_utils.solve_assignment(cost, mask, "auction")
        a_hun = radar_utils.solve_assignment(cost, mask, "hungarian")
        return params, new_stats, new_opt, tot, cost, a_auc, a_hun

    params = variables["params"]
    agree, regret, n_rows = [], [], 0
    t0 = time.time()
    for s in range(args.steps):
        batch = {k: jnp.asarray(v) for k, v in dm.sample_train_batch().items() if k in batch_keys}
        params, batch_stats, opt_state, tot, cost, a_auc, a_hun = step(
            params, batch_stats, opt_state, batch)
        cost, a_auc, a_hun = np.asarray(cost), np.asarray(a_auc), np.asarray(a_hun)
        mask = np.asarray(batch["radar_gt_mask"])
        valid = mask & (a_hun >= 0)
        n = int(valid.sum())
        if n == 0:
            continue
        n_rows += n
        agree.append(float((a_auc[valid] == a_hun[valid]).mean()))

        def matched_cost(a):
            rows = np.argwhere(valid)
            return float(sum(cost[i, j, a[i, j]] for i, j in rows))

        c_auc, c_hun = matched_cost(a_auc), matched_cost(a_hun)
        regret.append((c_auc - c_hun) / max(abs(c_hun), 1e-9))
        if s % 25 == 0:
            print(f"[agree] step {s}: loss={float(tot):.4f} agree={agree[-1]:.3f} "
                  f"regret={regret[-1]:.2e} ({time.time() - t0:.0f}s)", flush=True)

    doc = {
        "steps": args.steps,
        "gt_rows_evaluated": n_rows,
        "agreement_mean": float(np.mean(agree)),
        "agreement_min": float(np.min(agree)),
        "regret_mean": float(np.mean(regret)),
        "regret_max": float(np.max(regret)),
        "note": "regret = (auction matched cost - hungarian matched cost) / |hungarian|, "
                "euclidean training cost matrices from a live tiny-scene run (auction-trained)",
    }
    with open(args.output, "w") as f:
        json.dump({"summary": doc, "per_step": {"agreement": agree, "regret": regret}}, f)
    print(json.dumps(doc, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
