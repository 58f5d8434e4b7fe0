"""Radar loss / assignment / metrics tests."""

import jax
import jax.numpy as jnp
import numpy as np

from neuradar_tpu.model_components import radar_utils
from neuradar_tpu.model_components.gospa import calculate_gospa


def _scan(n_mb=32, n_gt=5, seed=0):
    rng = np.random.RandomState(seed)
    gt = rng.randn(n_gt, 3).astype(np.float32) * 5
    pred = np.zeros((n_mb, 7), np.float32)
    pred[:, 0] = 0.1  # low existence everywhere
    pred[:, 1:4] = rng.randn(n_mb, 3) * 20
    pred[:, 4:7] = 1.0
    # plant good components at the gt locations with high existence
    pred[:n_gt, 1:4] = gt + 0.01
    pred[:n_gt, 0] = 0.95
    return jnp.asarray(gt), jnp.asarray(pred)


def test_auction_matches_hungarian_on_simple_case():
    gt, pred = _scan()
    mask = jnp.ones((gt.shape[0],), bool)
    cost = radar_utils.radar_cost_matrix(gt, mask, pred, "euclidean")
    a_auction = radar_utils.auction_assignment(cost, mask, eps=1e-4, max_iters=200)
    a_hung = np.asarray(radar_utils.hungarian_assignment(cost[None], mask[None]))[0]
    # both should assign gt i -> planted component i
    np.testing.assert_array_equal(np.asarray(a_auction), np.arange(5))
    np.testing.assert_array_equal(a_hung, np.arange(5))


def test_auction_respects_mask():
    gt, pred = _scan()
    mask = jnp.array([True, True, False, False, False])
    cost = radar_utils.radar_cost_matrix(gt, mask, pred, "euclidean")
    a = np.asarray(radar_utils.auction_assignment(cost, mask))
    assert (a[2:] == -1).all()
    assert (a[:2] >= 0).all()


def test_radar_loss_decreases_with_better_prediction():
    gt, good_pred = _scan()
    mask = jnp.ones((gt.shape[0],), bool)
    bad_pred = jnp.asarray(np.asarray(good_pred).copy())
    bad_pred = bad_pred.at[:5, 1:4].add(10.0)  # move planted components away

    for lt in ("nll", "euclidean"):
        loss_good, _ = radar_utils.calculate_radar_loss(gt[None], mask[None], good_pred[None], loss_type=lt)
        loss_bad, _ = radar_utils.calculate_radar_loss(gt[None], mask[None], bad_pred[None], loss_type=lt)
        assert float(loss_good) < float(loss_bad), lt


def test_radar_loss_jittable_and_differentiable():
    gt, pred = _scan()
    mask = jnp.ones((gt.shape[0],), bool)

    @jax.jit
    def loss_fn(p):
        loss, _ = radar_utils.calculate_radar_loss(gt[None], mask[None], p[None], loss_type="nll")
        return loss

    g = jax.grad(loss_fn)(pred)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_sample_radar_points_euclidean():
    _, pred = _scan()
    pts, keep = radar_utils.sample_radar_points(pred, "euclidean", threshold=0.5)
    k = np.asarray(keep)
    assert k[:5].all() and not k[5:].any()


def test_sample_radar_points_nll():
    _, pred = _scan()
    pts, keep = radar_utils.sample_radar_points(pred, "nll", rng=jax.random.PRNGKey(0))
    assert pts.shape == (32, 3)
    # high-existence components kept with high probability
    assert np.asarray(keep)[:5].mean() > 0.5


def test_gospa_perfect_match():
    pts = np.random.RandomState(0).randn(10, 3)
    gospa, assign, loc, missed, false = calculate_gospa(pts, pts, c=2.0, p=1.0)
    assert gospa < 1e-6 and len(assign) == 10 and missed == 0 and false == 0


def test_gospa_cardinality_penalties():
    pts = np.zeros((4, 3))
    gospa, _, loc, missed, false = calculate_gospa(pts, np.zeros((0, 3)), c=2.0, p=1.0, alpha=2.0)
    assert missed == 4 * 2.0 / 2.0 and false == 0
    gospa2, _, _, m2, f2 = calculate_gospa(np.zeros((0, 3)), pts, c=2.0, p=1.0, alpha=2.0)
    assert f2 == 4.0 and m2 == 0


def test_chamfer_np():
    x = np.zeros((3, 3))
    assert radar_utils.chamfer_distance_np(x, x) == 0.0
    y = x + np.array([1.0, 0, 0])
    np.testing.assert_allclose(radar_utils.chamfer_distance_np(x, y), 2.0)


def test_prev_frame_baseline_metrics():
    """cf. reference radar_eval_baseline.py: previous frame as prediction."""
    from neuradar_tpu.scripts.radar_eval_baseline import evaluate_prev_frame_baseline

    rng = np.random.RandomState(0)
    # drifting cloud: consecutive scans close together, so the baseline beats
    # a random prediction by a wide margin
    scans = [rng.randn(24, 3) + i * 0.1 for i in range(6)]
    out = evaluate_prev_frame_baseline(scans, eval_indices=[2, 4])
    assert set(out) >= {"chamfer_mean", "emd_mean", "gospa_mean"}
    assert out["num_scans"] == 2
    assert np.isfinite(out["chamfer_mean"]) and out["chamfer_mean"] > 0
    # identical scans -> zero chamfer
    same = [scans[0]] * 4
    out0 = evaluate_prev_frame_baseline(same, eval_indices=[1, 2])
    assert out0["chamfer_mean"] < 1e-9
