"""Closed-form checks for the mip-NeRF 360 interlevel loss (the reference
NERFACTO's proposal loss, losses.py:93-133) and its outer-measure helper."""

import jax.numpy as jnp
import numpy as np

from neuradar_tpu.cameras.rays import Frustums, RaySamples
from neuradar_tpu.model_components.losses import _outer_measure, interlevel_loss, lossfun_outer


def test_outer_measure_hand_example():
    # t1 bins: [0, .5] mass .4, [.5, 1] mass .6 ; t0 bins [0, .25], [.25, 1]
    t0 = jnp.asarray([[0.0, 0.25, 1.0]])
    t1 = jnp.asarray([[0.0, 0.5, 1.0]])
    y1 = jnp.asarray([[0.4, 0.6]])
    out = np.asarray(_outer_measure(t0, t1, y1))
    # [0, .25] overlaps only bin one -> .4 ; [.25, 1] overlaps both -> 1.0
    np.testing.assert_allclose(out, [[0.4, 1.0]], atol=1e-6)


def test_lossfun_outer_zero_when_enveloped():
    # identical histograms: the envelope's outer measure >= w everywhere
    t = jnp.asarray([[0.0, 0.3, 0.7, 1.0]])
    w = jnp.asarray([[0.2, 0.5, 0.3]])
    np.testing.assert_allclose(np.asarray(lossfun_outer(t, w, t, w)), 0.0, atol=1e-7)
    # one coarse bin holding all mass envelopes any finer histogram
    t_env = jnp.asarray([[0.0, 1.0]])
    w_env = jnp.asarray([[1.0]])
    np.testing.assert_allclose(np.asarray(lossfun_outer(t, w, t_env, w_env)), 0.0, atol=1e-7)


def test_lossfun_outer_penalizes_escaped_mass():
    # fine bin [0, .4] carries 0.8 but the proposal has zero mass in [0, .5]
    # (edges deliberately NOT shared: the outer measure is inclusive at
    # touching edges, multinerf stepfun semantics)
    t = jnp.asarray([[0.0, 0.4, 1.0]])
    w = jnp.asarray([[0.8, 0.2]])
    t_env = jnp.asarray([[0.0, 0.5, 1.0]])
    w_env = jnp.asarray([[0.0, 1.0]])
    out = np.asarray(lossfun_outer(t, w, t_env, w_env))
    np.testing.assert_allclose(out[0, 0], 0.8**2 / (0.8 + 1e-7), rtol=1e-5)
    np.testing.assert_allclose(out[0, 1], 0.0, atol=1e-7)


def _samples_from_sdist(sdist: np.ndarray) -> RaySamples:
    """Minimal RaySamples whose spacing edges equal sdist [R, S+1]."""
    r, sp1 = sdist.shape
    s = sp1 - 1
    starts = jnp.asarray(sdist[:, :-1, None], jnp.float32)  # [R, S, 1]
    ends = jnp.asarray(sdist[:, 1:, None], jnp.float32)
    return RaySamples(
        frustums=Frustums(
            origins=jnp.zeros((r, 3)), directions=jnp.zeros((r, 3)),
            starts=starts, ends=ends, pixel_area=jnp.zeros((r, 1)),
        ),
        deltas=ends - starts,
        spacing_starts=starts,
        spacing_ends=ends,
    )


def test_interlevel_loss_zero_for_perfect_proposal():
    rng = np.random.default_rng(0)
    sdist = np.sort(np.concatenate(
        [np.zeros((4, 1)), rng.uniform(0.05, 0.95, (4, 6)), np.ones((4, 1))], axis=1), axis=1)
    w = jnp.asarray(rng.uniform(0.0, 0.3, (4, 7, 1)), jnp.float32)
    rs = _samples_from_sdist(sdist)
    loss = float(interlevel_loss([w, w], [rs, rs]))
    np.testing.assert_allclose(loss, 0.0, atol=1e-7)


def test_interlevel_loss_positive_for_missing_proposal_mass():
    # fine mass concentrated in [0, .4] while the proposal has none below .5
    # (edges offset — shared edges are captured inclusively)
    fine_sdist = np.asarray([[0.0, 0.4, 1.0]])
    fine_w = jnp.asarray([[[0.9], [0.1]]], jnp.float32).reshape(1, 2, 1)
    prop_sdist = np.asarray([[0.0, 0.5, 1.0]])
    prop_w = jnp.asarray([[[0.0], [1.0]]], jnp.float32).reshape(1, 2, 1)
    loss = float(interlevel_loss([prop_w, fine_w], [_samples_from_sdist(prop_sdist),
                                                    _samples_from_sdist(fine_sdist)]))
    assert loss > 0.1
