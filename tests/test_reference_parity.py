"""Executed-reference numeric parity (VERDICT r3 item 2).

Every test here imports the ACTUAL reference code from /root/reference
(pure-torch fallback paths, via tests/_reference.py stubs) and asserts
numeric agreement with our JAX implementations on random inputs — parity
against executed reference code, not against re-derivations of it.

Covered targets (reference file:line):
  * HashEncoding torch fallback fwd + grads   encodings.py:406-466
  * SHEncoding / components_from_sph_harm     encodings.py:760-805
  * NeRFEncoding                              encodings.py:99-190
  * RaySamples.get_weights                    cameras/rays.py:188-210
  * Spaced/Uniform/LinDisp/Power samplers     ray_samplers.py:55-252,838-852
  * PDFSampler (eval mode)                    ray_samplers.py:280-376
  * interlevel + distortion losses            losses.py:115-157
  * radar MB cost matrix + NLL/euclid loss    radar_utils.py:54-167
  * GOSPA                                     gospa.py
  * camera / lidar / radar ray generation     cameras.py, lidars.py, radars.py
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests._reference import ref

torch = pytest.importorskip("torch")


def t2n(x):
    return x.detach().cpu().numpy()


def assert_close(mine, theirs, atol=1e-5, rtol=1e-5, msg=""):
    np.testing.assert_allclose(np.asarray(mine), np.asarray(theirs), atol=atol, rtol=rtol, err_msg=msg)


# ---------------------------------------------------------------------------
# Encodings
# ---------------------------------------------------------------------------


class TestHashEncodingParity:
    CFG = dict(num_levels=4, min_res=4, max_res=64, log2_hashmap_size=10, features_per_level=2)

    def _build(self):
        renc = ref("nerfstudio.field_components.encodings")
        torch.manual_seed(0)
        ref_enc = renc.HashEncoding(implementation="torch", **self.CFG)
        from neuradar_tpu.field_components.encodings import HashEncoding

        mine = HashEncoding(**self.CFG)
        # reference table is [T * L, F] with row = level * T + hash
        # (hash_offset = level * T); our flat layout is row-major over the
        # same (level-major row, feature) order — reshape(-1) is the map.
        flat = jnp.asarray(t2n(ref_enc.hash_table).reshape(-1))
        params = {"params": {"hash_table": flat}}
        return ref_enc, mine, params

    def test_scalings_match(self):
        ref_enc, mine, params = self._build()
        bound = mine.bind(params)
        assert_close(np.asarray(bound.scalings), t2n(ref_enc.scalings), msg="per-level resolutions")
        assert bound.table_size == ref_enc.hash_table_size

    def test_forward_parity(self):
        ref_enc, mine, params = self._build()
        rng = np.random.default_rng(1)
        pos = rng.uniform(0.001, 0.999, (233, 3)).astype(np.float32)
        ref_out = t2n(ref_enc(torch.from_numpy(pos)))
        my_out = np.asarray(mine.apply(params, jnp.asarray(pos)))
        assert ref_out.shape == my_out.shape == (233, 8)
        assert_close(my_out, ref_out, atol=1e-6, msg="hash encoding forward")

    def test_grad_parity(self):
        """Our custom VJP (recompute + scatter-add) vs torch autograd."""
        ref_enc, mine, params = self._build()
        rng = np.random.default_rng(2)
        pos = rng.uniform(0.001, 0.999, (97, 3)).astype(np.float32)
        cot = rng.standard_normal((97, self.CFG["num_levels"] * self.CFG["features_per_level"])).astype(np.float32)

        pos_t = torch.from_numpy(pos).requires_grad_(True)
        ref_enc.hash_table.requires_grad_(True)
        loss_t = (ref_enc(pos_t) * torch.from_numpy(cot)).sum()
        loss_t.backward()

        def loss_j(p, table_flat):
            out = mine.apply({"params": {"hash_table": table_flat}}, p)
            return (out * jnp.asarray(cot)).sum()

        g_pos, g_table = jax.grad(loss_j, argnums=(0, 1))(jnp.asarray(pos), params["params"]["hash_table"])
        assert_close(g_pos, t2n(pos_t.grad), atol=2e-3, rtol=1e-3, msg="d/d positions")
        assert_close(
            np.asarray(g_table), t2n(ref_enc.hash_table.grad).reshape(-1), atol=1e-5, msg="d/d table"
        )


class TestSHEncodingParity:
    @pytest.mark.parametrize("levels", [1, 2, 3, 4])
    def test_forward(self, levels):
        renc = ref("nerfstudio.field_components.encodings")
        ref_enc = renc.SHEncoding(levels=levels, implementation="torch")
        from neuradar_tpu.field_components.encodings import SHEncoding

        rng = np.random.default_rng(3)
        d = rng.standard_normal((111, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        ref_out = t2n(ref_enc(torch.from_numpy(d)))
        my_out = np.asarray(SHEncoding(levels=levels).apply({}, jnp.asarray(d)))
        assert my_out.shape == ref_out.shape == (111, levels**2)
        assert_close(my_out, ref_out, atol=1e-6, msg=f"SH levels={levels}")


class TestNeRFEncodingParity:
    @pytest.mark.parametrize("include_input", [False, True])
    def test_forward(self, include_input):
        renc = ref("nerfstudio.field_components.encodings")
        ref_enc = renc.NeRFEncoding(
            in_dim=3, num_frequencies=5, min_freq_exp=0.0, max_freq_exp=4.0,
            include_input=include_input, implementation="torch",
        )
        from neuradar_tpu.field_components.encodings import NeRFEncoding

        mine = NeRFEncoding(
            in_dim=3, num_frequencies=5, min_freq_exp=0.0, max_freq_exp=4.0, include_input=include_input
        )
        rng = np.random.default_rng(4)
        x = rng.uniform(0, 1, (77, 3)).astype(np.float32)
        ref_out = t2n(ref_enc(torch.from_numpy(x)))
        my_out = np.asarray(mine.apply({}, jnp.asarray(x)))
        assert my_out.shape == ref_out.shape
        assert_close(my_out, ref_out, atol=1e-5, msg="NeRF frequency encoding")


# ---------------------------------------------------------------------------
# Volume-rendering weights
# ---------------------------------------------------------------------------


class TestGetWeightsParity:
    def test_get_weights(self):
        rrays = ref("nerfstudio.cameras.rays")
        rng = np.random.default_rng(5)
        deltas = rng.uniform(0.01, 0.5, (13, 24, 1)).astype(np.float32)
        densities = rng.uniform(0.0, 5.0, (13, 24, 1)).astype(np.float32)

        import types as _types

        ref_self = _types.SimpleNamespace(deltas=torch.from_numpy(deltas))
        ref_w = t2n(rrays.RaySamples.get_weights(ref_self, torch.from_numpy(densities)))

        from neuradar_tpu.cameras.rays import Frustums, RaySamples

        zeros = jnp.zeros((13, 3))
        samples = RaySamples(
            frustums=Frustums(origins=zeros, directions=zeros, starts=jnp.zeros((13, 24, 1)),
                              ends=jnp.zeros((13, 24, 1)), pixel_area=jnp.zeros((13, 1))),
            deltas=jnp.asarray(deltas),
        )
        my_w = np.asarray(samples.get_weights(jnp.asarray(densities)))
        assert_close(my_w, ref_w, atol=1e-6, msg="RaySamples.get_weights")

    def test_weights_from_alphas(self):
        rrays = ref("nerfstudio.cameras.rays")
        rng = np.random.default_rng(6)
        alphas = rng.uniform(0.0, 1.0, (9, 17, 1)).astype(np.float32)
        ref_w = t2n(
            rrays.RaySamples.get_weights_and_transmittance_from_alphas(torch.from_numpy(alphas), weights_only=True)
        )
        from neuradar_tpu.cameras.rays import render_weights_from_alpha

        my_w = np.asarray(render_weights_from_alpha(jnp.asarray(alphas[..., 0])))
        assert_close(my_w, ref_w[..., 0], atol=1e-6, msg="weights from alphas")


# ---------------------------------------------------------------------------
# Samplers (deterministic eval mode — stratification is RNG-dependent)
# ---------------------------------------------------------------------------


def _make_bundles(num_rays=11, near=0.3, far=80.0, seed=7):
    rng = np.random.default_rng(seed)
    origins = rng.standard_normal((num_rays, 3)).astype(np.float32)
    directions = rng.standard_normal((num_rays, 3)).astype(np.float32)
    directions /= np.linalg.norm(directions, axis=-1, keepdims=True)
    pixel_area = rng.uniform(1e-6, 1e-4, (num_rays, 1)).astype(np.float32)
    nears = np.full((num_rays, 1), near, np.float32)
    fars = np.full((num_rays, 1), far, np.float32)

    rrays = ref("nerfstudio.cameras.rays")
    ref_bundle = rrays.RayBundle(
        origins=torch.from_numpy(origins), directions=torch.from_numpy(directions),
        pixel_area=torch.from_numpy(pixel_area), nears=torch.from_numpy(nears),
        fars=torch.from_numpy(fars),
    )
    from neuradar_tpu.cameras.rays import RayBundle

    my_bundle = RayBundle(
        origins=jnp.asarray(origins), directions=jnp.asarray(directions),
        pixel_area=jnp.asarray(pixel_area), nears=jnp.asarray(nears), fars=jnp.asarray(fars),
    )
    return ref_bundle, my_bundle


def _assert_samples_close(my_samples, ref_samples, atol=1e-4, msg=""):
    assert_close(my_samples.frustums.starts, t2n(ref_samples.frustums.starts), atol=atol, rtol=1e-4,
                 msg=f"{msg} bin starts")
    assert_close(my_samples.frustums.ends, t2n(ref_samples.frustums.ends), atol=atol, rtol=1e-4,
                 msg=f"{msg} bin ends")
    assert_close(my_samples.spacing_starts, t2n(ref_samples.spacing_starts), atol=1e-6,
                 msg=f"{msg} spacing starts")
    assert_close(my_samples.spacing_ends, t2n(ref_samples.spacing_ends), atol=1e-6,
                 msg=f"{msg} spacing ends")


class TestSpacedSamplerParity:
    def test_uniform(self):
        rs = ref("nerfstudio.model_components.ray_samplers")
        ref_bundle, my_bundle = _make_bundles()
        sampler = rs.UniformSampler(num_samples=32).eval()
        ref_samples = sampler(ref_bundle)
        from neuradar_tpu.model_components.ray_samplers import uniform_sampler

        my_samples = uniform_sampler(my_bundle, 32, rng=None)
        _assert_samples_close(my_samples, ref_samples, msg="uniform")

    def test_lin_disp_piecewise(self):
        rs = ref("nerfstudio.model_components.ray_samplers")
        ref_bundle, my_bundle = _make_bundles()
        sampler = rs.UniformLinDispPiecewiseSampler(num_samples=48).eval()
        ref_samples = sampler(ref_bundle)
        from neuradar_tpu.model_components.ray_samplers import lin_disp_piecewise_sampler

        my_samples = lin_disp_piecewise_sampler(my_bundle, 48, rng=None)
        _assert_samples_close(my_samples, ref_samples, msg="lin-disp piecewise")

    @pytest.mark.parametrize("lambda_,scaling", [(-1.0, 0.1), (-1.5, 2.0)])
    def test_power(self, lambda_, scaling):
        """ZipNeRF power spacing; (-1.0, 0.1) is NeuRAD's operating point."""
        rs = ref("nerfstudio.model_components.ray_samplers")
        ref_bundle, my_bundle = _make_bundles()
        sampler = rs.PowerSampler(num_samples=24, lambda_=lambda_, scaling=scaling).eval()
        ref_samples = sampler(ref_bundle)
        from neuradar_tpu.model_components.ray_samplers import power_sampler

        my_samples = power_sampler(my_bundle, 24, rng=None, lambda_=lambda_, scaling=scaling)
        _assert_samples_close(my_samples, ref_samples, msg=f"power({lambda_},{scaling})")


class TestPDFSamplerParity:
    @pytest.mark.parametrize("include_original", [False, True])
    def test_eval_mode(self, include_original):
        rs = ref("nerfstudio.model_components.ray_samplers")
        ref_bundle, my_bundle = _make_bundles(num_rays=9)
        init = rs.UniformLinDispPiecewiseSampler(num_samples=24).eval()
        ref_existing = init(ref_bundle)
        from neuradar_tpu.model_components.ray_samplers import lin_disp_piecewise_sampler, pdf_sampler

        my_existing = lin_disp_piecewise_sampler(my_bundle, 24, rng=None)

        rng = np.random.default_rng(8)
        weights = rng.uniform(0.0, 1.0, (9, 24, 1)).astype(np.float32)

        ref_pdf = rs.PDFSampler(
            num_samples=16, include_original=include_original, single_jitter=False
        ).eval()
        ref_samples = ref_pdf(ref_bundle, ref_existing, torch.from_numpy(weights), num_samples=16)
        my_samples = pdf_sampler(
            my_bundle, my_existing, jnp.asarray(weights), 16, rng=None,
            include_original=include_original,
        )
        _assert_samples_close(my_samples, ref_samples, msg=f"pdf(include_original={include_original})")


# ---------------------------------------------------------------------------
# Proposal / distortion losses
# ---------------------------------------------------------------------------


def _hist_fixture(seed, n_rays=7, n_final=16, n_prop=(32, 24)):
    """Random (sorted-edge, weight) histograms shaped like a proposal chain."""
    rng = np.random.default_rng(seed)
    import types as _types

    def one(n_samples):
        edges = np.sort(rng.uniform(0, 1, (n_rays, n_samples + 1)).astype(np.float32), axis=-1)
        edges[:, 0] = 0.0
        edges[:, -1] = 1.0
        w = rng.uniform(0, 0.2, (n_rays, n_samples, 1)).astype(np.float32)
        samples_like = _types.SimpleNamespace(
            spacing_starts=edges[:, :-1, None], spacing_ends=edges[:, 1:, None]
        )
        return samples_like, w

    chain = [one(n) for n in n_prop] + [one(n_final)]
    samples_np = [s for s, _ in chain]
    weights_np = [w for _, w in chain]

    def to_torch(ns):
        return type(ns)(spacing_starts=torch.from_numpy(ns.spacing_starts),
                        spacing_ends=torch.from_numpy(ns.spacing_ends))

    def to_jax(ns):
        return type(ns)(spacing_starts=jnp.asarray(ns.spacing_starts),
                        spacing_ends=jnp.asarray(ns.spacing_ends))

    ref_samples = [to_torch(s) for s in samples_np]
    ref_weights = [torch.from_numpy(w) for w in weights_np]
    my_samples = [to_jax(s) for s in samples_np]
    my_weights = [jnp.asarray(w) for w in weights_np]
    return ref_samples, ref_weights, my_samples, my_weights


class TestLossParity:
    def test_distortion_loss(self):
        rl = ref("nerfstudio.model_components.losses")
        ref_s, ref_w, my_s, my_w = _hist_fixture(10)
        from neuradar_tpu.model_components.losses import distortion_loss

        ref_val = float(rl.distortion_loss(ref_w, ref_s))
        my_val = float(distortion_loss(my_w, my_s))
        assert_close(my_val, ref_val, atol=1e-6, msg="mipnerf360 distortion loss")

    def test_interlevel_loss(self):
        """MipNeRF-360 proposal loss (losses.py:115-133)."""
        rl = ref("nerfstudio.model_components.losses")
        ref_s, ref_w, my_s, my_w = _hist_fixture(11)
        from neuradar_tpu.model_components.losses import interlevel_loss

        ref_val = float(rl.interlevel_loss(ref_w, ref_s))
        my_val = float(interlevel_loss(my_w, my_s))
        assert_close(my_val, ref_val, atol=1e-5, rtol=1e-4, msg="interlevel loss")

    def test_zipnerf_interlevel_loss(self):
        """ZipNeRF anti-aliased interlevel loss (losses.py:671-705) — the
        variant NeuRAD/NeuRadar actually train with."""
        rl = ref("nerfstudio.model_components.losses")
        ref_s, ref_w, my_s, my_w = _hist_fixture(12)
        from neuradar_tpu.model_components.losses import zipnerf_interlevel_loss

        ref_val = float(rl.zipnerf_interlevel_loss(ref_w, ref_s))
        my_val = float(zipnerf_interlevel_loss(my_w, my_s))
        assert_close(my_val, ref_val, atol=1e-5, rtol=1e-4, msg="zipnerf interlevel loss")


# ---------------------------------------------------------------------------
# Radar multi-Bernoulli loss
# ---------------------------------------------------------------------------


def _radar_fixture(seed, num_scans=3, n_mb=24, gt_sizes=(5, 9, 2)):
    rng = np.random.default_rng(seed)
    preds = rng.standard_normal((num_scans, n_mb, 7)).astype(np.float32)
    preds[..., 0] = rng.uniform(0.05, 0.95, (num_scans, n_mb))  # existence prob
    preds[..., 4:7] = rng.uniform(0.01, 1.0, (num_scans, n_mb, 3))  # scales
    gts = [rng.standard_normal((g, 3)).astype(np.float32) for g in gt_sizes]

    # reference layout: concatenated GT + indices with col 1 == 0 at scan starts
    batch = np.concatenate(gts, axis=0)
    idx_col1 = np.concatenate([list(range(len(g))) for g in gts]).astype(np.int64)
    indices = np.stack([np.zeros_like(idx_col1), idx_col1], axis=1)

    # our layout: padded [N, G_max, 3] + mask
    g_max = max(gt_sizes)
    gt_pad = np.zeros((num_scans, g_max, 3), np.float32)
    gt_mask = np.zeros((num_scans, g_max), bool)
    for i, g in enumerate(gts):
        gt_pad[i, : len(g)] = g
        gt_mask[i, : len(g)] = True
    return preds, batch, indices, gt_pad, gt_mask


class TestRadarLossParity:
    @pytest.mark.parametrize("loss_type,training", [("nll", True), ("nll", False),
                                                    ("euclidean", True)])
    def test_calculate_radar_loss(self, loss_type, training):
        rru = ref("nerfstudio.model_components.radar_utils")
        preds, batch, indices, gt_pad, gt_mask = _radar_fixture(13)
        ref_loss, _, _ = rru.calculate_radar_loss(
            torch.from_numpy(batch), torch.from_numpy(preds), torch.from_numpy(indices),
            loss_type=loss_type, training=training,
        )
        from neuradar_tpu.model_components.radar_utils import calculate_radar_loss

        my_loss, _ = calculate_radar_loss(
            jnp.asarray(gt_pad), jnp.asarray(gt_mask), jnp.asarray(preds),
            loss_type=loss_type, training=training, assignment="hungarian",
        )
        assert_close(float(my_loss), float(ref_loss), atol=1e-4, rtol=1e-4,
                     msg=f"radar loss ({loss_type}, training={training})")

    def test_cost_matrix_nll(self):
        """Cost matrices agree elementwise (ours is the transpose: rows=GT)."""
        rru = ref("nerfstudio.model_components.radar_utils")
        preds, batch, indices, gt_pad, gt_mask = _radar_fixture(14, num_scans=1, gt_sizes=(6,))
        mb = rru.MultiBernoulli(prediction=torch.from_numpy(preds[0]))
        for method in ("nll", "euclidean"):
            ref_cost = t2n(rru.get_cost_matrix(torch.from_numpy(batch), mb, method))  # [n_mb, G]
            from neuradar_tpu.model_components.radar_utils import radar_cost_matrix

            my_cost = np.asarray(radar_cost_matrix(
                jnp.asarray(batch), jnp.ones((len(batch),), bool), jnp.asarray(preds[0]), method
            ))  # [G, n_mb]
            assert_close(my_cost.T, ref_cost, atol=1e-4, rtol=1e-4, msg=f"cost matrix ({method})")


# ---------------------------------------------------------------------------
# GOSPA
# ---------------------------------------------------------------------------


class TestGospaParity:
    @pytest.mark.parametrize("nt,nk", [(8, 12), (12, 8), (0, 5), (5, 0), (7, 7)])
    def test_gospa(self, nt, nk):
        rg = ref("nerfstudio.model_components.gospa")
        rng = np.random.default_rng(15 + nt * 31 + nk)
        targets = rng.standard_normal((nt, 3)) * 3
        tracks = rng.standard_normal((nk, 3)) * 3
        c, p, alpha = 2.5, 2.0, 2.0
        ref_out = rg.calculate_gospa(list(targets), list(tracks), c, p, alpha)
        from neuradar_tpu.model_components.gospa import calculate_gospa

        my_out = calculate_gospa(targets, tracks, c, p, alpha)
        assert_close(my_out[0], ref_out[0], atol=1e-6, msg="gospa total")
        assert_close(my_out[2], ref_out[2], atol=1e-6, msg="gospa localization")
        assert_close(my_out[3], ref_out[3], atol=1e-6, msg="gospa missed")
        assert_close(my_out[4], ref_out[4], atol=1e-6, msg="gospa false")
        assert {int(k): int(v) for k, v in my_out[1].items()} == \
               {int(k): int(v) for k, v in ref_out[1].items()}


# ---------------------------------------------------------------------------
# Sensor ray generation
# ---------------------------------------------------------------------------


def _c2w_batch(rng, n):
    """Random rigid [N, 3, 4] poses (rotations via QR)."""
    mats = []
    for _ in range(n):
        q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        t = rng.standard_normal((3, 1)) * 5
        mats.append(np.concatenate([q, t], axis=1))
    return np.stack(mats).astype(np.float32)


class TestCameraRayParity:
    @pytest.mark.parametrize("with_distortion", [False, True])
    def test_perspective(self, with_distortion):
        rcams = ref("nerfstudio.cameras.cameras")
        rng = np.random.default_rng(20)
        n_cams, n_rays = 3, 64
        c2w = _c2w_batch(rng, n_cams)
        fx = rng.uniform(300, 600, (n_cams, 1)).astype(np.float32)
        fy = rng.uniform(300, 600, (n_cams, 1)).astype(np.float32)
        cx = np.full((n_cams, 1), 320.0, np.float32)
        cy = np.full((n_cams, 1), 240.0, np.float32)
        w = np.full((n_cams, 1), 640, np.int64)
        h = np.full((n_cams, 1), 480, np.int64)
        dist = None
        if with_distortion:
            dist = np.zeros((n_cams, 6), np.float32)
            dist[:, 0] = rng.uniform(-0.05, 0.05, n_cams)  # k1
            dist[:, 1] = rng.uniform(-0.01, 0.01, n_cams)  # k2

        ref_cams = rcams.Cameras(
            camera_to_worlds=torch.from_numpy(c2w), fx=torch.from_numpy(fx), fy=torch.from_numpy(fy),
            cx=torch.from_numpy(cx), cy=torch.from_numpy(cy), width=torch.from_numpy(w),
            height=torch.from_numpy(h), camera_type=rcams.CameraType.PERSPECTIVE,
            distortion_params=torch.from_numpy(dist) if dist is not None else None,
        )
        idx = rng.integers(0, n_cams, (n_rays, 1))
        coords = np.stack(
            [rng.integers(0, 480, n_rays), rng.integers(0, 640, n_rays)], axis=-1
        ).astype(np.float32)
        # the reference's get_image_coords adds a 0.5 pixel-center offset to
        # integer indices before generate_rays; ours adds it internally
        ref_bundle = ref_cams.generate_rays(
            camera_indices=torch.from_numpy(idx), coords=torch.from_numpy(coords + 0.5)
        )

        from neuradar_tpu.cameras.cameras import Cameras, CameraType

        my_cams = Cameras(
            camera_to_worlds=jnp.asarray(c2w), fx=jnp.asarray(fx), fy=jnp.asarray(fy),
            cx=jnp.asarray(cx), cy=jnp.asarray(cy), width=jnp.asarray(w), height=jnp.asarray(h),
            camera_type=jnp.full((n_cams, 1), CameraType.PERSPECTIVE, jnp.int32),
            distortion_params=jnp.asarray(dist) if dist is not None else None,
        )
        my_bundle = my_cams.generate_rays(jnp.asarray(idx[:, 0]), jnp.asarray(coords))

        tag = f"perspective(dist={with_distortion})"
        assert_close(my_bundle.origins, t2n(ref_bundle.origins), atol=1e-5, msg=f"{tag} origins")
        assert_close(my_bundle.directions, t2n(ref_bundle.directions), atol=2e-5, rtol=1e-4,
                     msg=f"{tag} directions")
        assert_close(my_bundle.pixel_area, t2n(ref_bundle.pixel_area), atol=1e-9, rtol=2e-3,
                     msg=f"{tag} pixel_area")

    def test_fisheye(self):
        rcams = ref("nerfstudio.cameras.cameras")
        rng = np.random.default_rng(21)
        n_cams, n_rays = 2, 48
        c2w = _c2w_batch(rng, n_cams)
        fx = fy = np.full((n_cams, 1), 400.0, np.float32)
        cx = np.full((n_cams, 1), 320.0, np.float32)
        cy = np.full((n_cams, 1), 240.0, np.float32)
        w = np.full((n_cams, 1), 640, np.int64)
        h = np.full((n_cams, 1), 480, np.int64)

        ref_cams = rcams.Cameras(
            camera_to_worlds=torch.from_numpy(c2w), fx=torch.from_numpy(fx), fy=torch.from_numpy(fy),
            cx=torch.from_numpy(cx), cy=torch.from_numpy(cy), width=torch.from_numpy(w),
            height=torch.from_numpy(h), camera_type=rcams.CameraType.FISHEYE,
        )
        idx = rng.integers(0, n_cams, (n_rays, 1))
        coords = np.stack(
            [rng.integers(100, 380, n_rays), rng.integers(100, 540, n_rays)], axis=-1
        ).astype(np.float32)
        ref_bundle = ref_cams.generate_rays(
            camera_indices=torch.from_numpy(idx), coords=torch.from_numpy(coords + 0.5)
        )

        from neuradar_tpu.cameras.cameras import Cameras, CameraType

        my_cams = Cameras(
            camera_to_worlds=jnp.asarray(c2w), fx=jnp.asarray(fx), fy=jnp.asarray(fy),
            cx=jnp.asarray(cx), cy=jnp.asarray(cy), width=jnp.asarray(w), height=jnp.asarray(h),
            camera_type=jnp.full((n_cams, 1), CameraType.FISHEYE, jnp.int32),
        )
        my_bundle = my_cams.generate_rays(jnp.asarray(idx[:, 0]), jnp.asarray(coords))
        assert_close(my_bundle.origins, t2n(ref_bundle.origins), atol=1e-5, msg="fisheye origins")
        assert_close(my_bundle.directions, t2n(ref_bundle.directions), atol=2e-5, rtol=1e-4,
                     msg="fisheye directions")
        assert_close(my_bundle.pixel_area, t2n(ref_bundle.pixel_area), atol=1e-9, rtol=2e-3,
                     msg="fisheye pixel_area")

    @pytest.mark.parametrize("horizontal", [False, True])
    @pytest.mark.parametrize("reversed_offsets", [False, True])
    def test_rolling_shutter(self, horizontal, reversed_offsets):
        """Rolling-shutter compensation (reference cameras.py:922-937):
        per-row (TOP_TO_BOTTOM, pandaset) or per-column (rs_direction
        'Horizontal', WOD) time offsets scale the sensor velocity into the
        ray origins and shift the ray times. reversed_offsets covers WOD's
        RIGHT_TO_LEFT direction 4, where the parser flips the offsets to
        (+rs, -rs) so time decreases with column (wod_dataparser.py:131-134)."""
        rcams = ref("nerfstudio.cameras.cameras")
        rng = np.random.default_rng(21)
        n_cams, n_rays = 3, 48
        c2w = _c2w_batch(rng, n_cams)
        fx = fy = np.full((n_cams, 1), 400.0, np.float32)
        cx = np.full((n_cams, 1), 320.0, np.float32)
        cy = np.full((n_cams, 1), 240.0, np.float32)
        w = np.full((n_cams, 1), 640, np.int64)
        h = np.full((n_cams, 1), 480, np.int64)
        times = rng.uniform(0, 5, (n_cams, 1)).astype(np.float32)
        offsets = np.stack([np.full(n_cams, -0.015), np.full(n_cams, 0.035)], -1).astype(np.float32)
        if reversed_offsets:
            offsets = offsets[:, ::-1].copy()
        velocities = rng.uniform(-10, 10, (n_cams, 3)).astype(np.float32)

        ref_cams = rcams.Cameras(
            camera_to_worlds=torch.from_numpy(c2w), fx=torch.from_numpy(fx), fy=torch.from_numpy(fy),
            cx=torch.from_numpy(cx), cy=torch.from_numpy(cy), width=torch.from_numpy(w),
            height=torch.from_numpy(h), camera_type=rcams.CameraType.PERSPECTIVE,
            times=torch.from_numpy(times),
            metadata={"rolling_shutter_offsets": torch.from_numpy(offsets),
                      "velocities": torch.from_numpy(velocities),
                      **({"rs_direction": "Horizontal"} if horizontal else {})},
        )
        idx = rng.integers(0, n_cams, (n_rays, 1))
        coords = np.stack(
            [rng.integers(0, 480, n_rays), rng.integers(0, 640, n_rays)], axis=-1
        ).astype(np.float32)
        ref_bundle = ref_cams.generate_rays(
            camera_indices=torch.from_numpy(idx), coords=torch.from_numpy(coords + 0.5)
        )

        from neuradar_tpu.cameras.cameras import Cameras, CameraType

        my_cams = Cameras(
            camera_to_worlds=jnp.asarray(c2w), fx=jnp.asarray(fx), fy=jnp.asarray(fy),
            cx=jnp.asarray(cx), cy=jnp.asarray(cy), width=jnp.asarray(w), height=jnp.asarray(h),
            camera_type=jnp.full((n_cams, 1), CameraType.PERSPECTIVE, jnp.int32),
            times=jnp.asarray(times),
            metadata={"rolling_shutter_offsets": jnp.asarray(offsets),
                      "velocities": jnp.asarray(velocities),
                      **({"rs_horizontal": jnp.full((n_cams, 1), True)} if horizontal else {})},
        )
        my_bundle = my_cams.generate_rays(jnp.asarray(idx[:, 0]), jnp.asarray(coords))

        # origins move by velocity * per-row time offset; times shift equally
        assert_close(my_bundle.origins, t2n(ref_bundle.origins), atol=1e-5, msg="rs origins")
        assert_close(my_bundle.times, t2n(ref_bundle.times), atol=1e-6, msg="rs times")
        # the compensation must actually displace something (row-dependent)
        base = np.take_along_axis(c2w[..., :3, 3], np.repeat(idx, 3, 1), axis=0)
        assert np.abs(t2n(ref_bundle.origins) - base).max() > 1e-3


class TestLidarRayParity:
    def test_rays_from_points(self):
        rlid = ref("nerfstudio.cameras.lidars")
        rng = np.random.default_rng(22)
        n_lidars, n_rays = 2, 57
        l2w = _c2w_batch(rng, n_lidars)
        times = rng.uniform(0, 1, (n_lidars, 1)).astype(np.float32)
        # x, y, z, intensity, time(relative), channel
        points = rng.standard_normal((n_rays, 6)).astype(np.float32)
        points[:, :3] *= 20
        points[:, 4] = rng.uniform(-0.05, 0.05, n_rays)
        idx = rng.integers(0, n_lidars, (n_rays, 1))

        ref_lidars = rlid.Lidars(
            lidar_to_worlds=torch.from_numpy(l2w), times=torch.from_numpy(times),
        )
        ref_bundle = ref_lidars.generate_rays(
            lidar_indices=torch.from_numpy(idx), points=torch.from_numpy(points)
        )

        from neuradar_tpu.cameras.lidars import Lidars

        my_lidars = Lidars(
            lidar_to_worlds=jnp.asarray(l2w), lidar_type=jnp.ones((n_lidars, 1), jnp.int32),
            times=jnp.asarray(times),
        )
        my_bundle = my_lidars.generate_rays(jnp.asarray(idx[:, 0]), jnp.asarray(points))

        assert_close(my_bundle.origins, t2n(ref_bundle.origins), atol=1e-5, msg="lidar origins")
        assert_close(my_bundle.directions, t2n(ref_bundle.directions), atol=1e-5, msg="lidar directions")
        assert_close(my_bundle.pixel_area, t2n(ref_bundle.pixel_area), atol=1e-9, msg="lidar pixel_area")
        assert_close(my_bundle.metadata["directions_norm"], t2n(ref_bundle.metadata["directions_norm"]),
                     atol=1e-4, rtol=1e-5, msg="lidar measured distance")
        assert_close(my_bundle.times, t2n(ref_bundle.times), atol=1e-6, msg="lidar times")


class TestRadarRayParity:
    def test_rays_from_fov(self):
        rrad = ref("nerfstudio.cameras.radars")
        rng = np.random.default_rng(23)
        n_radars = 3
        r2w = _c2w_batch(rng, n_radars)
        times = rng.uniform(0, 1, (n_radars, 1)).astype(np.float32)
        fov = dict(min_azimuth=-0.8, max_azimuth=0.8, min_elevation=-0.08, max_elevation=0.40,
                   azimuth_step=0.015, elevation_step=0.015)

        ref_radars = rrad.Radars(
            radar_to_worlds=torch.from_numpy(r2w), times=torch.from_numpy(times),
            radar_azimuth_ray_divergence=fov["azimuth_step"],
            radar_elevation_ray_divergence=fov["elevation_step"],
            min_azimuth=fov["min_azimuth"], max_azimuth=fov["max_azimuth"],
            min_elevation=fov["min_elevation"], max_elevation=fov["max_elevation"],
        )
        scan_idx = np.array([0, 2], np.int64)
        ref_bundle = ref_radars.generate_rays(scan_indices=torch.from_numpy(scan_idx))

        from neuradar_tpu.cameras.radars import Radars, fov_grid

        grid = fov_grid(**fov)
        my_radars = Radars(
            radar_to_worlds=jnp.asarray(r2w), radar_type=jnp.ones((n_radars, 1), jnp.int32),
            fov_directions=jnp.asarray(grid), times=jnp.asarray(times),
            azimuth_ray_divergence=fov["azimuth_step"], elevation_ray_divergence=fov["elevation_step"],
        )
        my_bundle = my_radars.generate_rays(jnp.asarray(scan_idx))

        assert my_bundle.origins.shape == tuple(ref_bundle.origins.shape), \
            f"FoV grid sizes differ: {my_bundle.origins.shape} vs {tuple(ref_bundle.origins.shape)}"
        assert_close(my_bundle.metadata["directions_spher"],
                     t2n(ref_bundle.metadata["directions_spher"]), atol=1e-5,
                     msg="radar spherical grid")
        assert_close(my_bundle.origins, t2n(ref_bundle.origins), atol=1e-5, msg="radar origins")
        assert_close(my_bundle.directions, t2n(ref_bundle.directions), atol=2e-5,
                     msg="radar directions")
        assert_close(my_bundle.pixel_area, t2n(ref_bundle.pixel_area), atol=1e-10,
                     msg="radar pixel_area")
        assert_close(my_bundle.times, t2n(ref_bundle.times), atol=1e-6, msg="radar times")


# ---------------------------------------------------------------------------
# Frustum gaussians, scene contraction, pose maps
# ---------------------------------------------------------------------------


class TestFrustumGaussianParity:
    @pytest.mark.parametrize("num_multisamples", [1, 3])
    def test_fast_isotropic(self, num_multisamples):
        """cf. cameras/rays.py:109-124 — the hot-path blob approximation."""
        rs = ref("nerfstudio.model_components.ray_samplers")
        ref_bundle, my_bundle = _make_bundles(num_rays=6)
        ref_samples = rs.UniformSampler(num_samples=12).eval()(ref_bundle)
        from neuradar_tpu.model_components.ray_samplers import uniform_sampler

        my_samples = uniform_sampler(my_bundle, 12, rng=None)
        ref_g = ref_samples.frustums.get_fast_isotropic_gaussian(num_multisamples)
        my_g = my_samples.frustums.get_fast_isotropic_gaussian(num_multisamples)
        assert_close(my_g.mean, t2n(ref_g.mean), atol=1e-4, rtol=1e-4, msg="gaussian means")
        assert_close(my_g.std, t2n(ref_g.std), atol=1e-6, rtol=1e-4, msg="gaussian stds")


class TestSceneContractionParity:
    @pytest.mark.parametrize("order", [float("inf"), None])
    def test_points(self, order):
        rsd = ref("nerfstudio.field_components.spatial_distortions")
        rng = np.random.default_rng(30)
        x = (rng.standard_normal((200, 3)) * 2.0).astype(np.float32)
        ref_c = rsd.SceneContraction(order=order)
        ref_out = t2n(ref_c(torch.from_numpy(x)))
        from neuradar_tpu.field_components.spatial_distortions import contract_points

        my_out = np.asarray(contract_points(jnp.asarray(x), float("inf") if order else 2.0))
        assert_close(my_out, ref_out, atol=1e-6, msg=f"contraction order={order}")

    def test_scaled_gaussians(self):
        rsd = ref("nerfstudio.field_components.spatial_distortions")
        rmath = ref("nerfstudio.utils.math")
        rng = np.random.default_rng(31)
        mean = (rng.standard_normal((40, 5, 1, 3)) * 3.0).astype(np.float32)
        std = rng.uniform(0.01, 0.5, (40, 5, 1, 1)).astype(np.float32)
        ref_c = rsd.ScaledSceneContraction(order=float("inf"), scale=2.0, normalize=True)
        ref_g = ref_c(rmath.GaussiansStd(mean=torch.from_numpy(mean), std=torch.from_numpy(std)))

        from neuradar_tpu.field_components.spatial_distortions import ScaledSceneContraction
        from neuradar_tpu.utils.math import GaussiansStd

        my_g = ScaledSceneContraction(order=float("inf"), scale=2.0, normalize=True)(
            GaussiansStd(mean=jnp.asarray(mean), std=jnp.asarray(std))
        )
        assert_close(my_g.mean, t2n(ref_g.mean), atol=1e-6, msg="scaled contraction means")
        assert_close(my_g.std, t2n(ref_g.std), atol=1e-6, msg="scaled contraction stds")


class TestPoseParity:
    def test_exp_maps(self):
        """cf. cameras/lie_groups.py:24-107 (the camera optimizer's core)."""
        rlie = ref("nerfstudio.cameras.lie_groups")
        rng = np.random.default_rng(32)
        # include near-zero tangents (the Taylor branch) and larger ones
        tangent = np.concatenate([
            rng.standard_normal((8, 6)).astype(np.float32) * 0.5,
            rng.standard_normal((4, 6)).astype(np.float32) * 1e-5,
        ])
        from neuradar_tpu.utils.poses import exp_map_SE3, exp_map_SO3xR3

        ref_so3 = t2n(rlie.exp_map_SO3xR3(torch.from_numpy(tangent)))
        my_so3 = np.asarray(exp_map_SO3xR3(jnp.asarray(tangent)))
        assert_close(my_so3, ref_so3, atol=1e-5, msg="exp_map_SO3xR3")

        ref_se3 = t2n(rlie.exp_map_SE3(torch.from_numpy(tangent)))
        my_se3 = np.asarray(exp_map_SE3(jnp.asarray(tangent)))
        assert_close(my_se3, ref_se3, atol=1e-5, msg="exp_map_SE3")

    def test_pose_ops(self):
        rposes = ref("nerfstudio.utils.poses")
        rng = np.random.default_rng(33)
        a = _c2w_batch(rng, 5)
        b = _c2w_batch(rng, 5)
        from neuradar_tpu.utils.poses import inverse, multiply, to4x4

        assert_close(np.asarray(to4x4(jnp.asarray(a))), t2n(rposes.to4x4(torch.from_numpy(a))),
                     atol=1e-6, msg="to4x4")
        assert_close(np.asarray(multiply(jnp.asarray(a), jnp.asarray(b))),
                     t2n(rposes.multiply(torch.from_numpy(a), torch.from_numpy(b))),
                     atol=1e-5, msg="pose multiply")
        assert_close(np.asarray(inverse(jnp.asarray(a))),
                     t2n(rposes.inverse(torch.from_numpy(a))), atol=1e-5, msg="pose inverse")


# ---------------------------------------------------------------------------
# Renderers
# ---------------------------------------------------------------------------


class TestRendererParity:
    def _fixture(self, seed=40, n_rays=11, n_samples=19):
        rng = np.random.default_rng(seed)
        starts = np.sort(rng.uniform(0.5, 60.0, (n_rays, n_samples, 1)).astype(np.float32), axis=1)
        ends = starts + rng.uniform(0.05, 2.0, (n_rays, n_samples, 1)).astype(np.float32)
        w = rng.uniform(0, 0.12, (n_rays, n_samples, 1)).astype(np.float32)
        feats = rng.standard_normal((n_rays, n_samples, 5)).astype(np.float32)
        rgb = rng.uniform(0, 1, (n_rays, n_samples, 3)).astype(np.float32)
        import types as _types

        mk = lambda lib: _types.SimpleNamespace(
            frustums=_types.SimpleNamespace(starts=lib(starts), ends=lib(ends)))
        return starts, ends, w, feats, rgb, mk

    def test_feature_and_accumulation(self):
        rr = ref("nerfstudio.model_components.renderers")
        _, _, w, feats, _, _ = self._fixture()
        from neuradar_tpu.model_components.renderers import render_accumulation, render_features

        ref_f = t2n(rr.FeatureRenderer()(torch.from_numpy(feats), torch.from_numpy(w)))
        assert_close(np.asarray(render_features(jnp.asarray(feats), jnp.asarray(w))), ref_f,
                     atol=1e-6, msg="feature renderer")
        ref_a = t2n(rr.AccumulationRenderer.forward(torch.from_numpy(w)))
        assert_close(np.asarray(render_accumulation(jnp.asarray(w))), ref_a, atol=1e-6,
                     msg="accumulation renderer")

    def test_depth_median_and_expected(self):
        rr = ref("nerfstudio.model_components.renderers")
        starts, ends, w, _, _, mk = self._fixture()
        from neuradar_tpu.model_components.renderers import render_depth_expected, render_depth_median

        ref_med = t2n(rr.DepthRenderer("median")(torch.from_numpy(w), mk(torch.from_numpy)))
        my_med = np.asarray(render_depth_median(jnp.asarray(w), mk(jnp.asarray)))
        assert_close(my_med, ref_med, atol=1e-6, msg="median depth")

        ref_exp = t2n(rr.DepthRenderer("expected")(torch.from_numpy(w), mk(torch.from_numpy)))
        my_exp = np.asarray(render_depth_expected(jnp.asarray(w), mk(jnp.asarray)))
        assert_close(my_exp, ref_exp, atol=1e-5, rtol=1e-5, msg="expected depth")

    def test_rgb_background_blend(self):
        rr = ref("nerfstudio.model_components.renderers")
        _, _, w, _, rgb, _ = self._fixture()
        from neuradar_tpu.model_components.renderers import render_rgb_background

        bg = np.asarray([0.2, 0.5, 0.9], np.float32)
        ref_rgb = t2n(rr.RGBRenderer.combine_rgb(
            torch.from_numpy(rgb), torch.from_numpy(w), background_color=torch.from_numpy(bg)))
        my_rgb = np.asarray(render_rgb_background(jnp.asarray(rgb), jnp.asarray(w), jnp.asarray(bg)))
        assert_close(my_rgb, ref_rgb, atol=1e-6, msg="rgb background blend")


class TestTrajectoryInterpolationParity:
    def test_interpolate_trajectories_6d(self):
        """cf. utils/poses.py:90-150 (flatten=False) — the actor-pose path
        NeuRAD's dynamic actors train through."""
        rposes = ref("nerfstudio.utils.poses")
        rng = np.random.default_rng(41)
        n_times, n_actors, n_q = 7, 4, 13
        poses = rng.standard_normal((n_times, n_actors, 9)).astype(np.float32)
        pose_times = np.sort(rng.uniform(0, 10, n_times)).astype(np.float32)
        query_times = rng.uniform(-1, 11, (n_q, 1)).astype(np.float32)  # incl. out-of-range
        valid = rng.random((n_times, n_actors)) > 0.3

        ref_out, ref_mask = rposes.interpolate_trajectories_6d(
            torch.from_numpy(poses), torch.from_numpy(pose_times), torch.from_numpy(query_times),
            pose_valid_mask=torch.from_numpy(valid), flatten=False,
        )
        from neuradar_tpu.utils.poses import interpolate_trajectories_6d

        my_out, my_mask = interpolate_trajectories_6d(
            jnp.asarray(poses), jnp.asarray(pose_times), jnp.asarray(query_times[:, 0]),
            pose_valid_mask=jnp.asarray(valid),
        )
        assert_close(np.asarray(my_mask), t2n(ref_mask), msg="interp validity mask")
        assert_close(np.asarray(my_out), t2n(ref_out), atol=1e-5, rtol=1e-4, msg="interp 9d poses")

    def test_rotation_6d_roundtrip_matches_reference(self):
        rcu = ref("nerfstudio.cameras.camera_utils")
        rng = np.random.default_rng(42)
        d6 = rng.standard_normal((17, 6)).astype(np.float32)
        from neuradar_tpu.utils.poses import matrix_to_rotation_6d, rotation_6d_to_matrix

        ref_m = t2n(rcu.rotation_6d_to_matrix(torch.from_numpy(d6)))
        my_m = np.asarray(rotation_6d_to_matrix(jnp.asarray(d6)))
        assert_close(my_m, ref_m, atol=1e-5, msg="rotation_6d_to_matrix")
        ref_back = t2n(rcu.matrix_to_rotation_6d(torch.from_numpy(ref_m)))
        my_back = np.asarray(matrix_to_rotation_6d(jnp.asarray(my_m)))
        assert_close(my_back, ref_back, atol=1e-5, msg="matrix_to_rotation_6d")
