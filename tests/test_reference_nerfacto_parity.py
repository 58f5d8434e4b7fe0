"""FULL-MODEL executed-reference parity for the NERFACTO family.

The neuradar composition is covered by tests/test_reference_model_parity.py;
this applies the same method — instantiate the actual /root/reference
NerfactoModel (torch CPU fallback), copy every parameter into our
NerfactoModel, feed one identical ray bundle — to the second model family:

  * eval get_outputs agreement (rgb, accumulation, expected depth),
  * train-mode loss-dict agreement (rgb / interlevel / distortion),
  * gradient agreement of the summed loss (field grid/MLPs, appearance,
    proposal networks), torch autograd vs jax.grad.

Documented reference deviations exercised here:
  * REFERENCE BUG — dead first proposal network: the sampler's positions
    adapter `density_fns = [lambda rs: f(rs.frustums.get_positions()) for f
    in density_fns]` (model_components/ray_samplers.py:636) LATE-BINDS `f`,
    so BOTH nerfacto proposal rounds evaluate `proposal_networks[1]` and
    `proposal_networks[0]` is dead weight (grad None — asserted). The same
    closure bug family as the neuradar `density_fns` one
    (tests/test_reference_model_parity.py). We bind round i to network i;
    for parity the reference's network-1 parameters are loaded into BOTH of
    our proposal fields and grad equality holds for their SUM.
  * The reference's NearFarCollider resets the near plane to 0 for
    eval/inference (reset_near_plane default) — found here, now matched by
    our NerfactoModel.
  * SH directions: the torch fallback evaluates the SH basis on the
    [0, 1]-mapped directions; we match tcnn (raw unit dirs) — patched.
  * The reference's "depth" output is MEDIAN depth under no_grad; parity is
    asserted against its "expected_depth" (our "depth").
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests._reference import ref

torch = pytest.importorskip("torch")

R = 64  # rays
NUM_PROP = (24, 12)
NUM_NERF = 8


def t2n(x):
    return x.detach().cpu().numpy()


def _build_reference():
    rmod = ref("nerfstudio.models.nerfacto")
    rscene = ref("nerfstudio.data.scene_box")

    cfg = rmod.NerfactoModelConfig(implementation="torch")
    cfg.log2_hashmap_size = 12
    cfg.num_levels = 4
    cfg.max_res = 128
    cfg.num_proposal_samples_per_ray = NUM_PROP
    cfg.num_nerf_samples_per_ray = NUM_NERF
    cfg.proposal_net_args_list = [
        {"hidden_dim": 16, "log2_hashmap_size": 10, "num_levels": 3, "max_res": 64, "use_linear": False},
        {"hidden_dim": 16, "log2_hashmap_size": 10, "num_levels": 3, "max_res": 64, "use_linear": False},
    ]
    torch.manual_seed(0)
    model = rmod.NerfactoModel(
        config=cfg,
        scene_box=rscene.SceneBox(aabb=torch.tensor([[-1.0] * 3, [1.0] * 3])),
        num_train_data=1,
    )
    # torch SH fallback feeds [0,1]-mapped dirs to the basis; we match tcnn
    ref("nerfstudio.fields.nerfacto_field").get_normalized_directions = lambda d: d.contiguous()
    return model


def _build_ours():
    from neuradar_tpu.models.nerfacto import NerfactoModel, NerfactoModelConfig

    cfg = NerfactoModelConfig(
        log2_hashmap_size=12, num_levels=4, max_res=128,
        num_proposal_samples_per_ray=NUM_PROP, num_nerf_samples_per_ray=NUM_NERF,
        proposal_net_args_list=(
            {"hidden_dim": 16, "log2_hashmap_size": 10, "num_levels": 3, "max_res": 64, "use_linear": False},
            {"hidden_dim": 16, "log2_hashmap_size": 10, "num_levels": 3, "max_res": 64, "use_linear": False},
        ),
    )
    return NerfactoModel(config=cfg, static_scale=1.0, num_embeds=1)


def _map_mlp(sd, prefix, n_layers):
    out = {}
    for i in range(n_layers):
        name = f"hidden_{i}" if i < n_layers - 1 else "output"
        out[name] = {"kernel": sd[f"{prefix}.layers.{i}.weight"].T,
                     "bias": sd[f"{prefix}.layers.{i}.bias"]}
    return out


def copy_reference_params(ref_model):
    sd = {k: v.detach().cpu().numpy() for k, v in ref_model.state_dict().items()}
    p = {
        "field": {
            "grid": {"hash_table": sd["field.mlp_base.model.0.hash_table"].reshape(-1)},
            "mlp_base": _map_mlp(sd, "field.mlp_base.model.1", 2),
            "mlp_head": _map_mlp(sd, "field.mlp_head", 3),
            "appearance": {"embedding": sd["field.embedding_appearance.embedding.weight"]},
        },
        "camera_optimizer": {"pose_adjustment": sd["camera_optimizer.pose_adjustment"]},
    }
    # dead-network reference bug (module docstring): net 1 into BOTH fields
    for i in range(2):
        p[f"proposal_{i}"] = {
            "grid": {"hash_table": sd["proposal_networks.1.mlp_base.0.hash_table"].reshape(-1)},
            "decoder": _map_mlp(sd, "proposal_networks.1.mlp_base.1", 2),
        }
    return {"params": jax.tree.map(jnp.asarray, p)}


def _make_rays():
    rng = np.random.RandomState(3)
    dirs = rng.randn(R, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = rng.uniform(-0.3, 0.3, (R, 3)).astype(np.float32)
    return origins, dirs


def _ref_bundle(d, o):
    rrays = ref("nerfstudio.cameras.rays")
    return rrays.RayBundle(
        origins=torch.from_numpy(o), directions=torch.from_numpy(d),
        pixel_area=torch.full((R, 1), 1e-4),
        camera_indices=torch.zeros((R, 1), dtype=torch.long),
    )


def _my_bundle(d, o):
    from neuradar_tpu.cameras.rays import RayBundle

    return RayBundle(
        origins=jnp.asarray(o), directions=jnp.asarray(d),
        pixel_area=jnp.full((R, 1), 1e-4),
        camera_indices=jnp.zeros((R, 1), jnp.int32),
    )


@pytest.fixture(scope="module")
def parity():
    from neuradar_tpu.models.nerfacto import NerfactoModel

    ref_model = _build_reference()
    mine = _build_ours()
    variables = copy_reference_params(ref_model)
    o, d = _make_rays()

    # ---- eval forward
    ref_model.eval()
    with torch.no_grad():
        ref_eval = ref_model.forward(_ref_bundle(d, o))
    my_eval = mine.apply(variables, _my_bundle(d, o), False)

    # ---- train-mode losses + grads (deterministic: sampler eval on the
    # reference side, rng=None on ours)
    ref_model.train()
    ref_model.proposal_sampler.eval()
    gt = np.random.RandomState(5).rand(R, 3).astype(np.float32)
    ref_batch = {"image": torch.from_numpy(gt)}
    ref_model.zero_grad()
    ref_out = ref_model.forward(_ref_bundle(d, o))
    ref_metrics = ref_model.get_metrics_dict(ref_out, ref_batch)
    ref_losses = ref_model.get_loss_dict(ref_out, ref_batch, ref_metrics)
    sum(ref_losses.values()).backward()

    def loss_fn(params):
        total, (losses, metrics, _) = mine.apply(
            {"params": params}, _my_bundle(d, o), {"rgb": jnp.asarray(gt)}, True,
            method=NerfactoModel.loss_and_metrics,
            rngs={"sampling": jax.random.PRNGKey(0)},
        )
        return total, (losses, metrics)

    # our sampler takes rng from make_rng; force the deterministic path
    import neuradar_tpu.models.nerfacto as mymod

    orig_pns = mymod.proposal_network_sampler
    mymod.proposal_network_sampler = lambda rb, dfs, nps, nns, rng=None, **kw: orig_pns(
        rb, dfs, nps, nns, rng=None, **kw
    )
    try:
        (tot, (my_losses, my_metrics)), my_grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"]
        )
    finally:
        mymod.proposal_network_sampler = orig_pns

    return dict(ref_model=ref_model, mine=mine, variables=variables,
                ref_eval=ref_eval, my_eval=my_eval,
                ref_losses=ref_losses, ref_metrics=ref_metrics,
                my_losses=my_losses, my_metrics=my_metrics, my_grads=my_grads)


class TestEvalForwardParity:
    @pytest.mark.parametrize("ref_key,my_key,atol", [
        ("rgb", "rgb", 1e-5),
        ("accumulation", "accumulation", 1e-5),
        ("expected_depth", "depth", 2e-3),
    ])
    def test_output(self, parity, ref_key, my_key, atol):
        mine = np.asarray(parity["my_eval"][my_key])
        theirs = t2n(parity["ref_eval"][ref_key])
        assert mine.shape == theirs.shape
        np.testing.assert_allclose(mine, theirs, atol=atol, rtol=1e-3, err_msg=ref_key)


class TestTrainLossParity:
    @pytest.mark.parametrize("key", ["rgb_loss", "interlevel_loss", "distortion_loss"])
    def test_loss(self, parity, key):
        rv = float(parity["ref_losses"][key])
        mv = float(parity["my_losses"][key])
        np.testing.assert_allclose(mv, rv, rtol=1e-4, atol=1e-7, err_msg=key)

    def test_psnr_metric(self, parity):
        np.testing.assert_allclose(
            float(parity["my_metrics"]["psnr"]), float(parity["ref_metrics"]["psnr"]), rtol=1e-4
        )


class TestGradParity:
    def test_gradients(self, parity):
        g = parity["my_grads"]
        m = parity["ref_model"]
        tp = lambda t: t.grad.numpy()
        def prop_sum(path):
            a = g["proposal_0"]
            b = g["proposal_1"]
            for k in path:
                a, b = a[k], b[k]
            return np.asarray(a) + np.asarray(b)

        pairs = [
            ("field.hash_table", g["field"]["grid"]["hash_table"],
             tp(m.field.mlp_base.model[0].hash_table).reshape(-1)),
            ("field.mlp_base.0", g["field"]["mlp_base"]["hidden_0"]["kernel"],
             tp(m.field.mlp_base.model[1].layers[0].weight).T),
            ("field.mlp_head.out", g["field"]["mlp_head"]["output"]["kernel"],
             tp(m.field.mlp_head.layers[2].weight).T),
            ("appearance", g["field"]["appearance"]["embedding"],
             tp(m.field.embedding_appearance.embedding.weight)),
            # dead-network bug: our two fields' grads sum to the ref's tied grad
            ("prop.table(sum)", prop_sum(("grid", "hash_table")),
             tp(m.proposal_networks[1].mlp_base[0].hash_table).reshape(-1)),
            ("prop.decoder.0(sum)", prop_sum(("decoder", "hidden_0", "kernel")),
             tp(m.proposal_networks[1].mlp_base[1].layers[0].weight).T),
        ]
        failures = []
        for name, mg, rg in pairs:
            mg = np.asarray(mg)
            dmax = np.abs(mg - rg).max()
            scale = max(np.abs(rg).max(), 1e-12)
            if dmax / scale > 1e-4:
                failures.append(f"{name}: maxabs={dmax:.3e} scale={scale:.3e} rel={dmax / scale:.3e}")
        assert not failures, "gradient mismatches:\n" + "\n".join(failures)

    def test_reference_dead_proposal_network(self, parity):
        """Documents the reference bug: the sampler's late-binding positions
        adapter routes BOTH rounds to proposal_networks[1], so network 0
        receives no gradient (ray_samplers.py:636)."""
        m = parity["ref_model"]
        assert m.proposal_networks[0].mlp_base[0].hash_table.grad is None
        assert m.proposal_networks[1].mlp_base[0].hash_table.grad is not None


def test_lidar_depth_losses_match_reference():
    """ds_nerf / urban-radiance-field depth losses (the LidarNerfacto
    supervision family) match the executed reference implementations
    (model_components/losses.py:227-293) on random weights/samples."""
    rlosses = ref("nerfstudio.model_components.losses")
    rrays = ref("nerfstudio.cameras.rays")
    from neuradar_tpu.model_components.losses import lidar_depth_loss
    from neuradar_tpu.cameras.rays import Frustums, RaySamples

    rng = np.random.RandomState(0)
    Rn, S = 16, 12
    starts = np.sort(rng.uniform(0.1, 30.0, (Rn, S, 1)), axis=1).astype(np.float32)
    ends = starts + rng.uniform(0.05, 0.5, (Rn, S, 1)).astype(np.float32)
    w = rng.dirichlet(np.ones(S), Rn).astype(np.float32)[..., None] * 0.9
    term = rng.uniform(0.5, 25.0, (Rn, 1)).astype(np.float32)
    term[3:5] = 0.0  # masked rays
    pred = rng.uniform(0.5, 25.0, (Rn, 1)).astype(np.float32)
    sigma = 0.21

    o = np.zeros((Rn, 3), np.float32)
    dirs = np.tile(np.asarray([[0.0, 0.0, 1.0]], np.float32), (Rn, 1))
    tf = torch.from_numpy
    rfr = rrays.Frustums(origins=tf(o)[:, None].expand(Rn, S, 3),
                         directions=tf(dirs)[:, None].expand(Rn, S, 3),
                         starts=tf(starts), ends=tf(ends),
                         pixel_area=torch.ones((Rn, S, 1)))
    rs_t = rrays.RaySamples(frustums=rfr, deltas=tf(ends - starts))

    myfr = Frustums(origins=jnp.asarray(o), directions=jnp.asarray(dirs),
                    starts=jnp.asarray(starts), ends=jnp.asarray(ends),
                    pixel_area=jnp.ones((Rn, 1)))
    rs_j = RaySamples(frustums=myfr, deltas=jnp.asarray(ends - starts))

    for ltype, rtype in (("dsnerf", rlosses.DepthLossType.DS_NERF),
                         ("urf", rlosses.DepthLossType.URF)):
        ref_val = float(rlosses.depth_loss(
            weights=tf(w), ray_samples=rs_t, termination_depth=tf(term),
            predicted_depth=tf(pred), sigma=torch.tensor([sigma]),
            directions_norm=torch.ones((Rn, 1)), is_euclidean=True,
            depth_loss_type=rtype,
        ))
        my_val = float(lidar_depth_loss(jnp.asarray(w), rs_j, jnp.asarray(term),
                                        jnp.asarray(pred), sigma, ltype))
        np.testing.assert_allclose(my_val, ref_val, rtol=1e-5, err_msg=ltype)
