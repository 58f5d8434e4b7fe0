"""Fused radar attention kernel (ops/attention.py): parity + VJP, interpret
mode on CPU (the same kernel compiles for TPU via Mosaic)."""

import jax
import jax.numpy as jnp
import numpy as np

from neuradar_tpu.ops.attention import fused_self_attention, reference_attention


def _qkv(b=3, s=200, d=48, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return tuple(jax.random.normal(k, (b, s, d), jnp.float32) for k in ks)


def test_forward_parity_unaligned_seq():
    """S=200 is not a lane multiple: padding + key masking must be exact."""
    q, k, v = _qkv()
    got = fused_self_attention(q, k, v, 0, 0.0, None, True)
    want = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_forward_parity_multiblock():
    """S spanning several query blocks (and an uneven last block)."""
    q, k, v = _qkv(b=2, s=600, d=32, seed=1)
    got = fused_self_attention(q, k, v, 0, 0.0, None, True)
    want = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_gradients_match_reference():
    q, k, v = _qkv(b=2, s=300, d=48, seed=2)
    cot = jax.random.normal(jax.random.PRNGKey(9), q.shape, jnp.float32)

    def loss_fused(q, k, v):
        return jnp.sum(fused_self_attention(q, k, v, 0, 0.0, None, True) * cot)

    def loss_ref(q, k, v):
        return jnp.sum(reference_attention(q, k, v) * cot)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5,
                                   err_msg=name)


def test_bf16_inputs():
    q, k, v = (x.astype(jnp.bfloat16) for x in _qkv(b=2, s=256, d=48, seed=3))
    got = fused_self_attention(q, k, v, 0, 0.0, None, True)
    assert got.dtype == jnp.bfloat16
    want = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_dropout_deterministic_per_seed():
    q, k, v = _qkv(b=2, s=256, d=48, seed=4)
    a = fused_self_attention(q, k, v, 7, 0.2, None, True)
    b = fused_self_attention(q, k, v, 7, 0.2, None, True)
    c = fused_self_attention(q, k, v, 8, 0.2, None, True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))
    # unbiased in expectation: mean over many seeds approaches no-dropout
    outs = np.stack([np.asarray(fused_self_attention(q, k, v, s, 0.2, None, True))
                     for s in range(24)])
    base = np.asarray(fused_self_attention(q, k, v, 0, 0.0, None, True))
    np.testing.assert_allclose(outs.mean(0), base, rtol=0.2, atol=0.08)


def test_dropout_gradients_finite_and_masked():
    q, k, v = _qkv(b=1, s=200, d=32, seed=5)
    g = jax.grad(lambda q: jnp.sum(fused_self_attention(q, k, v, 3, 0.3, None, True) ** 2))(q)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_encoder_layer_param_compatible_parity():
    """The fused layer consumes flax-MHA parameter trees unchanged: init the
    flax impl, apply the pallas impl with the SAME variables, outputs match."""
    from neuradar_tpu.model_components.radar_decoder import TransformerEncoderLayer

    src = jax.random.normal(jax.random.PRNGKey(0), (2, 200, 48), jnp.float32)
    pos = jax.random.normal(jax.random.PRNGKey(1), (2, 200, 48), jnp.float32)
    flax_layer = TransformerEncoderLayer(attn_impl="flax")
    pallas_layer = TransformerEncoderLayer(attn_impl="pallas_interpret")
    variables = flax_layer.init(jax.random.PRNGKey(2), src, pos)
    a = flax_layer.apply(variables, src, pos)
    b = pallas_layer.apply(variables, src, pos)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-5)

    # gradient parity through the whole layer (deterministic)
    def loss(params, layer):
        return jnp.sum(layer.apply({"params": params}, src, pos) ** 2)

    ga = jax.grad(loss)(variables["params"], flax_layer)
    gb = jax.grad(loss)(variables["params"], pallas_layer)
    flat_a = jax.tree_util.tree_leaves_with_path(ga)
    flat_b = jax.tree_util.tree_leaves_with_path(gb)
    for (pa, la), (pb, lb) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-3, atol=1e-4,
                                   err_msg=jax.tree_util.keystr(pa))


def test_radar_decoder_pallas_train_mode():
    """Full RadarDecoder with the fused path in train mode (dropout active):
    finite outputs/grads, and a different dropout rng gives different output."""
    from neuradar_tpu.model_components.radar_decoder import RadarDecoder

    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 160, 48), jnp.float32)
    geom = jax.random.normal(jax.random.PRNGKey(1), (2, 160, 3), jnp.float32) * 10
    dec = RadarDecoder(d_model=48, attn_impl="pallas_interpret")
    variables = dec.init(jax.random.PRNGKey(2), feats, geom)

    def loss(params, droprng):
        out, _ = dec.apply({"params": params}, feats, geom, True,
                           rngs={"dropout": droprng})
        return jnp.sum(out ** 2)

    l1 = float(loss(variables["params"], jax.random.PRNGKey(3)))
    l2 = float(loss(variables["params"], jax.random.PRNGKey(4)))
    assert np.isfinite(l1) and np.isfinite(l2) and l1 != l2
    g = jax.grad(loss)(variables["params"], jax.random.PRNGKey(3))
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(g))
