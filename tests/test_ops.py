"""Unit tests for the op layer against straightforward NumPy oracles that
transcribe the reference formulas (attention.rs, groupnorm/mod.rs,
unet/mod.rs timestep_embedding, autoencoder nearest-upsample)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdtpu.ops import (
    causal_mask,
    conv2d,
    group_norm,
    layer_norm,
    qkv_attention,
    silu,
    quick_gelu,
    timestep_embedding,
)
from sdtpu.ops.conv import nearest_upsample_2x

RNG = np.random.default_rng(0)


def test_group_norm_matches_reference_formula():
    # Oracle: NCHW reshape [B, G, rest] exactly as groupnorm/mod.rs:61-72
    b, c, h, w, g, eps = 2, 8, 4, 4, 4, 1e-5
    x_nchw = RNG.standard_normal((b, c, h, w)).astype(np.float32)
    gamma = RNG.standard_normal(c).astype(np.float32)
    beta = RNG.standard_normal(c).astype(np.float32)

    xg = x_nchw.reshape(b, g, -1)
    u = xg - xg.mean(-1, keepdims=True)
    normed = u / np.sqrt((u * u).mean(-1, keepdims=True) + eps)
    want = normed.reshape(b, c, h, w) * gamma[None, :, None, None] + beta[None, :, None, None]

    x_nhwc = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))
    got = group_norm(x_nhwc, jnp.asarray(gamma), jnp.asarray(beta), n_group=g, eps=eps)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-5)


def test_layer_norm_biased_variance():
    x = RNG.standard_normal((3, 5, 16)).astype(np.float32)
    gamma = RNG.standard_normal(16).astype(np.float32)
    beta = RNG.standard_normal(16).astype(np.float32)
    eps = 1e-5
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)  # biased
    want = (x - mean) / np.sqrt(var + eps) * gamma + beta
    got = layer_norm(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta), eps)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def naive_attention(q, k, v, mask, n_head):
    """Direct transcription of attention.rs:5-44."""
    b, sq, d = q.shape
    sk = k.shape[1]
    dh = d // n_head
    scale = (d / n_head) ** -0.25
    qh = (q * scale).reshape(b, sq, n_head, dh).transpose(0, 2, 1, 3)
    kh = (k * scale).reshape(b, sk, n_head, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(b, sk, n_head, dh).transpose(0, 2, 1, 3)
    qk = qh @ kh.transpose(0, 1, 3, 2)
    if mask is not None:
        qk = qk + mask[None, None, :sq, :sk]
    e = np.exp(qk - qk.max(-1, keepdims=True))
    w = e / e.sum(-1, keepdims=True)
    o = w @ vh
    return o.transpose(0, 2, 1, 3).reshape(b, sq, d)


@pytest.mark.parametrize("n_head,sq,sk,d", [(1, 7, 7, 16), (4, 10, 6, 32), (8, 16, 16, 64)])
def test_qkv_attention_vs_naive(n_head, sq, sk, d):
    q = RNG.standard_normal((2, sq, d)).astype(np.float32)
    k = RNG.standard_normal((2, sk, d)).astype(np.float32)
    v = RNG.standard_normal((2, sk, d)).astype(np.float32)
    want = naive_attention(q, k, v, None, n_head)
    got = qkv_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), None, n_head)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_qkv_attention_causal():
    d, s, h = 32, 9, 4
    q = RNG.standard_normal((1, s, d)).astype(np.float32)
    mask_np = np.triu(np.full((s, s), -np.inf, dtype=np.float32), k=1)
    want = naive_attention(q, q, q, mask_np, h)
    got = qkv_attention(jnp.asarray(q), jnp.asarray(q), jnp.asarray(q),
                        causal_mask(s), h)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_key_padding_equals_unpadded():
    """The static-shape fast path (pad keys to 77 + key_valid mask) must
    reproduce the reference's unpadded variable-length cross-attention."""
    d, h, sq, sk, pad = 64, 8, 12, 9, 77
    q = RNG.standard_normal((2, sq, d)).astype(np.float32)
    k = RNG.standard_normal((2, sk, d)).astype(np.float32)
    v = RNG.standard_normal((2, sk, d)).astype(np.float32)

    want = qkv_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), None, h)

    k_pad = np.zeros((2, pad, d), np.float32)
    v_pad = np.zeros((2, pad, d), np.float32)
    k_pad[:, :sk], v_pad[:, :sk] = k, v
    valid = np.zeros((2, pad), bool)
    valid[:, :sk] = True
    got = qkv_attention(jnp.asarray(q), jnp.asarray(k_pad), jnp.asarray(v_pad),
                        None, h, key_valid=jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_timestep_embedding():
    # transcription of unet/mod.rs:19-30 (cos first, then sin)
    # f32 end-to-end, like the on-device reference computation: cos/sin of
    # large args (t * freqs ~ 1e3) are ulp-sensitive to the arg's precision
    t, dim, mp = 999, 320, 10000
    half = dim // 2
    freqs = np.exp(
        (np.arange(half, dtype=np.float32) * np.float32(-np.log(mp) / half))
    ).astype(np.float32)
    args = (np.float32(t) * freqs).astype(np.float32)
    want = np.concatenate([np.cos(args), np.sin(args)])[None].astype(np.float32)
    got = timestep_embedding(jnp.asarray([t]), dim, mp)
    # 1 ulp of exp() disagreement between libm and XLA scales by t=999 in
    # the phase, so ~1e-4 is the attainable cross-implementation agreement
    # (the libtorch reference differs from both by the same order).
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4)


def test_nearest_upsample():
    x = RNG.standard_normal((1, 3, 5, 2)).astype(np.float32)
    got = nearest_upsample_2x(jnp.asarray(x))
    want = x.repeat(2, axis=1).repeat(2, axis=2)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_conv2d_asymmetric_padding():
    """(0,1,0,1) pad + stride 2, the VAE encoder downsample
    (autoencoder/mod.rs:231) — oracle pads manually then runs VALID."""
    x = RNG.standard_normal((1, 8, 8, 3)).astype(np.float32)
    w = RNG.standard_normal((3, 3, 3, 5)).astype(np.float32)
    b = RNG.standard_normal(5).astype(np.float32)
    params = {"w": jnp.asarray(w), "b": jnp.asarray(b)}

    got = conv2d(params, jnp.asarray(x), stride=2, padding=((0, 1), (0, 1)))

    x_pad = np.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    want = conv2d(params, jnp.asarray(x_pad), stride=2, padding=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    assert got.shape == (1, 4, 4, 5)


def test_activations():
    x = np.linspace(-4, 4, 33, dtype=np.float32)
    np.testing.assert_allclose(
        np.asarray(silu(jnp.asarray(x))), x / (1 + np.exp(-x)), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(quick_gelu(jnp.asarray(x))), x / (1 + np.exp(-1.702 * x)), atol=1e-6)


def test_upsample2x_conv_equivalence():
    """4-phase subpixel fusion == nearest_upsample_2x + conv3x3."""
    from sdtpu.ops.conv import upsample2x_conv

    x = jnp.asarray(RNG.standard_normal((2, 6, 5, 8)), jnp.float32)
    w = jnp.asarray(RNG.standard_normal((3, 3, 8, 12)), jnp.float32)
    b = jnp.asarray(RNG.standard_normal(12), jnp.float32)
    params = {"w": w, "b": b}
    want = conv2d(params, nearest_upsample_2x(x), padding=1)
    got = upsample2x_conv(params, x)
    assert got.shape == (2, 12, 10, 12)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
