"""Oracle tests for the fused cross-attention sublayer kernel (interpret
mode, CPU) against the unfused op composition used by
sdtpu/models/unet.py, including the key-padding mask path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.ops.attention import qkv_attention
from sdtpu.ops.conv import linear
from sdtpu.ops.fused_cross_attention import (
    fused_cross_attention,
    fused_cross_attention_kv,
)
from sdtpu.ops.groupnorm import layer_norm


def _unfused(x, ctx, g, b, wq, wk, wv, wo, bo, n_head, key_valid=None,
             eps=1e-5):
    xn = layer_norm(x, g, b, eps)
    q = linear({"w": wq}, xn)
    k = linear({"w": wk}, ctx)
    v = linear({"w": wv}, ctx)
    o = qkv_attention(q, k, v, None, n_head, key_valid=key_valid)
    return x + linear({"w": wo, "b": bo}, o)


def _make(key, b, s, c, sk, dc, dtype):
    ks = jax.random.split(key, 9)
    x = jax.random.normal(ks[0], (b, s, c), dtype)
    ctx = jax.random.normal(ks[1], (b, sk, dc), dtype)
    g = 1.0 + 0.1 * jax.random.normal(ks[2], (c,), dtype)
    bb = 0.1 * jax.random.normal(ks[3], (c,), dtype)
    wq = c ** -0.5 * jax.random.normal(ks[4], (c, c), dtype)
    wk = dc ** -0.5 * jax.random.normal(ks[5], (dc, c), dtype)
    wv = dc ** -0.5 * jax.random.normal(ks[6], (dc, c), dtype)
    wo = c ** -0.5 * jax.random.normal(ks[7], (c, c), dtype)
    bo = 0.1 * jax.random.normal(ks[8], (c,), dtype)
    return x, ctx, g, bb, wq, wk, wv, wo, bo


@pytest.mark.parametrize("b,s,c,sk,dc,n_head,block_q", [
    (2, 256, 64, 77, 48, 4, 128),  # 77-key (pads to 128), multi-block
    (1, 128, 80, 32, 96, 2, 128),  # dh=40, aligned sk
])
def test_fused_cross_matches_unfused_f32(b, s, c, sk, dc, n_head, block_q):
    x, ctx, g, bb, wq, wk, wv, wo, bo = _make(
        jax.random.PRNGKey(0), b, s, c, sk, dc, jnp.float32)
    want = _unfused(x, ctx, g, bb, wq, wk, wv, wo, bo, n_head)
    got = fused_cross_attention(x, ctx, g, bb, wq, wk, wv, wo, bo,
                                n_head=n_head, block_q=block_q,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_cross_key_valid_mask():
    """Padded context keys must get exactly zero attention weight."""
    b, s, c, sk, dc, n_head = 2, 128, 64, 77, 48, 4
    x, ctx, g, bb, wq, wk, wv, wo, bo = _make(
        jax.random.PRNGKey(1), b, s, c, sk, dc, jnp.float32)
    n_valid = 11
    valid = jnp.arange(sk)[None, :] < n_valid
    valid = jnp.broadcast_to(valid, (b, sk))
    got = fused_cross_attention(x, ctx, g, bb, wq, wk, wv, wo, bo,
                                key_valid=valid, n_head=n_head,
                                interpret=True)
    # oracle: slice the context to the valid prefix (true variable-length)
    want = _unfused(x, ctx[:, :n_valid], g, bb, wq, wk, wv, wo, bo, n_head)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("b,s,c,sk,dc,n_head,block_q", [
    (2, 256, 64, 77, 48, 4, 128),  # 77-key (pads to 128), multi-block
    (1, 128, 80, 32, 96, 2, 128),  # dh=40, aligned sk
])
def test_precomputed_kv_variant(b, s, c, sk, dc, n_head, block_q):
    """fused_cross_attention_kv (K/V projected+transposed outside) ==
    the unfused composition, incl. a padding mask."""
    x, ctx, g, bb, wq, wk, wv, wo, bo = _make(
        jax.random.PRNGKey(2), b, s, c, sk, dc, jnp.float32)
    valid = jnp.arange(sk)[None, :] < (sk - 5)
    valid = jnp.broadcast_to(valid, (b, sk))
    kt = jnp.einsum("bsd,dc->bcs", ctx, wk)
    vt = jnp.einsum("bsd,dc->bcs", ctx, wv)
    got = fused_cross_attention_kv(x, kt, vt, g, bb, wq, wo, bo,
                                   key_valid=valid, n_head=n_head,
                                   block_q=block_q, interpret=True)
    want = _unfused(x, ctx[:, :sk - 5], g, bb, wq, wk, wv, wo, bo, n_head)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
