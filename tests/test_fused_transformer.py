"""Oracle tests for the fused self-attention sublayer kernel: interpret
mode (CPU) against the unfused composition of the existing ops
(layer_norm -> q/k/v linear -> qkv_attention -> out linear -> residual),
which itself is oracle-tested against the reference math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.ops.attention import qkv_attention
from sdtpu.ops.conv import linear
from sdtpu.ops.fused_transformer import fused_self_attention
from sdtpu.ops.groupnorm import layer_norm


def _unfused(x, g, b, wq, wk, wv, wo, bo, n_head, eps=1e-5):
    xn = layer_norm(x, g, b, eps)
    q = linear({"w": wq}, xn)
    k = linear({"w": wk}, xn)
    v = linear({"w": wv}, xn)
    o = qkv_attention(q, k, v, None, n_head)
    return x + linear({"w": wo, "b": bo}, o)


def _make(key, b, s, c, dtype):
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (b, s, c), dtype)
    g = 1.0 + 0.1 * jax.random.normal(ks[1], (c,), dtype)
    bb = 0.1 * jax.random.normal(ks[2], (c,), dtype)
    scale = c ** -0.5
    wq = scale * jax.random.normal(ks[3], (c, c), dtype)
    wk = scale * jax.random.normal(ks[4], (c, c), dtype)
    wv = scale * jax.random.normal(ks[5], (c, c), dtype)
    wo = scale * jax.random.normal(ks[6], (c, c), dtype)
    bo = 0.1 * jax.random.normal(ks[7], (c,), dtype)
    return x, g, bb, wq, wk, wv, wo, bo


@pytest.mark.parametrize("b,s,c,n_head,block_q", [
    (2, 256, 64, 4, 128),   # multiple q blocks, dh=16
    (1, 128, 80, 2, 128),   # dh=40 (the SD head dim), single block
    (2, 64, 160, 2, 32),    # dh=80, tiny seq
])
def test_fused_matches_unfused_f32(b, s, c, n_head, block_q):
    x, g, bb, wq, wk, wv, wo, bo = _make(jax.random.PRNGKey(0), b, s, c,
                                         jnp.float32)
    want = _unfused(x, g, bb, wq, wk, wv, wo, bo, n_head)
    got = fused_self_attention(x, g, bb, wq, wk, wv, wo, bo, n_head,
                               block_q=block_q, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("b,s,c,n_head,block_q", [
    (2, 256, 64, 4, 128),   # multiple q blocks, dh=16
    (1, 128, 80, 2, 64),    # dh=40 (the SD head dim), two blocks
])
def test_fused_rolled_heads_matches_unfused(b, s, c, n_head, block_q):
    """The lax.fori_loop head path (dispatched at S > 4096 — the 1024px
    regime; BENCHLOG r4) against the same unfused oracle."""
    x, g, bb, wq, wk, wv, wo, bo = _make(jax.random.PRNGKey(2), b, s, c,
                                         jnp.float32)
    want = _unfused(x, g, bb, wq, wk, wv, wo, bo, n_head)
    got = fused_self_attention(x, g, bb, wq, wk, wv, wo, bo, n_head,
                               block_q=block_q, unroll_heads=False,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_matches_unfused_bf16():
    x, g, bb, wq, wk, wv, wo, bo = _make(jax.random.PRNGKey(1), 2, 128, 64,
                                         jnp.bfloat16)
    want = _unfused(x, g, bb, wq, wk, wv, wo, bo, 4).astype(jnp.float32)
    got = fused_self_attention(x, g, bb, wq, wk, wv, wo, bo, 4,
                               interpret=True).astype(jnp.float32)
    # bf16 end-to-end: allow a few ulp of divergence from fusion order
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.05, atol=0.05)
