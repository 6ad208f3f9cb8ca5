"""Flash-attention kernel vs the XLA reference path (interpret mode on
CPU; the same kernel compiles via Mosaic on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdtpu.ops.attention import qkv_attention
from sdtpu.ops.flash_attention import flash_qkv_attention

RNG = np.random.default_rng(0)


@pytest.mark.parametrize(
    "b,s,n_state,n_head",
    [
        (2, 256, 320, 8),   # UNet 16x16 level (d_head 40)
        (1, 512, 512, 1),   # VAE-style single head
        (2, 64, 1280, 8),   # UNet 8x8 level (d_head 160)
    ],
)
def test_flash_matches_reference(b, s, n_state, n_head):
    q = jnp.asarray(RNG.standard_normal((b, s, n_state)), jnp.float32)
    k = jnp.asarray(RNG.standard_normal((b, s, n_state)), jnp.float32)
    v = jnp.asarray(RNG.standard_normal((b, s, n_state)), jnp.float32)

    want = qkv_attention(q, k, v, None, n_head)
    got = flash_qkv_attention(q, k, v, n_head, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_cross_shapes():
    # q len != kv len (self-attn only needs square, but keep it general)
    q = jnp.asarray(RNG.standard_normal((1, 256, 320)), jnp.float32)
    k = jnp.asarray(RNG.standard_normal((1, 128, 320)), jnp.float32)
    v = jnp.asarray(RNG.standard_normal((1, 128, 320)), jnp.float32)
    want = qkv_attention(q, k, v, None, 8)
    got = flash_qkv_attention(q, k, v, 8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_bf16():
    q = jnp.asarray(RNG.standard_normal((1, 256, 320)), jnp.bfloat16)
    want = qkv_attention(q, q, q, None, 8)
    got = flash_qkv_attention(q, q, q, 8, interpret=True)
    # 1-2 bf16 ulps at |x|~4 (0.03125 each): the two paths round the
    # softmax weights at different points
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=7e-2)


@pytest.mark.parametrize("single_k", [False, None])
def test_flash_online_multiblock_d40(single_k):
    """Long-context (1024px-class) shape: s=8192 forces the full-K
    estimate past its VMEM budget, so this exercises the ONLINE kernel —
    for d_head=40 that is the transposed _flash_ot_kernel ([dv, bq]
    accumulator). single_k=False pins the PIPELINED multi-k-block path
    (j > 0 online rescale); None takes the production single-k-block
    dispatch."""
    from sdtpu.ops.flash_attention import flash_attention_heads

    b, s, n_state, n_head = 1, 8192, 40, 1
    q = jnp.asarray(RNG.standard_normal((b, s, n_state)), jnp.float32)
    k = jnp.asarray(RNG.standard_normal((b, s, n_state)), jnp.float32)
    v = jnp.asarray(RNG.standard_normal((b, s, n_state)), jnp.float32)
    # on CPU use_pallas() is False, so qkv_attention is the XLA oracle
    want = qkv_attention(q, k, v, None, n_head)
    got = flash_attention_heads(q, k, v, n_head=n_head, single_k=single_k,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_cross_attention_key_bias():
    """Full-K kernel with key-padding bias == unpadded XLA attention
    (the cross-attention fast path, kv padded 77 -> 128)."""
    b, h, sq, sk, d = 2, 8, 2048, 77, 320
    q = jnp.asarray(RNG.standard_normal((b, sq, d)), jnp.float32)
    k = jnp.asarray(RNG.standard_normal((b, sk, d)), jnp.float32)
    v = jnp.asarray(RNG.standard_normal((b, sk, d)), jnp.float32)

    want = qkv_attention(q, k, v, None, h)  # XLA path (sk too small alone)

    # right-pad keys (77 -> 96, further padded to 128 inside the kernel)
    # and mark only the first sk as valid
    k_pad = jnp.concatenate([k, jnp.zeros((b, 19, d), k.dtype)], axis=1)
    v_pad = jnp.concatenate([v, jnp.zeros((b, 19, d), v.dtype)], axis=1)
    valid = jnp.zeros((b, sk + 19), bool).at[:, :sk].set(True)

    got = flash_qkv_attention(q, k_pad, v_pad, h, key_valid=valid, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_custom_vjp_grads_match_xla():
    """flash_qkv_attention_diff: Pallas forward (interpret here) must be
    differentiable, and its custom-VJP gradients must match autodiff of
    the plain XLA attention to fp tolerance."""
    from sdtpu.ops.flash_attention import (_xla_attention_twin,
                                           flash_qkv_attention_diff)

    k0, k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 4)
    b, s, c, h = 1, 256, 64, 2
    q = jax.random.normal(k0, (b, s, c), jnp.float32)
    k = jax.random.normal(k1, (b, s, c), jnp.float32)
    v = jax.random.normal(k2, (b, s, c), jnp.float32)
    g = jax.random.normal(k3, (b, s, c), jnp.float32)

    def loss_pallas(q, k, v):
        return jnp.sum(flash_qkv_attention_diff(q, k, v, h, True) * g)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention_twin(q, k, v, h) * g)

    lp, gp = jax.value_and_grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    lx, gx = jax.value_and_grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lx),
                               rtol=2e-4, atol=2e-4)
    for a, b_ in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("s,c,h,dtype", [
    (1024, 80, 2, jnp.float32),   # nq=2: dK/dV scratch accumulation
    (512, 64, 1, jnp.bfloat16),   # low-precision path
    (256, 80, 2, jnp.float32),    # d_head=40 lane padding (SD shape)
])
def test_fullk_bwd_kernel_grads(s, c, h, dtype):
    """flash_attention_bwd_heads == autodiff of the XLA twin across
    block-accumulation, head-dim padding, and bf16."""
    from sdtpu.ops.flash_attention import (_xla_attention_twin,
                                           flash_attention_bwd_heads)

    k0, k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 4)
    b = 1
    q = jax.random.normal(k0, (b, s, c), dtype)
    k = jax.random.normal(k1, (b, s, c), dtype)
    v = jax.random.normal(k2, (b, s, c), dtype)
    g = jax.random.normal(k3, (b, s, c), dtype)
    dh = c // h

    def split(x):
        return (x.reshape(b, s, h, dh).transpose(0, 2, 1, 3)
                .reshape(b * h, s, dh))

    dqh, dkh, dvh = flash_attention_bwd_heads(
        split(q), split(k), split(v), split(g), interpret=True)

    def merge(x):
        return (x.reshape(b, h, s, dh).transpose(0, 2, 1, 3)
                .reshape(b, s, c))

    _, vjp = jax.vjp(
        lambda q_, k_, v_: _xla_attention_twin(q_, k_, v_, h), q, k, v)
    want = vjp(g)
    tol = dict(rtol=3e-2, atol=3e-2) if dtype == jnp.bfloat16 else \
        dict(rtol=3e-4, atol=3e-4)
    for got, exp in zip((merge(dqh), merge(dkh), merge(dvh)), want):
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(exp, np.float32), **tol)
