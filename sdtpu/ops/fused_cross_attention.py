"""Fused cross-attention sublayer Pallas TPU kernel.

One kernel computes x + proj_out(attention(q=LN(x), kv=context)) — the
`attn2` sublayer of the UNet SpatialTransformer (reference:
src/model/unet/mod.rs:522-527; variable-length context handling at
src/model/stablediffusion/mod.rs:198-211 is reproduced under static
shapes by an additive per-key bias row, exactly like the XLA key_valid
path in sdtpu.ops.attention).

Unlike the self-attention fusion (fused_transformer.py) the K/V source
is the tiny [B, 77, Dc] text context, so K^T/V^T are recomputed per
program (sub-1% FLOPs) and the grid is FULLY parallel — no sequential
prep step, no scratch persistence. LayerNorm is per-row and happens on
the q block only. Same transposed layouts as the self-attention kernel:
K/V as [C, Sk] so head slices are sublane-aligned, attention output
accumulated as [C, bq] so the out-projection is a plain matmul.

Oracle test: tests/test_fused_cross_attention.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _kernel(x_ref, ctx_ref, bias_ref, g_ref, b_ref, wq_ref, wk_ref, wv_ref,
            wo_ref, bo_ref, o_ref, ot_scr, *, scale, n_head, d_head, eps):
    x = x_ref[0].astype(jnp.float32)  # [bq, C]
    mu = jnp.mean(x, axis=1, keepdims=True)
    u = x - mu
    var = jnp.mean(u * u, axis=1, keepdims=True)
    xn = (u * jax.lax.rsqrt(var + eps)).astype(x_ref.dtype)
    xn = xn * g_ref[:] + b_ref[:]  # [bq, C]

    ctx = ctx_ref[0]  # [Skp, Dc]
    # K^T/V^T for ALL heads: [C, Skp]
    kt = jax.lax.dot_general(
        wk_ref[:], ctx, dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(ctx.dtype)
    vt = jax.lax.dot_general(
        wv_ref[:], ctx, dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(ctx.dtype)

    bias = bias_ref[0]  # [1, Skp] f32 (0 valid / -1e30 padded)
    for h in range(n_head):
        q_h = jax.lax.dot_general(
            xn, wq_ref[h], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(xn.dtype)  # [bq, dh]
        kt_h = kt[h * d_head:(h + 1) * d_head, :]
        s = jax.lax.dot_general(
            q_h, kt_h, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + bias
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        vt_h = vt[h * d_head:(h + 1) * d_head, :]
        ot_h = jax.lax.dot_general(
            vt_h, p.astype(vt_h.dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [dh, bq]
        ot_scr[pl.ds(h * d_head, d_head), :] = ot_h / l.T

    out = jax.lax.dot_general(
        ot_scr[:].astype(x_ref.dtype), wo_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [bq, C]
    o_ref[0] = (out + bo_ref[:] + x).astype(o_ref.dtype)


def _kernel_kv(x_ref, kt_ref, vt_ref, bias_ref, g_ref, b_ref, wq_ref,
               wo_ref, bo_ref, o_ref, ot_scr, *, scale, n_head, d_head, eps):
    """Same sublayer as _kernel but K^T/V^T are kernel INPUTS ([C, Skp],
    precomputed once per transformer by XLA). The r2 A/B showed the
    recompute variant losing to XLA end-to-end (BENCHLOG dead-end entry)
    precisely on the small-matmul K/V chain; this variant removes it."""
    x = x_ref[0].astype(jnp.float32)  # [bq, C]
    mu = jnp.mean(x, axis=1, keepdims=True)
    u = x - mu
    var = jnp.mean(u * u, axis=1, keepdims=True)
    xn = (u * jax.lax.rsqrt(var + eps)).astype(x_ref.dtype)
    xn = xn * g_ref[:] + b_ref[:]  # [bq, C]

    bias = bias_ref[0]  # [1, Skp] f32
    for h in range(n_head):
        q_h = jax.lax.dot_general(
            xn, wq_ref[h], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(xn.dtype)  # [bq, dh]
        kt_h = kt_ref[0, pl.ds(h * d_head, d_head), :]
        s = jax.lax.dot_general(
            q_h, kt_h, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + bias
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        vt_h = vt_ref[0, pl.ds(h * d_head, d_head), :]
        ot_h = jax.lax.dot_general(
            vt_h, p.astype(vt_h.dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [dh, bq]
        ot_scr[pl.ds(h * d_head, d_head), :] = ot_h / l.T

    out = jax.lax.dot_general(
        ot_scr[:].astype(x_ref.dtype), wo_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [bq, C]
    o_ref[0] = (out + bo_ref[:] + x).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("n_head", "eps", "block_q", "interpret")
)
def fused_cross_attention_kv(x, kt, vt, ln_g, ln_b, wq, wo, bo,
                             key_valid=None, n_head: int = 8,
                             eps: float = 1e-5, block_q: int = 512,
                             interpret: bool = False):
    """x: [B, S, C]; kt/vt: [B, C, Sk] — context keys/values already
    projected and TRANSPOSED (kt = (ctx @ wk).T per batch; einsum
    'bsd,dc->bcs'). Sk is zero-padded to a lane multiple here; key_valid
    marks real tokens of the ORIGINAL Sk. Returns x + out_proj(attn)."""
    b, s, c = x.shape
    sk = kt.shape[-1]
    d_head = c // n_head
    assert d_head * n_head == c and d_head % 8 == 0, (c, n_head)
    assert vt.shape == kt.shape == (b, c, sk), (kt.shape, vt.shape)
    scale = float(d_head) ** -0.5

    skp = -(-sk // 128) * 128
    dtype = x.dtype
    kt_p, vt_p = kt.astype(dtype), vt.astype(dtype)
    if skp != sk:
        kt_p = jnp.pad(kt_p, [(0, 0), (0, 0), (0, skp - sk)])
        vt_p = jnp.pad(vt_p, [(0, 0), (0, 0), (0, skp - sk)])
    if key_valid is None:
        bias = jnp.zeros((b, sk), jnp.float32)
    else:
        bias = jnp.where(key_valid, 0.0, _NEG_INF).astype(jnp.float32)
    if skp != sk:
        bias = jnp.pad(bias, [(0, 0), (0, skp - sk)], constant_values=_NEG_INF)

    bq = min(block_q, s)
    while s % bq:
        bq //= 2
    nq = s // bq

    wq_h = wq.reshape(c, n_head, d_head).transpose(1, 0, 2)  # [H, C, dh]

    out = pl.pallas_call(
        functools.partial(_kernel_kv, scale=scale, n_head=n_head,
                          d_head=d_head, eps=eps),
        grid=(b, nq),
        in_specs=[
            pl.BlockSpec((1, bq, c), lambda i, j: (i, j, 0)),    # x rows
            pl.BlockSpec((1, c, skp), lambda i, j: (i, 0, 0)),   # K^T
            pl.BlockSpec((1, c, skp), lambda i, j: (i, 0, 0)),   # V^T
            pl.BlockSpec((1, 1, skp), lambda i, j: (i, 0, 0)),   # key bias
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),           # ln gamma
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),           # ln beta
            pl.BlockSpec((n_head, c, d_head), lambda i, j: (0, 0, 0)),  # wq
            pl.BlockSpec((c, c), lambda i, j: (0, 0)),           # wo
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),           # out bias
        ],
        out_specs=pl.BlockSpec((1, bq, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, c), dtype),
        scratch_shapes=[pltpu.VMEM((c, bq), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s * skp * c * 2 + 2 * b * s * c * c * 2,
            bytes_accessed=2 * b * s * c * x.dtype.itemsize,
            transcendentals=b * s * skp,
        ),
        interpret=interpret,
    )(x, kt_p, vt_p, bias[:, None, :],
      ln_g.astype(dtype)[None, :], ln_b.astype(dtype)[None, :],
      wq_h.astype(dtype), wo.astype(dtype), bo.astype(jnp.float32)[None, :])
    return out


@functools.partial(
    jax.jit, static_argnames=("n_head", "eps", "block_q", "interpret")
)
def fused_cross_attention(x, context, ln_g, ln_b, wq, wk, wv, wo, bo,
                          key_valid=None, n_head: int = 8, eps: float = 1e-5,
                          block_q: int = 512, interpret: bool = False):
    """x: [B, S, C]; context: [B, Sk, Dc] -> x + out_proj(attn), one HBM
    round trip over x. key_valid: optional bool [B, Sk] marking real
    context tokens (padding gets -1e30 score bias, reproducing unpadded
    softmax exactly). wq: [C, C]; wk/wv: [Dc, C]; wo: [C, C]; bo: [C]."""
    b, s, c = x.shape
    _, sk, dc = context.shape
    d_head = c // n_head
    assert d_head * n_head == c and d_head % 8 == 0, (c, n_head)
    scale = float(d_head) ** -0.5

    skp = -(-sk // 128) * 128
    dtype = x.dtype
    ctx_p = context.astype(dtype)
    if skp != sk:
        ctx_p = jnp.pad(ctx_p, [(0, 0), (0, skp - sk), (0, 0)])
    if key_valid is None:
        bias = jnp.zeros((b, sk), jnp.float32)
    else:
        bias = jnp.where(key_valid, 0.0, _NEG_INF).astype(jnp.float32)
    if skp != sk:
        bias = jnp.pad(bias, [(0, 0), (0, skp - sk)], constant_values=_NEG_INF)

    bq = min(block_q, s)
    while s % bq:
        bq //= 2
    nq = s // bq

    wq_h = wq.reshape(c, n_head, d_head).transpose(1, 0, 2)  # [H, C, dh]

    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, n_head=n_head,
                          d_head=d_head, eps=eps),
        grid=(b, nq),
        in_specs=[
            pl.BlockSpec((1, bq, c), lambda i, j: (i, j, 0)),    # x rows
            pl.BlockSpec((1, skp, dc), lambda i, j: (i, 0, 0)),  # context
            pl.BlockSpec((1, 1, skp), lambda i, j: (i, 0, 0)),   # key bias
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),           # ln gamma
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),           # ln beta
            pl.BlockSpec((n_head, c, d_head), lambda i, j: (0, 0, 0)),  # wq
            pl.BlockSpec((dc, c), lambda i, j: (0, 0)),          # wk
            pl.BlockSpec((dc, c), lambda i, j: (0, 0)),          # wv
            pl.BlockSpec((c, c), lambda i, j: (0, 0)),           # wo
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),           # out bias
        ],
        out_specs=pl.BlockSpec((1, bq, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, c), dtype),
        scratch_shapes=[pltpu.VMEM((c, bq), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s * skp * c * 2 + 2 * b * s * c * c * 2
                  + 2 * b * skp * dc * c * 2 * nq,
            bytes_accessed=2 * b * s * c * x.dtype.itemsize,
            transcendentals=b * s * skp,
        ),
        interpret=interpret,
    )(x, ctx_p, bias[:, None, :],
      ln_g.astype(dtype)[None, :], ln_b.astype(dtype)[None, :],
      wq_h.astype(dtype), wk.astype(dtype), wv.astype(dtype),
      wo.astype(dtype), bo.astype(jnp.float32)[None, :])
    return out
