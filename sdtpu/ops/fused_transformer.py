"""Fused self-attention sublayer Pallas TPU kernel.

One kernel computes x + proj_out(attention(qkv_proj(LayerNorm(x)))) — the
whole `attn1` sublayer of the UNet SpatialTransformer (reference:
src/model/unet/mod.rs:522-527 block structure, 642-652 projections,
src/model/attention.rs:5-44 attention math).

Why fused: the unfused path materialises ~8 HBM round-trips of the
[B, S, C] activation per sublayer (LayerNorm, 3 projection outputs, the
[B,S,H,dh]->[BH,S,dh] split transposes, the 40->128 lane pad copies, the
merge transpose, the out-projection). At the dominant SD shape
(B=8, S=4096, C=320) that is ~0.8GB of pure layout traffic per
transformer. This kernel reads x once and writes the sublayer output
once; everything else lives in VMEM.

Key layout trick: K and V are stored TRANSPOSED in VMEM ([C, S]), so the
per-head slice is a 40-row SUBLANE slice (8-granular, free) instead of an
unaligned 40-lane slice; attention output is likewise accumulated
transposed ([C, bq]) per the transposed-output trick (see
flash_attention._fullk_ot_body), making the final out-projection a
standard sublane-contraction matmul.

Math parity: scores scale d_head^-0.5 == the reference's dual
(d_head)^-0.25 on q and k; softmax statistics f32; LayerNorm matches
sdtpu.ops.groupnorm.layer_norm (biased var, eps inside rsqrt, affine in
the activation dtype). Oracle test: tests/test_fused_transformer.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, g_ref, b_ref, wq_ref, wk_ref, wv_ref, wo_ref, bo_ref,
            o_ref, xn_scr, kt_scr, vt_scr, ot_scr, *,
            scale, bq, n_head, d_head, eps, unroll_heads):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _prep():
        # LayerNorm the full sequence once per batch element
        x = x_ref[0].astype(jnp.float32)  # [S, C]
        mu = jnp.mean(x, axis=1, keepdims=True)
        u = x - mu
        var = jnp.mean(u * u, axis=1, keepdims=True)
        xn = (u * jax.lax.rsqrt(var + eps)).astype(x_ref.dtype)
        xn = xn * g_ref[:] + b_ref[:]
        xn_scr[:] = xn
        # K/V for ALL heads, stored transposed: [C, S]
        kt_scr[:] = jax.lax.dot_general(
            wk_ref[:], xn, dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(kt_scr.dtype)
        vt_scr[:] = jax.lax.dot_general(
            wv_ref[:], xn, dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(vt_scr.dtype)

    xq = xn_scr[pl.ds(j * bq, bq), :]  # [bq, C] (normed)

    def _head(h, carry):
        w_h = wq_ref[h]  # [C, d_head]
        q_h = jax.lax.dot_general(
            xq, w_h, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(xq.dtype)  # [bq, dh]
        kt_h = kt_scr[pl.ds(h * d_head, d_head), :]  # [dh, S]
        s = jax.lax.dot_general(
            q_h, kt_h, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [bq, S]
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        vt_h = vt_scr[pl.ds(h * d_head, d_head), :]  # [dh, S]
        ot_h = jax.lax.dot_general(
            vt_h, p.astype(vt_h.dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [dh, bq]
        ot_scr[pl.ds(h * d_head, d_head), :] = ot_h / l.T
        return carry

    if unroll_heads:
        # unrolled: Mosaic software-pipelines across heads — measured
        # best at S <= 4096 (3.67 vs 3.94ms at S=4096 B8, BENCHLOG r4)
        for h in range(n_head):
            _head(h, 0)
    else:
        # rolled: 8x smaller program; at S=16384 the unrolled form is
        # both slower (34.8 vs 26.8ms, BENCHLOG r4) and the reason
        # bq>128 used to tip the remote Mosaic compiler over
        jax.lax.fori_loop(0, n_head, _head, 0)

    # merged out-projection (sublane contraction over C) + bias + residual
    out = jax.lax.dot_general(
        ot_scr[:].astype(x_ref.dtype), wo_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [bq, C]
    xres = x_ref[0, pl.ds(j * bq, bq), :].astype(jnp.float32)
    o_ref[0] = (out + bo_ref[:] + xres).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("n_head", "eps", "block_q", "unroll_heads",
                              "interpret")
)
def fused_self_attention(x, ln_g, ln_b, wq, wk, wv, wo, bo,
                         n_head: int, eps: float = 1e-5,
                         block_q: int = 0, unroll_heads: bool | None = None,
                         interpret: bool = False):
    """x: [B, S, C] -> x + out_proj(attn(LN(x))), one HBM round trip.

    wq/wk/wv: [C, C] (no bias, matching unet/mod.rs:642-652); wo: [C, C];
    bo: [C]. Requires C % n_head == 0 and d_head % 8 == 0 (sublane
    granule; SD v1: 40/80/160). block_q=0 picks the measured-best block
    (256 at S in [2048, 4096], 128 below AND above —
    benchmarks/fused_attn_micro.py + longctx_micro.py; larger blocks
    pipeline WORSE here because the j==0 prep step serialises).

    unroll_heads (default: S <= 4096): unrolled head loop at small S
    (Mosaic pipelines across heads), lax.fori_loop above — at S=16384
    the rolled form is 26.8 vs 34.8ms (B4 C320, interleaved min-of-N,
    BENCHLOG r4; the 8x-smaller program is also what stops bq>=256
    tipping the remote Mosaic compiler over at 16K).
    """
    b, s, c = x.shape
    d_head = c // n_head
    assert d_head * n_head == c and d_head % 8 == 0, (c, n_head)
    scale = float(d_head) ** -0.5

    if unroll_heads is None:
        unroll_heads = s <= 4096
    if not block_q:
        block_q = 256 if 2048 <= s <= 4096 else 128
    bq = min(block_q, s)
    while s % bq:
        bq //= 2
    nq = s // bq

    wq_h = wq.reshape(c, n_head, d_head).transpose(1, 0, 2)  # [H, C, dh]

    dtype = x.dtype
    grid = (b, nq)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, bq=bq, n_head=n_head,
                          d_head=d_head, eps=eps,
                          unroll_heads=unroll_heads),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, s, c), lambda i, j: (i, 0, 0)),   # x (full seq)
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),         # ln gamma
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),         # ln beta
            pl.BlockSpec((n_head, c, d_head), lambda i, j: (0, 0, 0)),  # wq
            pl.BlockSpec((c, c), lambda i, j: (0, 0)),         # wk
            pl.BlockSpec((c, c), lambda i, j: (0, 0)),         # wv
            pl.BlockSpec((c, c), lambda i, j: (0, 0)),         # wo
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),         # out bias
        ],
        out_specs=pl.BlockSpec((1, bq, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, c), dtype),
        scratch_shapes=[
            pltpu.VMEM((s, c), dtype),         # LN(x)
            pltpu.VMEM((c, s), dtype),         # K^T (all heads)
            pltpu.VMEM((c, s), dtype),         # V^T (all heads)
            pltpu.VMEM((c, bq), jnp.float32),  # attn out^T (all heads)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s * s * c * 2        # scores + p@v
                  + 2 * b * s * c * c * 4,     # q,k,v,o projections
            bytes_accessed=2 * b * s * c * x.dtype.itemsize,
            transcendentals=b * s * s,
        ),
        interpret=interpret,
    )(x,
      ln_g.astype(dtype)[None, :], ln_b.astype(dtype)[None, :],
      wq_h.astype(dtype), wk.astype(dtype), wv.astype(dtype),
      wo.astype(dtype), bo.astype(jnp.float32)[None, :])
    return out
