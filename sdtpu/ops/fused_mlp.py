"""Fused GEGLU-MLP sublayer Pallas TPU kernel.

One kernel computes x + lin(geglu(split(proj(LayerNorm(x))))) — the MLP
sublayer of the UNet SpatialTransformer block (reference:
src/model/unet/mod.rs:522-527 structure, 566-592 GEGLU).

Why fused: the unfused path writes and re-reads the [B, S, 8C] GEGLU
projection (4x the activation size) plus the LayerNorm round trip — at
the SD 64^2 map (B=8, S=4096, C=320) that is ~0.5GB of HBM traffic per
block. Here every intermediate lives in VMEM; the kernel reads x once
and writes the sublayer output once. Unlike the attention fusion there
is no cross-row coupling (LayerNorm is per-row), so the grid tiles rows
with no sequential prep step.

Math parity: LayerNorm matches sdtpu.ops.groupnorm.layer_norm; GEGLU is
val * gelu_erf(gate) with the val/gate split at 4C (lane-aligned for all
SD widths). Oracle test: tests/test_fused_mlp.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational approximation (f32, max abs
    error 1.5e-7 — below bf16 resolution). Mosaic has no erf primitive;
    exp it does."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _kernel(x_ref, g_ref, b_ref, wp_ref, bp_ref, wl_ref, bl_ref, o_ref, *, eps):
    x = x_ref[0].astype(jnp.float32)  # [br, C]
    mu = jnp.mean(x, axis=1, keepdims=True)
    u = x - mu
    var = jnp.mean(u * u, axis=1, keepdims=True)
    xn = (u * jax.lax.rsqrt(var + eps)).astype(x_ref.dtype)
    xn = xn * g_ref[:] + b_ref[:]

    h = jax.lax.dot_general(
        xn, wp_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [br, 8C] f32
    h = h + bp_ref[:]
    d4 = h.shape[1] // 2
    val, gate = h[:, :d4], h[:, d4:]
    a = val * (0.5 * gate * (1.0 + _erf(gate * (2.0 ** -0.5))))
    out = jax.lax.dot_general(
        a.astype(x_ref.dtype), wl_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [br, C]
    o_ref[0] = (out + bl_ref[:] + x).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("eps", "block_rows", "interpret")
)
def fused_geglu_mlp(x, ln_g, ln_b, w_proj, b_proj, w_lin, b_lin,
                    eps: float = 1e-5, block_rows: int = 512,
                    interpret: bool = False):
    """x: [B, S, C] -> x + w_lin @ geglu(LN(x) @ w_proj), one HBM trip.

    w_proj: [C, 8C] (val | gate halves), b_proj: [8C]; w_lin: [4C, C],
    b_lin: [C]. Requires 4C % 128 == 0 for the aligned val/gate split
    (SD widths 320/640/1280 all qualify).
    """
    b, s, c = x.shape
    c8 = w_proj.shape[1]
    assert c8 == 8 * c and (c8 // 2) % 128 == 0, (c, c8)

    br = min(block_rows, s)
    while s % br:
        br //= 2
    nb = s // br

    dtype = x.dtype
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, br, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((c, c8), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c8), lambda i, j: (0, 0)),
            pl.BlockSpec((c8 // 2, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, br, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, c), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s * c * c8 + 2 * b * s * (c8 // 2) * c,
            bytes_accessed=2 * b * s * c * x.dtype.itemsize
                           + (c * c8 + c8 // 2 * c) * x.dtype.itemsize,
            transcendentals=b * s * (c8 // 2),
        ),
        interpret=interpret,
    )(x,
      ln_g.astype(dtype)[None, :], ln_b.astype(dtype)[None, :],
      w_proj.astype(dtype), b_proj.astype(jnp.float32)[None, :],
      w_lin.astype(dtype), b_lin.astype(jnp.float32)[None, :])
    return out
