"""Fused GroupNorm(+SiLU) Pallas kernel.

XLA's GroupNorm lowering makes ~3 reads + 1 write over the feature map
(mean pass, variance pass, normalize). This kernel does 2 reads + 1
write: one pass accumulating per-group (sum, sum-of-squares) partials,
a tiny host-side combine, and one normalize+SiLU pass with the affine
folded into a per-channel scale/bias. At the VAE decoder's 512x512x128
maps (268MB bf16) the traffic cut is the win; statistics are f32 and the
result matches sdtpu.ops.group_norm within fp tolerance (this kernel uses
the one-pass var = E[x^2] - E[x]^2 form, eps inside rsqrt; the XLA path
uses mean((x-mean)^2), so extreme-mean activations can differ in the last
bits from cancellation — tests/test_fused_groupnorm.py pins the bound).

Layout note: NHWC with 32 groups means channels-per-group < 128 lanes,
so per-group slicing is lane-hostile; instead each block is [rows, C]
and the group reshape happens in-register.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _stats_kernel(x_ref, out_ref):
    """Per-CHANNEL partial sums (lane-aligned; Mosaic can't reshape the
    lane dim to [G, cpg] for unaligned cpg — the tiny [C]->[G] group
    reduction happens outside the kernel)."""
    x = x_ref[0].astype(jnp.float32)  # [rows, C]
    s1 = jnp.sum(x, axis=0)  # [C]
    s2 = jnp.sum(x * x, axis=0)
    out_ref[0, 0] = jnp.stack([s1, s2])


def _norm_kernel(x_ref, scale_ref, bias_ref, o_ref, *, silu):
    x = x_ref[0].astype(jnp.float32)
    y = x * scale_ref[0] + bias_ref[0]
    if silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def channel_partials(x, block_rows: int = 1024, interpret: bool = False):
    """One Pallas pass over x: per-channel f32 (sum, sum-of-squares).

    x: [B, ..., C] -> [B, 2, C]. Shared by group_norm_silu and the fused
    conv prologue (ops/fused_conv.py), which folds these into GroupNorm
    scale/bias without re-reading the map.
    """
    b, c = x.shape[0], x.shape[-1]
    rows = x.size // (b * c)
    xr = x.reshape(b, rows, c)

    vmem_budget = 5 * 1024 * 1024
    br_cap = max(8, (vmem_budget // (16 * c)) // 8 * 8)
    br = min(block_rows, rows, br_cap)
    while rows % br:
        br //= 2
    if br < 8 and rows >= 8:
        xf = xr.astype(jnp.float32)
        return jnp.stack([xf.sum(axis=1), (xf * xf).sum(axis=1)], axis=1)
    nblk = rows // br

    partials = pl.pallas_call(
        _stats_kernel,
        grid=(b, nblk),
        in_specs=[pl.BlockSpec((1, br, c), lambda i, j: (i, j, 0))],
        out_specs=pl.BlockSpec((1, 1, 2, c), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nblk, 2, c), jnp.float32),
        interpret=interpret,
    )(xr)
    return partials.sum(axis=1)


@functools.partial(
    jax.jit, static_argnames=("n_group", "eps", "silu", "block_rows", "interpret")
)
def group_norm_silu(x, gamma, beta, n_group: int = 32, eps: float = 1e-5,
                    silu: bool = True, block_rows: int = 1024,
                    sums=None, interpret: bool = False):
    """x: [B, H, W, C] (or [B, rows, C]); returns silu(group_norm(x)).

    sums: optional precomputed [B, 2, C] per-channel (sum, sum^2) of x —
    skips the statistics pass (fed by ops/fused_conv.py emit_stats)."""
    orig_shape = x.shape
    b, c = orig_shape[0], orig_shape[-1]
    rows = 1
    for s in orig_shape[1:-1]:
        rows *= s
    xr = x.reshape(b, rows, c)

    # VMEM-aware row block: ~12-16 bytes/element live across the in block
    # (double-buffered), the f32 compute temp, and the out block
    vmem_budget = 5 * 1024 * 1024
    br_cap = max(8, (vmem_budget // (16 * c)) // 8 * 8)
    br = min(block_rows, rows, br_cap)
    # fall back row-block size to something that divides
    while rows % br:
        br //= 2
    if br < 8 and rows >= 8:
        # no viable tiling: do the straightforward fused math in jnp
        xf = xr.astype(jnp.float32).reshape(b, rows, n_group, c // n_group)
        mean = xf.mean(axis=(1, 3), keepdims=True)
        u = xf - mean
        var = (u * u).mean(axis=(1, 3), keepdims=True)
        y = (u * jax.lax.rsqrt(var + eps)).reshape(b, rows, c)
        y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
        if silu:
            y = y * jax.nn.sigmoid(y)
        return y.astype(x.dtype).reshape(orig_shape)
    nblk = rows // br

    from sdtpu.ops.fused_conv import stats_scale_bias

    if sums is None:
        sums = channel_partials(x, block_rows=block_rows, interpret=interpret)
    scale, bias = stats_scale_bias(sums, rows, gamma, beta, n_group, eps)

    out = pl.pallas_call(
        functools.partial(_norm_kernel, silu=silu),
        grid=(b, nblk),
        in_specs=[
            pl.BlockSpec((1, br, c), lambda i, j: (i, j, 0)),
            # unit sublane axis: Mosaic requires the 2nd-minor block dim
            # be 8-divisible or the full array dim
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, br, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, rows, c), x.dtype),
        interpret=interpret,
    )(xr, scale[:, None, :], bias[:, None, :])
    return out.reshape(orig_shape)
