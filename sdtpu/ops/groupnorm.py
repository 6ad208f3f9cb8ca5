"""Normalisation ops with the reference's exact formulas.

GroupNorm (reference: src/model/groupnorm/mod.rs:53-82): reshape to
[B, G, rest], subtract the per-group mean, divide by
sqrt(mean(u^2) + eps) — i.e. eps is added to E[u^2] *inside* the sqrt —
then apply the per-channel affine. LayerNorm matches burn's nn::LayerNorm
(biased variance, eps inside sqrt).

Activations here are NHWC (TPU-native); the group statistics are taken
over the same element sets as the reference's NCHW reshape, so results
are identical.
"""

import jax
import jax.numpy as jnp
from jax import lax


def group_norm(x, gamma, beta, n_group: int, eps: float = 1e-5):
    """GroupNorm over an NHWC tensor (channels last).

    x: [B, H, W, C] (or [B, ..., C]); gamma/beta: [C].
    """
    orig_shape = x.shape
    c = orig_shape[-1]
    assert c % n_group == 0, (c, n_group)
    b = orig_shape[0]
    # [B, spatial..., G, C/G] -> stats over (spatial..., C/G) per group
    xg = x.reshape(b, -1, n_group, c // n_group)
    xf = xg.astype(jnp.float32)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    u = xf - mean
    var = (u * u).mean(axis=(1, 3), keepdims=True)
    normed = u * lax.rsqrt(var + eps)
    normed = normed.reshape(orig_shape).astype(x.dtype)
    # affine in the activation dtype: f32 gamma/beta on a bf16 path would
    # promote the output (and everything downstream) back to f32
    return normed * gamma.astype(x.dtype) + beta.astype(x.dtype)


def group_norm_silu_op(x, gamma, beta, n_group: int, eps: float = 1e-5,
                       in_stats=None):
    """GroupNorm followed by SiLU — the pervasive pairing in ResBlocks
    (reference: unet/mod.rs:713-726, autoencoder/mod.rs:513-520).

    Dispatches to the fused 2-pass Pallas kernel for large feature maps
    on TPU (SDTPU_FUSED_GN=1; saves one full read of the map vs XLA's
    lowering), else the portable composition below. in_stats: optional
    [B, 2, C] per-channel (sum, sum^2) of x emitted by an upstream fused
    kernel (ops/fused_conv.py) — skips the statistics read entirely.
    """
    import os

    # Measured on v5e (BENCHLOG.md): the fused kernel cuts VAE decode 33%
    # (large spatial maps, >=128^2 rows) but is neutral-to-negative inside
    # the UNet (<=64^2 rows, where XLA's fusion already keeps the map in
    # cache-resident tiles). Default on for the big maps; SDTPU_FUSED_GN=0
    # disables, =all forces it everywhere.
    mode = os.environ.get("SDTPU_FUSED_GN", "1")
    if mode not in ("0", "", "false"):
        from sdtpu.ops.dispatch import use_pallas

        rows = x.size // x.shape[-1] // x.shape[0]
        big = rows >= (1 << 14) or mode == "all" or in_stats is not None
        if use_pallas() and big and x.shape[-1] % 128 == 0 and rows % 8 == 0:
            from sdtpu.ops.fused_groupnorm import group_norm_silu

            return group_norm_silu(x, gamma, beta, n_group, eps, silu=True,
                                   sums=in_stats)
    y = group_norm(x, gamma, beta, n_group, eps)
    return y * jax.nn.sigmoid(y)


def layer_norm(x, gamma, beta, eps: float = 1e-5):
    """LayerNorm over the last dim (burn nn::LayerNorm semantics:
    biased variance, eps inside sqrt)."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    u = xf - mean
    var = (u * u).mean(axis=-1, keepdims=True)
    normed = (u * lax.rsqrt(var + eps)).astype(x.dtype)
    return normed * gamma.astype(x.dtype) + beta.astype(x.dtype)
