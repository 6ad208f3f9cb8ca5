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
    return normed * gamma + beta


def layer_norm(x, gamma, beta, eps: float = 1e-5):
    """LayerNorm over the last dim (burn nn::LayerNorm semantics:
    biased variance, eps inside sqrt)."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    u = xf - mean
    var = (u * u).mean(axis=-1, keepdims=True)
    normed = (u * lax.rsqrt(var + eps)).astype(x.dtype)
    return normed * gamma + beta
