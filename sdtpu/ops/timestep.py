"""Sinusoidal timestep embedding (reference: src/model/unet/mod.rs:19-30).

freqs = exp(-ln(max_period) * arange(half) / half); args = t * freqs;
embedding = concat(cos(args), sin(args)) — cos FIRST (mod.rs:29).
"""

import jax.numpy as jnp


def timestep_embedding(timesteps, dim: int, max_period: int = 10000, dtype=jnp.float32):
    """timesteps: scalar or [B] int/float array -> [B, dim] (or [1, dim])."""
    t = jnp.asarray(timesteps, dtype=jnp.float32).reshape(-1)
    half = dim // 2
    freqs = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * (-jnp.log(float(max_period)) / half)
    )
    args = t[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    return emb.astype(dtype)
