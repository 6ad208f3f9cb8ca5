"""DDIM sampler pieces (reference: src/model/stablediffusion/mod.rs:102-160).

The reference loops on the host, syncing alphas to the CPU twice per step
(mod.rs:124-140). Here the per-step (t, alpha_t, alpha_prev) triples are
precomputed as device arrays and the whole loop runs as one
`jax.lax.scan` under jit — see sdtpu/pipeline.py.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def ddim_schedule(n_train_steps: int, n_steps: int) -> Tuple[list, int]:
    """Descending timesteps exactly like the reference: step_size =
    n_train // n, t = n_train-1, n_train-1-step, ... (mod.rs:111,123)."""
    step_size = n_train_steps // n_steps
    ts = list(range(n_train_steps - 1, -1, -step_size))
    return ts, step_size


def ddim_alphas(alphas_cumprod, timesteps, step_size: int):
    """Gather (alpha_t, alpha_prev) per step on-device.

    alpha_prev = alphas_cumprod[t - step] for t >= step, else 1.0
    (mod.rs:131-140)."""
    ts = jnp.asarray(timesteps, jnp.int32)
    a_t = alphas_cumprod[ts]
    prev_idx = ts - step_size
    a_prev = jnp.where(prev_idx >= 0, alphas_cumprod[jnp.maximum(prev_idx, 0)], 1.0)
    return a_t, a_prev


def ddim_step(latent, eps, alpha_t, alpha_prev, sigma: float = 0.0, noise=None):
    """One deterministic DDIM update (sigma=0, mod.rs:119,142-156):

    predx0 = (latent - eps*sqrt(1-a_t)) / sqrt(a_t)
    dir    = eps * sqrt(1 - a_prev - sigma^2)
    next   = predx0*sqrt(a_prev) + dir (+ sigma*noise)
    """
    sqrt_noise = jnp.sqrt(1.0 - alpha_t)
    predx0 = (latent - eps * sqrt_noise) / jnp.sqrt(alpha_t)
    dir_latent = eps * jnp.sqrt(1.0 - alpha_prev - sigma * sigma)
    out = predx0 * jnp.sqrt(alpha_prev) + dir_latent
    if sigma > 0.0 and noise is not None:
        out = out + noise * sigma
    return out
