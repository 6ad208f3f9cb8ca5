"""Noise schedules.

The reference initialises alphas_cumprod with an offset-cosine schedule
(reference: src/model/stablediffusion/mod.rs:216-237) which is dead weight
in practice — checkpoint loading overwrites it with the SD training
schedule. We provide both: the offset-cosine for API parity, and the
scaled-linear schedule SD v1 was actually trained with (the values stored
in sd-v1-4.ckpt's alphas_cumprod), so the framework can run standalone.
"""

import math

import jax.numpy as jnp
import numpy as np


def offset_cosine_schedule_cumprod(n_steps: int, dtype=jnp.float32):
    """reference: stablediffusion/mod.rs:223-237 (cos^2 of interpolated
    angles between acos(0.95) and acos(0.02), times = 1..=n)."""
    min_signal_rate = 0.02
    max_signal_rate = 0.95
    start_angle = math.acos(max_signal_rate)
    end_angle = math.acos(min_signal_rate)
    times = np.arange(1, n_steps + 1, dtype=np.float32)
    angles = times * ((end_angle - start_angle) / n_steps) + start_angle
    # numpy, not jnp: schedules are host constants — a bare jnp call
    # outside jit is a (remote) XLA compile for 1000 floats
    return (np.cos(angles) ** 2).astype(np.dtype(dtype))


def scaled_linear_alphas_cumprod(
    n_steps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    dtype=jnp.float32,
):
    """The LDM 'scaled linear' schedule: betas = linspace(sqrt(b0),
    sqrt(b1), N)^2 — reproduces the alphas_cumprod table shipped inside
    sd-v1-x checkpoints."""
    betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5, n_steps, dtype=np.float32) ** 2
    return np.cumprod(1.0 - betas).astype(np.dtype(dtype))
