"""Karras-family ODE samplers: Euler, Euler-ancestral, Heun.

The reference ships DDIM only (src/model/stablediffusion/mod.rs:102-160);
these are the standard k-diffusion/EDM discretizations (Karras et al.
2022, arXiv:2206.00364) of the SAME probability-flow ODE, in the
variance-exploding (sigma) parameterization used by k-diffusion and
diffusers' Euler/Heun schedulers:

    sigma_t = sqrt((1 - abar_t) / abar_t)        (VP -> VE change of var)
    x_VE    = x_VP * sqrt(1 + sigma_t^2)         (so x_VE = x0 at sigma=0)
    dx/dsigma = eps(x_VE / sqrt(1 + sigma^2), t) ( = the VP-trained UNet)

Euler integrates straight line segments between the discrete sigmas;
Heun adds a 2nd-order correction (two model calls per step, Euler on the
final step to sigma=0); Euler-ancestral splits each step into a
deterministic part (to sigma_down) plus fresh noise (sigma_up), matching
k-diffusion's `get_ancestral_step` variance split:

    sigma_up^2   = sigma_next^2 * (sigma^2 - sigma_next^2) / sigma^2
    sigma_down^2 = sigma_next^2 - sigma_up^2

Everything here is pure jnp on f32 arrays, shaped for `lax.scan` over the
step axis (pipeline.py drives it with the shared batched-CFG denoiser).
Timesteps reuse the DDIM leading-uniform schedule (schedule.py) so all
samplers in sdtpu discretize the same time grid.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from sdtpu.diffusion.ddim import ddim_schedule


class KarrasArrays(NamedTuple):
    """Per-step scan inputs, all length n_steps, step order = sampling
    order (t descending). `t_next` / `sigma_next` describe the step
    TARGET (sigma_next[-1] == 0: the last step lands on x0)."""

    timesteps: jnp.ndarray    # i32 [n]
    t_next: jnp.ndarray       # i32 [n] (last entry 0, unused at sigma 0)
    sigma: jnp.ndarray        # f32 [n]
    sigma_next: jnp.ndarray   # f32 [n]


def karras_arrays(alphas_cumprod, n_train_steps: int,
                  n_steps: int) -> KarrasArrays:
    """Sigma ladder on the DDIM leading-uniform timesteps."""
    timesteps, _ = ddim_schedule(n_train_steps, n_steps)  # already t-desc
    ts = jnp.asarray(timesteps, jnp.int32)
    abar = alphas_cumprod.astype(jnp.float32)[ts]
    sigma = jnp.sqrt((1.0 - abar) / abar)  # descending with t
    sigma_next = jnp.concatenate([sigma[1:], jnp.zeros((1,), jnp.float32)])
    t_next = jnp.concatenate([ts[1:], jnp.zeros((1,), jnp.int32)])
    return KarrasArrays(ts, t_next, sigma, sigma_next)


def karras_sigma_arrays(alphas_cumprod, n_steps: int,
                        rho: float = 7.0) -> KarrasArrays:
    """Karras et al. (2022) eq. 5 sigma spacing instead of the uniform
    timestep grid: sigmas interpolate between the training table's
    sigma_max (t = T-1) and sigma_min (t = 0) in sigma^(1/rho) space
    (k-diffusion `get_sigmas_karras` / diffusers `use_karras_sigmas`).
    This concentrates steps at low noise, where it matters most at small
    n_steps.

    The UNet is conditioned on t, not sigma, so each ladder sigma maps to
    a FRACTIONAL timestep by piecewise-linear interpolation of the
    log-sigma table (k-diffusion `sigma_to_t`, quantize=False); the
    sinusoidal timestep embedding (ops/timestep.py) is continuous in t.
    Returned `timesteps`/`t_next` are therefore f32, not i32."""
    abar = jnp.asarray(alphas_cumprod, jnp.float32)
    table = jnp.sqrt((1.0 - abar) / abar)  # ascending in t
    sigma_min, sigma_max = table[0], table[-1]
    ramp = jnp.linspace(0.0, 1.0, n_steps)
    min_inv = sigma_min ** (1.0 / rho)
    max_inv = sigma_max ** (1.0 / rho)
    sigma = (max_inv + ramp * (min_inv - max_inv)) ** rho  # descending
    sigma_next = jnp.concatenate([sigma[1:], jnp.zeros((1,), jnp.float32)])

    log_table = jnp.log(table)
    t_grid = jnp.arange(table.shape[0], dtype=jnp.float32)

    def to_t(s):
        # interp clamps at the ends: sigma 0 (the final boundary, never
        # consumed by the UNet) maps to t = 0
        return jnp.interp(jnp.log(jnp.maximum(s, 1e-20)), log_table, t_grid)

    return KarrasArrays(to_t(sigma), to_t(sigma_next), sigma, sigma_next)


def model_input(x, sigma):
    """VE state -> the VP latent the UNet was trained on."""
    return x / jnp.sqrt(sigma * sigma + 1.0)


def vp_alpha(sigma):
    """abar_t implied by sigma (for v-prediction eps conversion)."""
    return 1.0 / (sigma * sigma + 1.0)


def euler_step(x, eps, sigma, sigma_next):
    """First-order step: in the VE parameterization dx/dsigma == eps."""
    return x + eps * (sigma_next - sigma)


def ancestral_sigmas(sigma, sigma_next):
    """k-diffusion's variance split (see module docstring)."""
    up2 = sigma_next ** 2 * (sigma ** 2 - sigma_next ** 2) \
        / jnp.maximum(sigma ** 2, 1e-20)
    up = jnp.sqrt(jnp.maximum(up2, 0.0))
    down = jnp.sqrt(jnp.maximum(sigma_next ** 2 - up2, 0.0))
    return down, up


def euler_ancestral_step(x, eps, noise, sigma, sigma_next):
    down, up = ancestral_sigmas(sigma, sigma_next)
    return x + eps * (down - sigma) + noise * up


def heun_step(x, eps1, eps2, sigma, sigma_next):
    """2nd-order (trapezoid) correction; degrades to Euler when
    sigma_next == 0 (eps2 is evaluated but ignored there, keeping the
    scan body branch-free)."""
    d = jnp.where(sigma_next > 0.0, 0.5 * (eps1 + eps2), eps1)
    return x + d * (sigma_next - sigma)
