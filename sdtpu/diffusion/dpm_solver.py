"""DPM-Solver++(2M) multistep scheduler (stretch target, BASELINE.json
config 5 — absent from the reference, which only has DDIM).

Deterministic second-order multistep solver in the dpmsolver++ (data
prediction) parameterisation:

    alpha_t = sqrt(alphas_cumprod[t]),  sigma_t = sqrt(1 - alphas_cumprod[t])
    lambda_t = log(alpha_t / sigma_t)
    x0 = (x - sigma_t * eps) / alpha_t
    h_i = lambda_{i+1} - lambda_i
    D_i = (1 + 1/(2 r_i)) x0_i - 1/(2 r_i) x0_{i-1},   r_i = h_{i-1}/h_i
    x_{i+1} = (sigma_{i+1}/sigma_i) x - alpha_{i+1} (exp(-h_i) - 1) D_i

(first step falls back to first order, D_0 = x0_0). All step constants
are precomputed device arrays so the loop scans jit-side like DDIM.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from sdtpu.diffusion.ddim import ddim_schedule


class DpmArrays(NamedTuple):
    alpha_t: jnp.ndarray
    sigma_t: jnp.ndarray
    lam_t: jnp.ndarray
    alpha_n: jnp.ndarray  # "next" (less noisy) boundary per step
    sigma_n: jnp.ndarray
    lam_n: jnp.ndarray
    timesteps: jnp.ndarray


def dpmpp_arrays(alphas_cumprod, n_train_steps: int, n_steps: int) -> DpmArrays:
    """Precompute per-step constants on the reference's timestep grid
    (descending from n_train-1 with stride n_train//n; the final 'next'
    boundary is alphas_cumprod[0], the cleanest tabulated state)."""
    timesteps, step_size = ddim_schedule(n_train_steps, n_steps)
    ts = jnp.asarray(timesteps, jnp.int32)
    ac = jnp.asarray(alphas_cumprod, jnp.float32)
    a_t = ac[ts]
    prev_idx = jnp.maximum(ts - step_size, 0)
    a_n = ac[prev_idx]

    def split(a):
        alpha = jnp.sqrt(a)
        sigma = jnp.sqrt(1.0 - a)
        # clamp: lambda is infinite at sigma=0; the tabulated grid never
        # reaches it but guard anyway
        lam = jnp.log(alpha / jnp.maximum(sigma, 1e-10))
        return alpha, sigma, lam

    alpha_t, sigma_t, lam_t = split(a_t)
    alpha_n, sigma_n, lam_n = split(a_n)
    return DpmArrays(alpha_t, sigma_t, lam_t, alpha_n, sigma_n, lam_n, ts)


def dpmpp_karras_arrays(alphas_cumprod, n_steps: int,
                        rho: float = 7.0) -> DpmArrays:
    """DPM-Solver++(2M) constants on the Karras sigma ladder instead of
    the uniform timestep grid (diffusers `use_karras_sigmas=True`). The
    VE ladder sigma implies abar = 1/(1+sigma^2); the final boundary
    sigma=0 gives abar=1 (alpha=1, sigma_t=0) — exactly the x0 landing
    the uniform grid approximates with alphas_cumprod[0]. Timesteps are
    fractional f32 (see karras.karras_sigma_arrays)."""
    from sdtpu.diffusion.karras import karras_sigma_arrays

    arrs = karras_sigma_arrays(alphas_cumprod, n_steps, rho)

    def split(sigma_ve):
        a = 1.0 / (sigma_ve * sigma_ve + 1.0)
        alpha = jnp.sqrt(a)
        sigma = jnp.sqrt(1.0 - a)
        lam = jnp.log(alpha / jnp.maximum(sigma, 1e-10))
        return alpha, sigma, lam

    alpha_t, sigma_t, lam_t = split(arrs.sigma)
    alpha_n, sigma_n, lam_n = split(arrs.sigma_next)
    return DpmArrays(alpha_t, sigma_t, lam_t, alpha_n, sigma_n, lam_n,
                     arrs.timesteps)


class DpmState(NamedTuple):
    x: jnp.ndarray
    x0_prev: jnp.ndarray
    h_prev: jnp.ndarray  # scalar; 0.0 marks "no previous step"


def dpmpp_init(latent) -> DpmState:
    return DpmState(latent, jnp.zeros_like(latent), jnp.asarray(0.0, jnp.float32))


def dpmpp_2m_step(state: DpmState, eps, step) -> DpmState:
    """One DPM-Solver++(2M) update. `step` is a per-step slice of
    DpmArrays (without timesteps)."""
    alpha_t, sigma_t, lam_t, alpha_n, sigma_n, lam_n = step
    x = state.x
    x0 = (x - sigma_t * eps) / alpha_t

    h = lam_n - lam_t
    r = state.h_prev / h
    # first-order on step 0 (no history) AND on a sigma_n == 0 landing
    # (the Karras ladder's final boundary; k-diffusion sample_dpmpp_2m
    # and diffusers lower_order_final both drop to first order there —
    # the uniform grid never reaches sigma 0, so it is unaffected)
    use_second = (state.h_prev != 0.0) & (sigma_n > 0.0)
    coef = 1.0 / (2.0 * jnp.where(use_second, r, 1.0))
    d = jnp.where(use_second, (1.0 + coef) * x0 - coef * state.x0_prev, x0)

    x_next = (sigma_n / sigma_t) * x - alpha_n * (jnp.exp(-h) - 1.0) * d
    return DpmState(x_next, x0, h)
