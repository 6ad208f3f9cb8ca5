"""External-oracle sampler validation (VERDICT r2 missing #3).

The analytic exactness tests (test_karras.py / test_dpm_solver.py) prove
internal consistency; these tests pin sdtpu's per-step trajectories
against independent numpy TRANSCRIPTIONS of the de-facto oracle
implementations:

- k-diffusion `sampling.sample_euler` / `sample_euler_ancestral` /
  `sample_heun` (crowsonkb/k-diffusion sampling.py) with the
  CompVisDenoiser VP wrapping (external_models: c_in = 1/sqrt(s^2+1),
  c_out = -s, sigma = sqrt((1-abar)/abar)),
- diffusers `DPMSolverMultistepScheduler` (algorithm_type="dpmsolver++",
  solver_order=2) first/second-order updates in the separated D0/D1 form
  (different algebra from sdtpu's fused (1+1/2r) form — agreement is a
  real check, not an identity).

Both sides share ONLY the eps-model (the real SD_TINY UNet + CFG, called
through one jitted function) and the sampling time grid; every sigma /
lambda / variance-split / final-step decision is computed independently
per side. An off-by-one in a sigma ladder or a swapped boundary would
show up as a per-step trajectory divergence.

The samplers run entirely inside pipeline._sample_latent_impl (the real
jitted scan), so the CFG batching, VE<->VP conversions, and scan wiring
are all under test too.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.config import SD_TINY
from sdtpu.diffusion import scaled_linear_alphas_cumprod
from sdtpu.diffusion.ddim import ddim_schedule
from sdtpu.models.unet import init_unet, unet_apply
from sdtpu.pipeline import StableDiffusion

N_TRAIN = 40
N_STEPS = 5
GS = 3.0
B = 2
CTX_LEN = 7


@pytest.fixture(scope="module")
def setup():
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(11), 4)
    params = {
        "unet": init_unet(k1, SD_TINY.unet),
        "alphas_cumprod": scaled_linear_alphas_cumprod(N_TRAIN),
        "n_steps": N_TRAIN,
    }
    hw = SD_TINY.latent_size
    ctx = jax.random.normal(k2, (B, CTX_LEN, SD_TINY.unet.context_dim),
                            jnp.float32) * 0.2
    unctx = jax.random.normal(k3, (1, CTX_LEN, SD_TINY.unet.context_dim),
                              jnp.float32) * 0.2
    latent0 = jax.random.normal(k4, (B, hw, hw, 4), jnp.float32)
    sd = StableDiffusion(params, SD_TINY)

    @jax.jit
    def eps_fn(x, t):
        """The shared eps-model: CFG pair through the tiny UNet. Both the
        pipeline and the oracles consume exactly this function."""
        un = jnp.broadcast_to(unctx, (B,) + unctx.shape[1:])
        e_un = unet_apply(params["unet"], x, t, un, SD_TINY.unet)
        e_c = unet_apply(params["unet"], x, t, ctx, SD_TINY.unet)
        return e_un + (e_c - e_un) * GS

    def eps_np(x, t):
        # f32 t: identical for integer grids (the embedding is computed
        # in f32 either way) and accepts the Karras ladder's fractional
        # timesteps
        return np.asarray(
            eps_fn(jnp.asarray(x, jnp.float32), jnp.asarray(float(t), jnp.float32)),
            np.float64)

    abar = np.asarray(params["alphas_cumprod"], np.float64)
    return sd, ctx, unctx, latent0, eps_np, abar


def _grid():
    """sdtpu's sampling time grid (shared input, not under test here —
    its reference parity is pinned in test_pipeline.py)."""
    ts, step = ddim_schedule(N_TRAIN, N_STEPS)
    return np.asarray(ts, np.int64), int(step)


# ----------------------------------------------------- k-diffusion oracles

def _kd_sigmas(abar, ts):
    """CompVisDenoiser sigma ladder: sigma(t) = ((1-abar_t)/abar_t)^0.5,
    final boundary 0 (k-diffusion external.py get_sigmas + append_zero)."""
    sig = np.sqrt((1.0 - abar[ts]) / abar[ts])
    return np.concatenate([sig, [0.0]])


def _kd_denoised(x, sigma, t, eps_np):
    """CompVisDenoiser forward: denoised = x + c_out * eps(c_in * x, t)
    with c_in = (sigma^2+1)^-0.5, c_out = -sigma."""
    c_in = 1.0 / np.sqrt(sigma * sigma + 1.0)
    return x - sigma * eps_np(x * c_in, t)


def _to_d(x, sigma, denoised):
    """k-diffusion sampling.to_d."""
    return (x - denoised) / sigma


def kd_sample_euler(x, ts, sigmas, eps_np):
    traj = []
    for i in range(len(ts)):
        denoised = _kd_denoised(x, sigmas[i], ts[i], eps_np)
        d = _to_d(x, sigmas[i], denoised)
        dt = sigmas[i + 1] - sigmas[i]
        x = x + d * dt
        traj.append(x.copy())
    return traj


def kd_get_ancestral_step(sigma_from, sigma_to, eta=1.0):
    """k-diffusion sampling.get_ancestral_step (eta=1)."""
    if sigma_to == 0.0:
        return 0.0, 0.0
    sigma_up = min(
        sigma_to,
        eta * (sigma_to ** 2 * (sigma_from ** 2 - sigma_to ** 2)
               / sigma_from ** 2) ** 0.5)
    sigma_down = (sigma_to ** 2 - sigma_up ** 2) ** 0.5
    return sigma_down, sigma_up


def kd_sample_euler_ancestral(x, ts, sigmas, eps_np, noises):
    traj = []
    for i in range(len(ts)):
        denoised = _kd_denoised(x, sigmas[i], ts[i], eps_np)
        sigma_down, sigma_up = kd_get_ancestral_step(sigmas[i], sigmas[i + 1])
        d = _to_d(x, sigmas[i], denoised)
        x = x + d * (sigma_down - sigmas[i])
        if sigmas[i + 1] > 0:
            x = x + noises[i] * sigma_up
        traj.append(x.copy())
    return traj


def kd_sample_heun(x, ts, sigmas, eps_np):
    """sample_heun with s_churn=0."""
    for i in range(len(ts)):
        denoised = _kd_denoised(x, sigmas[i], ts[i], eps_np)
        d = _to_d(x, sigmas[i], denoised)
        dt = sigmas[i + 1] - sigmas[i]
        if sigmas[i + 1] == 0.0:
            x = x + d * dt
        else:
            x_2 = x + d * dt
            denoised_2 = _kd_denoised(x_2, sigmas[i + 1], ts[i + 1], eps_np)
            d_2 = _to_d(x_2, sigmas[i + 1], denoised_2)
            x = x + (d + d_2) / 2.0 * dt
    return x


# ------------------------------------------------------- diffusers oracle

def diffusers_dpmpp_2m(x, ts, step_size, abar, eps_np):
    """DPMSolverMultistepScheduler, algorithm_type='dpmsolver++',
    solver_order=2, prediction_type='epsilon': data-prediction convert +
    first-order fallback on step 0 + second-order multistep in the
    separated D0/D1 form (scheduling_dpmsolver_multistep.py:
    convert_model_output / multistep_dpm_solver_second_order_update)."""
    ts_next = np.maximum(ts - step_size, 0)

    def split(a):
        alpha = np.sqrt(a)
        sigma = np.sqrt(1.0 - a)
        lam = np.log(alpha) - np.log(np.maximum(sigma, 1e-10))
        return alpha, sigma, lam

    m_prev = None
    lam_prev_pair = None
    for i in range(len(ts)):
        a_s0, s_s0, l_s0 = split(abar[ts[i]])
        a_t, s_t, l_t = split(abar[ts_next[i]])
        eps = eps_np(x / 1.0, ts[i])  # dpmsolver++ consumes x directly
        # convert_model_output (epsilon -> data prediction)
        m0 = (x - s_s0 * eps) / a_s0
        h = l_t - l_s0
        if m_prev is None:
            # dpm_solver_first_order_update
            x = (s_t / s_s0) * x - a_t * (np.exp(-h) - 1.0) * m0
        else:
            l_s1 = lam_prev_pair
            h_0 = l_s0 - l_s1
            r0 = h_0 / h
            D0 = m0
            D1 = (1.0 / r0) * (m0 - m_prev)
            x = ((s_t / s_s0) * x
                 - a_t * (np.exp(-h) - 1.0) * D0
                 - 0.5 * a_t * (np.exp(-h) - 1.0) * D1)
        m_prev = m0
        lam_prev_pair = l_s0
    return x


# ----------------------------------------------------------------- tests

def _run_pipeline(sd, ctx, unctx, latent0, sampler, key=None):
    return np.asarray(sd.sample_latent(
        ctx, unctx, GS, N_STEPS, initial_latent=latent0, sampler=sampler,
        key=key), np.float64)


def test_euler_matches_k_diffusion(setup):
    sd, ctx, unctx, latent0, eps_np, abar = setup
    ts, _ = _grid()
    sigmas = _kd_sigmas(abar, ts)
    x0 = np.asarray(latent0, np.float64) * np.sqrt(sigmas[0] ** 2 + 1.0)
    want = kd_sample_euler(x0, ts, sigmas, eps_np)[-1]
    got = _run_pipeline(sd, ctx, unctx, latent0, "euler")
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_euler_per_step_trajectory(setup):
    """Step-by-step, not just the endpoint: run the pipeline at every
    prefix length k and compare with the oracle's k-th state (an error
    that cancels by the last step would still be caught)."""
    sd, ctx, unctx, latent0, eps_np, abar = setup
    ts, _ = _grid()
    sigmas = _kd_sigmas(abar, ts)
    x0 = np.asarray(latent0, np.float64) * np.sqrt(sigmas[0] ** 2 + 1.0)
    traj = kd_sample_euler(x0, ts, sigmas, eps_np)
    for k in (1, 2, 3):
        # the scan doesn't expose intermediate states; instead inject the
        # oracle's state-after-k-steps via skip_steps=k and require the
        # tails to agree — any per-step divergence entering step k makes
        # the tails differ.
        x_mid = jnp.asarray(
            traj[k - 1] / np.sqrt(sigmas[k] ** 2 + 1.0), jnp.float32)
        got_tail = np.asarray(sd.sample_latent(
            ctx, unctx, GS, N_STEPS, initial_latent=x_mid,
            sampler="euler", skip_steps=k), np.float64)
        want_tail = kd_sample_euler(
            np.asarray(traj[k - 1], np.float64), ts[k:], sigmas[k:], eps_np)[-1]
        np.testing.assert_allclose(got_tail, want_tail, rtol=4e-4, atol=4e-4,
                                   err_msg=f"divergence entering step {k}")


def test_heun_matches_k_diffusion(setup):
    sd, ctx, unctx, latent0, eps_np, abar = setup
    ts, _ = _grid()
    sigmas = _kd_sigmas(abar, ts)
    x0 = np.asarray(latent0, np.float64) * np.sqrt(sigmas[0] ** 2 + 1.0)
    want = kd_sample_heun(x0, ts, sigmas, eps_np)
    got = _run_pipeline(sd, ctx, unctx, latent0, "heun")
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_euler_ancestral_matches_k_diffusion(setup):
    """The ancestral variance split (sigma_up/sigma_down) against
    k-diffusion's get_ancestral_step. The per-step noise draws are taken
    from the pipeline's own key schedule (noise generation is shared so
    that the STEP MATH is what differs)."""
    sd, ctx, unctx, latent0, eps_np, abar = setup
    ts, _ = _grid()
    sigmas = _kd_sigmas(abar, ts)

    key = jax.random.PRNGKey(99)
    # replicate pipeline.sample_latent's key plumbing: with an explicit
    # initial latent, sampler='euler_a' splits (key -> key, noise_key)
    # and the scan body re-splits noise_key per step
    _, noise_key = jax.random.split(key)
    noises = []
    k = noise_key
    for _ in range(N_STEPS):
        k, ks = jax.random.split(k)
        noises.append(np.asarray(
            jax.random.normal(ks, latent0.shape, jnp.float32), np.float64))

    x0 = np.asarray(latent0, np.float64) * np.sqrt(sigmas[0] ** 2 + 1.0)
    want = kd_sample_euler_ancestral(x0, ts, sigmas, eps_np, noises)[-1]
    got = _run_pipeline(sd, ctx, unctx, latent0, "euler_a", key=key)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_dpmpp_matches_diffusers(setup):
    sd, ctx, unctx, latent0, eps_np, abar = setup
    ts, step = _grid()
    want = diffusers_dpmpp_2m(
        np.asarray(latent0, np.float64), ts, step, abar, eps_np)
    got = _run_pipeline(sd, ctx, unctx, latent0, "dpmpp")
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


# --------------------------------------------- Karras sigma-spacing oracles

def _kd_karras_ladder(abar, n, rho=7.0):
    """k-diffusion sampling.get_sigmas_karras with sigma_min/sigma_max
    from the model's full sigma table ends (external.DiscreteSchedule
    sigma_min/sigma_max) + append_zero."""
    table = np.sqrt((1.0 - abar) / abar)
    smin, smax = table[0], table[-1]
    ramp = np.linspace(0.0, 1.0, n)
    sigmas = (smax ** (1 / rho)
              + ramp * (smin ** (1 / rho) - smax ** (1 / rho))) ** rho
    return np.concatenate([sigmas, [0.0]])


def _kd_sigma_to_t(abar, sigma):
    """k-diffusion external.DiscreteSchedule.sigma_to_t (quantize=False):
    piecewise-linear interpolation in log-sigma, in the cumsum-argmax
    index form (different algebra from sdtpu's jnp.interp)."""
    log_sigmas = np.log(np.sqrt((1.0 - abar) / abar))
    log_sigma = np.log(sigma)
    dists = log_sigma - log_sigmas
    low_idx = int(np.clip((dists >= 0).cumsum().argmax(),
                          0, len(log_sigmas) - 2))
    high_idx = low_idx + 1
    low, high = log_sigmas[low_idx], log_sigmas[high_idx]
    w = float(np.clip((low - log_sigma) / (low - high), 0.0, 1.0))
    return (1.0 - w) * low_idx + w * high_idx


def _karras_grid(abar):
    sigmas = _kd_karras_ladder(abar, N_STEPS)
    ts = [_kd_sigma_to_t(abar, s) for s in sigmas[:-1]]
    return ts, sigmas


def test_karras_ladder_matches_k_diffusion(setup):
    """karras_sigma_arrays (ladder + fractional-t mapping) against the
    independent transcriptions above."""
    from sdtpu.diffusion.karras import karras_sigma_arrays

    _, _, _, _, _, abar = setup
    arrs = karras_sigma_arrays(jnp.asarray(abar, jnp.float32), N_STEPS)
    want = _kd_karras_ladder(abar, N_STEPS)
    np.testing.assert_allclose(np.asarray(arrs.sigma), want[:-1], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(arrs.sigma_next), want[1:],
                               rtol=1e-5, atol=1e-7)
    want_t = [_kd_sigma_to_t(abar, s) for s in want[:-1]]
    np.testing.assert_allclose(np.asarray(arrs.timesteps), want_t,
                               rtol=1e-4, atol=1e-4)


def test_euler_karras_matches_k_diffusion(setup):
    sd, ctx, unctx, latent0, eps_np, abar = setup
    ts, sigmas = _karras_grid(abar)
    x0 = np.asarray(latent0, np.float64) * np.sqrt(sigmas[0] ** 2 + 1.0)
    want = kd_sample_euler(x0, ts, sigmas, eps_np)[-1]
    got = np.asarray(sd.sample_latent(
        ctx, unctx, GS, N_STEPS, initial_latent=latent0, sampler="euler",
        karras_sigmas=True), np.float64)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_heun_karras_matches_k_diffusion(setup):
    sd, ctx, unctx, latent0, eps_np, abar = setup
    ts, sigmas = _karras_grid(abar)
    x0 = np.asarray(latent0, np.float64) * np.sqrt(sigmas[0] ** 2 + 1.0)
    want = kd_sample_heun(x0, ts, sigmas, eps_np)
    got = np.asarray(sd.sample_latent(
        ctx, unctx, GS, N_STEPS, initial_latent=latent0, sampler="heun",
        karras_sigmas=True), np.float64)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_euler_ancestral_karras_matches_k_diffusion(setup):
    sd, ctx, unctx, latent0, eps_np, abar = setup
    ts, sigmas = _karras_grid(abar)

    key = jax.random.PRNGKey(99)
    _, noise_key = jax.random.split(key)
    noises = []
    k = noise_key
    for _ in range(N_STEPS):
        k, ks = jax.random.split(k)
        noises.append(np.asarray(
            jax.random.normal(ks, latent0.shape, jnp.float32), np.float64))

    x0 = np.asarray(latent0, np.float64) * np.sqrt(sigmas[0] ** 2 + 1.0)
    want = kd_sample_euler_ancestral(x0, ts, sigmas, eps_np, noises)[-1]
    got = np.asarray(sd.sample_latent(
        ctx, unctx, GS, N_STEPS, initial_latent=latent0, sampler="euler_a",
        key=key, karras_sigmas=True), np.float64)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def diffusers_dpmpp_2m_karras(x, abar, eps_np, n):
    """DPMSolverMultistepScheduler with use_karras_sigmas=True: alpha/
    sigma derived from the ladder sigma (_sigma_to_alpha_sigma_t:
    alpha = (1+s^2)^-0.5, sigma = s*alpha), fractional-t conditioning,
    and lower_order_final's first-order drop on the final sigma=0 step
    (k-diffusion sample_dpmpp_2m does the same)."""
    ts, sigmas = _karras_grid(abar)

    def split(s_ve):
        alpha = 1.0 / np.sqrt(s_ve * s_ve + 1.0)
        sigma = s_ve * alpha
        lam = np.log(alpha) - np.log(np.maximum(sigma, 1e-10))
        return alpha, sigma, lam

    m_prev = None
    lam_prev = None
    for i in range(n):
        a_s0, s_s0, l_s0 = split(sigmas[i])
        a_t, s_t, l_t = split(sigmas[i + 1])
        eps = eps_np(x, ts[i])
        m0 = (x - s_s0 * eps) / a_s0
        h = l_t - l_s0
        if m_prev is None or sigmas[i + 1] == 0.0:
            x = (s_t / s_s0) * x - a_t * (np.exp(-h) - 1.0) * m0
        else:
            h_0 = l_s0 - lam_prev
            r0 = h_0 / h
            D0, D1 = m0, (1.0 / r0) * (m0 - m_prev)
            x = ((s_t / s_s0) * x
                 - a_t * (np.exp(-h) - 1.0) * D0
                 - 0.5 * a_t * (np.exp(-h) - 1.0) * D1)
        m_prev, lam_prev = m0, l_s0
    return x


def test_dpmpp_karras_matches_diffusers(setup):
    sd, ctx, unctx, latent0, eps_np, abar = setup
    want = diffusers_dpmpp_2m_karras(
        np.asarray(latent0, np.float64), abar, eps_np, N_STEPS)
    got = np.asarray(sd.sample_latent(
        ctx, unctx, GS, N_STEPS, initial_latent=latent0, sampler="dpmpp",
        karras_sigmas=True), np.float64)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_karras_sigmas_combos(setup):
    """ddim has no sigma ladder — karras_sigmas with it stays a hard
    error. karras + skip_steps, rejected through round 3, is now the
    supported mid-ladder entry (Karras img2img, VERDICT r3 weak #4):
    oracle = k-diffusion euler over the TRUNCATED ladder from the same
    VE-scaled state the pipeline builds at sigma[skip]."""
    sd, ctx, unctx, latent0, eps_np, abar = setup
    with pytest.raises(ValueError, match="sigma-ladder"):
        sd.sample_latent(ctx, unctx, GS, N_STEPS, initial_latent=latent0,
                         sampler="ddim", karras_sigmas=True)
    ts, sigmas = _karras_grid(abar)
    for k in (1, 3):
        want = kd_sample_euler(
            np.asarray(latent0, np.float64) * np.sqrt(sigmas[k] ** 2 + 1.0),
            ts[k:], sigmas[k:], eps_np)[-1]
        got = np.asarray(sd.sample_latent(
            ctx, unctx, GS, N_STEPS, initial_latent=latent0,
            sampler="euler", karras_sigmas=True, skip_steps=k), np.float64)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4,
                                   err_msg=f"mid-ladder entry at {k}")
