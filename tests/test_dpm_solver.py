"""DPM-Solver++(2M) correctness.

Analytic exactness: when the model's epsilon prediction is exactly
consistent with a fixed clean image x* (eps = (x - alpha_t x*)/sigma_t),
the dpmsolver++ update preserves the exact trajectory
x_t = alpha_t x* + sigma_t eps0 at every boundary — first AND second
order (x0 is constant, so the multistep correction D == x0). The final
state must equal alpha_f x* + sigma_f eps0.
"""

import numpy as np
import jax
import jax.numpy as jnp

from sdtpu.diffusion import scaled_linear_alphas_cumprod
from sdtpu.diffusion.dpm_solver import (
    dpmpp_2m_step,
    dpmpp_arrays,
    dpmpp_init,
)


def test_dpmpp_exact_on_consistent_model():
    ac = scaled_linear_alphas_cumprod(1000)
    arrs = dpmpp_arrays(ac, 1000, 20)

    rng = np.random.default_rng(0)
    x_star = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    eps0 = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)

    # start exactly on the trajectory at the first boundary
    a0, s0 = arrs.alpha_t[0], arrs.sigma_t[0]
    state = dpmpp_init(a0 * x_star + s0 * eps0)

    for i in range(arrs.timesteps.shape[0]):
        at, st = arrs.alpha_t[i], arrs.sigma_t[i]
        eps = (state.x - at * x_star) / st
        step = (at, st, arrs.lam_t[i], arrs.alpha_n[i], arrs.sigma_n[i], arrs.lam_n[i])
        state = dpmpp_2m_step(state, eps, step)

    af, sf = arrs.alpha_n[-1], arrs.sigma_n[-1]
    want = af * x_star + sf * eps0
    np.testing.assert_allclose(np.asarray(state.x), np.asarray(want), atol=1e-4)


def test_dpmpp_pipeline_runs():
    from tests.test_pipeline import TINY, tiny_params
    from sdtpu.pipeline import StableDiffusion

    sd = StableDiffusion(tiny_params(), TINY)
    lat0 = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 32))
    unctx = jax.random.normal(jax.random.PRNGKey(3), (1, 77, 32))
    valid = jnp.ones((1, 77), bool)

    out_ddim = sd.sample_latent(ctx, unctx, 7.5, 4, initial_latent=lat0,
                                ctx_valid=valid, uncond_valid=valid)
    out_dpm = sd.sample_latent(ctx, unctx, 7.5, 4, initial_latent=lat0,
                               ctx_valid=valid, uncond_valid=valid, sampler="dpmpp")
    a, b = np.asarray(out_ddim), np.asarray(out_dpm)
    assert np.isfinite(b).all()
    # different solvers, same model: correlated but not identical
    assert not np.allclose(a, b)
    assert np.abs(b).mean() < 10 * max(np.abs(a).mean(), 1e-3)
