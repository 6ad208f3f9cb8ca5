"""Karras-family samplers (Euler / Euler-ancestral / Heun) correctness.

Analytic exactness: for a model whose epsilon prediction is exactly
consistent with a fixed clean image x* — in the VE parameterization
eps = (x - x*) / sigma — the exact ODE solution is the straight line
x(sigma) = x* + sigma * eps0, which Euler (and Heun, whose correction
vanishes on a line) reproduces EXACTLY at every boundary. The ancestral
variance split is pinned against its defining identity."""

import numpy as np
import jax
import jax.numpy as jnp

from sdtpu.diffusion import scaled_linear_alphas_cumprod
from sdtpu.diffusion.karras import (
    ancestral_sigmas,
    euler_step,
    heun_step,
    karras_arrays,
    model_input,
    vp_alpha,
)


def _consistent_eps(x, sigma, x_star):
    """VP-model epsilon consistent with clean image x* (see docstring)."""
    inp = model_input(x, sigma)
    a = vp_alpha(sigma)
    return (inp - jnp.sqrt(a) * x_star) / jnp.sqrt(1.0 - a)


def test_karras_arrays_schedule():
    ac = scaled_linear_alphas_cumprod(1000)
    arrs = karras_arrays(ac, 1000, 20)
    ts = np.asarray(arrs.timesteps)
    assert ts[0] == 999 and (np.diff(ts) == -50).all()
    sg = np.asarray(arrs.sigma)
    assert (np.diff(sg) < 0).all()  # strictly decreasing
    assert np.asarray(arrs.sigma_next)[-1] == 0.0
    np.testing.assert_allclose(np.asarray(arrs.sigma_next)[:-1], sg[1:])
    # sigma matches the VP definition at the gathered timesteps
    a = np.asarray(ac)[ts]
    np.testing.assert_allclose(sg, np.sqrt((1 - a) / a), rtol=1e-6)


def test_euler_and_heun_exact_on_consistent_model():
    ac = scaled_linear_alphas_cumprod(1000)
    arrs = karras_arrays(ac, 1000, 20)
    rng = np.random.default_rng(0)
    x_star = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    eps0 = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)

    for stepper in ("euler", "heun"):
        x = x_star + arrs.sigma[0] * eps0  # on the trajectory
        for i in range(arrs.sigma.shape[0]):
            sg, sn = arrs.sigma[i], arrs.sigma_next[i]
            e1 = _consistent_eps(x, sg, x_star)
            if stepper == "euler":
                x = euler_step(x, e1, sg, sn)
            else:
                x2 = euler_step(x, e1, sg, sn)
                e2 = _consistent_eps(x2, jnp.maximum(sn, 1e-20), x_star)
                x = heun_step(x, e1, e2, sg, sn)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_star),
                                   atol=1e-4)
        # the consistent model's eps must be eps0 on the whole line
        np.testing.assert_allclose(
            np.asarray(_consistent_eps(x_star + 3.0 * eps0, 3.0, x_star)),
            np.asarray(eps0), atol=1e-4)


def test_ancestral_variance_split():
    sg, sn = jnp.float32(2.0), jnp.float32(1.2)
    down, up = ancestral_sigmas(sg, sn)
    # defining identity: up^2 + down^2 == sigma_next^2
    np.testing.assert_allclose(float(up ** 2 + down ** 2), float(sn) ** 2,
                               rtol=1e-6)
    # k-diffusion formula
    np.testing.assert_allclose(
        float(up), float(jnp.sqrt(sn ** 2 * (sg ** 2 - sn ** 2) / sg ** 2)),
        rtol=1e-6)
    # terminal step adds no noise and lands deterministically on x0
    down0, up0 = ancestral_sigmas(sg, jnp.float32(0.0))
    assert float(up0) == 0.0 and float(down0) == 0.0


def test_heun_final_step_is_euler():
    x = jnp.ones((2, 2), jnp.float32)
    e1 = jnp.full((2, 2), 0.5, jnp.float32)
    e2 = jnp.full((2, 2), 99.0, jnp.float32)  # must be ignored at sn=0
    got = heun_step(x, e1, e2, jnp.float32(1.5), jnp.float32(0.0))
    want = euler_step(x, e1, jnp.float32(1.5), jnp.float32(0.0))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_karras_pipeline_runs():
    from tests.test_pipeline import TINY, tiny_params
    from sdtpu.pipeline import StableDiffusion

    sd = StableDiffusion(tiny_params(), TINY)
    lat0 = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 32))
    unctx = jax.random.normal(jax.random.PRNGKey(3), (1, 77, 32))
    valid = jnp.ones((1, 77), bool)
    kw = dict(initial_latent=lat0, ctx_valid=valid, uncond_valid=valid)

    outs = {}
    for s in ("ddim", "euler", "heun"):
        outs[s] = np.asarray(sd.sample_latent(ctx, unctx, 7.5, 4,
                                              sampler=s, **kw))
        assert np.isfinite(outs[s]).all(), s
    outs["euler_a"] = np.asarray(sd.sample_latent(
        ctx, unctx, 7.5, 4, sampler="euler_a",
        key=jax.random.PRNGKey(7), **kw))
    assert np.isfinite(outs["euler_a"]).all()
    # same key -> deterministic
    again = np.asarray(sd.sample_latent(ctx, unctx, 7.5, 4,
                                        sampler="euler_a",
                                        key=jax.random.PRNGKey(7), **kw))
    np.testing.assert_array_equal(outs["euler_a"], again)
    # distinct solvers, same model: all different, same magnitude class
    ref = outs["ddim"]
    for s in ("euler", "heun", "euler_a"):
        assert not np.allclose(ref, outs[s]), s
        assert np.abs(outs[s]).mean() < 10 * max(np.abs(ref).mean(), 1e-3), s


def test_euler_skip_steps_img2img():
    """skip_steps slices the sigma ladder BEFORE the VE rescale, so an
    img2img mid-trajectory VP latent enters at the right sigma."""
    from tests.test_pipeline import TINY, tiny_params
    from sdtpu.pipeline import StableDiffusion
    from sdtpu.tokenizer import SimpleTokenizer

    sd = StableDiffusion(tiny_params(), TINY)
    img = np.zeros((1, 32, 32, 3), np.float32)
    out = sd.img2img(SimpleTokenizer(), "a rock", img, strength=0.5,
                     n_steps=4, key=jax.random.PRNGKey(0), sampler="euler")
    assert out.shape == (1, 32, 32, 3) and out.dtype == np.uint8
