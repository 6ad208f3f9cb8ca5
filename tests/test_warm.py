"""Oracles for sdtpu/warm.py — the cold-start AOT warm path.

The load-bearing property: WarmStart's AOT executables are built from
ShapeDtypeStructs that must match the REAL first call's signature
exactly (a drift means the warm compile is wasted and bench/CLI fall
back to the jit path). test_warm_avals_match_real_tree pins that; the
end-to-end equality test proves the AOT executable computes the same
latents as the jit path on the same inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.config import SD_TINY
from sdtpu.diffusion import scaled_linear_alphas_cumprod
from sdtpu.models import rng
from sdtpu.models.clip import init_clip
from sdtpu.models.unet import init_unet
from sdtpu.models.vae import init_autoencoder
from sdtpu.pipeline import StableDiffusion
from sdtpu.warm import WarmStart, build_sample_avals


def _spec_params(dtype):
    k1, k2, k3 = rng.split(rng.spec_key(0), 3)
    spec = {
        "clip": init_clip(k1, SD_TINY.clip, dtype=dtype),
        "unet": init_unet(k2, SD_TINY.unet, dtype=dtype),
        "autoencoder": init_autoencoder(k3, SD_TINY.vae, dtype=dtype),
        "alphas_cumprod": scaled_linear_alphas_cumprod(1000),
    }
    params = rng.device_expand(spec, rng.spec_key(0))
    params["n_steps"] = 1000
    return params


@pytest.mark.parametrize("compute_dtype,init_dtype", [
    (jnp.bfloat16, jnp.bfloat16),   # bench default path
    (jnp.bfloat16, jnp.float32),    # SDTPU_BENCH_F32_LOAD / --bf16 on f32 ckpt
])
def test_warm_avals_match_real_tree(compute_dtype, init_dtype):
    sd = StableDiffusion(_spec_params(init_dtype), SD_TINY,
                         compute_dtype=compute_dtype)
    av = build_sample_avals(SD_TINY, batch=2, size=512,
                            compute_dtype=compute_dtype)

    real, rt = jax.tree_util.tree_flatten(jax.tree_util.tree_map(
        lambda x: (np.shape(x), str(np.asarray(x).dtype)), sd.params))
    want, wt = jax.tree_util.tree_flatten(jax.tree_util.tree_map(
        lambda a: ((a.shape, str(np.dtype(a.dtype)))
                   if isinstance(a, jax.ShapeDtypeStruct)
                   else (np.shape(a), str(np.asarray(a).dtype))),
        av["params"]))
    assert rt == wt
    assert real == want


def test_warm_executable_matches_jit_path():
    dtype = jnp.bfloat16
    # the latent size must come from the CONFIG's vae_factor (SD_TINY's
    # 2-level VAE gives f=2, not SD's 8) — the original //8 here masked
    # the same hardcoded-8 in build_sample_avals (r5 review). size=128
    # keeps the latent at 64x64, the pre-fix CPU cost.
    batch, size = 1, 128
    hw = size // SD_TINY.vae_factor
    sd = StableDiffusion(_spec_params(dtype), SD_TINY, compute_dtype=dtype)
    w = WarmStart(SD_TINY, batch=batch, size=size, compute_dtype=dtype,
                  n_steps=2).start()
    assert w.join(timeout=600.0), w.error

    from sdtpu.tokenizer import SimpleTokenizer

    tok = SimpleTokenizer()
    ctx, valid = sd.context(tok, "a mossy stone")
    unctx, unvalid = sd.unconditional_context(tok)
    ctx = jnp.tile(ctx, (batch, 1, 1))
    valid = jnp.tile(valid, (batch, 1))
    lat0 = jax.random.normal(jax.random.PRNGKey(7),
                             (batch, hw, hw, 4), jnp.float32)

    got = w.sampler(sd.params, lat0, ctx, valid, unctx, unvalid,
                    7.5, None, None, None)
    want = sd.sample_latent(ctx, unctx, 7.5, 2, initial_latent=lat0,
                            ctx_valid=valid, uncond_valid=unvalid)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    img = w.decode(sd.params, got)
    assert np.asarray(img).dtype == np.uint8


def test_warm_rejects_noisy_samplers():
    with pytest.raises(ValueError):
        WarmStart(SD_TINY, batch=1, size=512, compute_dtype=jnp.bfloat16,
                  sampler="euler_a")
