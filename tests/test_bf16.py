"""bf16 compute-path discipline (VERDICT r2 weak #1).

The published perf numbers come from a natively-bf16 param tree; a user
loading an f32 checkpoint with `sample.py --bf16` must get the SAME
compute graph. These tests trace the models with f32 params + bf16
activations and assert no matmul/conv primitive ever sees an f32 operand
(an f32 dot on the MXU is several times slower than bf16), and that
`StableDiffusion.__init__` casts the stored tree once at load time.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.config import SD_TINY
from sdtpu.diffusion import scaled_linear_alphas_cumprod
from sdtpu.models.clip import clip_apply, init_clip
from sdtpu.models.unet import init_unet, unet_apply
from sdtpu.models.vae import decode_latent, init_autoencoder
from sdtpu.pipeline import StableDiffusion

MATMUL_PRIMS = ("dot_general", "conv_general_dilated")


def _iter_eqns(jaxpr):
    for eqn in jaxpr.eqns:
        yield eqn
        for v in eqn.params.values():
            for sub in _subjaxprs(v):
                yield from _iter_eqns(sub)


def _subjaxprs(v):
    from jax.extend import core as jex_core

    if isinstance(v, jex_core.Jaxpr):
        yield v
    elif isinstance(v, jex_core.ClosedJaxpr):
        yield v.jaxpr
    elif isinstance(v, (tuple, list)):
        for item in v:
            yield from _subjaxprs(item)


def assert_no_f32_matmul(jaxpr):
    offenders = []
    for eqn in _iter_eqns(jaxpr):
        if eqn.primitive.name in MATMUL_PRIMS:
            for var in eqn.invars:
                aval = getattr(var, "aval", None)
                if aval is not None and aval.dtype == jnp.float32:
                    offenders.append((eqn.primitive.name, [
                        getattr(x, "aval", None) and str(x.aval)
                        for x in eqn.invars
                    ]))
                    break
    assert not offenders, (
        f"{len(offenders)} matmul/conv ops with f32 operands on the bf16 "
        f"path: {offenders[:5]}")


@pytest.fixture(scope="module")
def f32_params():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    return {
        "clip": init_clip(k1, SD_TINY.clip),
        "unet": init_unet(k2, SD_TINY.unet),
        "autoencoder": init_autoencoder(k3, SD_TINY.vae),
        "alphas_cumprod": scaled_linear_alphas_cumprod(1000),
        "n_steps": 1000,
    }


def test_unet_bf16_step_has_no_f32_matmul(f32_params):
    """The fix the published bench depends on: f32 checkpoint params,
    bf16 activations -> every dot/conv must run with bf16 operands
    (ops/conv.py linear casts w; conv2d already did)."""
    hw = SD_TINY.latent_size
    x = jnp.zeros((2, hw, hw, 4), jnp.bfloat16)
    ctx = jnp.zeros((2, 77, SD_TINY.unet.context_dim), jnp.bfloat16)
    t = jnp.asarray(1, jnp.int32)

    jaxpr = jax.make_jaxpr(
        lambda p, x, t, c: unet_apply(p, x, t, c, SD_TINY.unet)
    )(f32_params["unet"], x, t, ctx)
    assert_no_f32_matmul(jaxpr.jaxpr)


def test_clip_and_vae_bf16_have_no_f32_matmul(f32_params):
    tokens = jnp.zeros((1, 77), jnp.int32)

    def clip_fn(p, ids):
        # embedding lookup emits the param dtype; the pipeline's tree
        # cast makes it bf16 — model that here
        return clip_apply(jax.tree_util.tree_map(
            lambda l: l.astype(jnp.bfloat16)
            if jnp.issubdtype(l.dtype, jnp.floating) else l, p), ids,
            SD_TINY.clip)

    jaxpr = jax.make_jaxpr(clip_fn)(f32_params["clip"], tokens)
    assert_no_f32_matmul(jaxpr.jaxpr)

    hw = SD_TINY.latent_size
    z = jnp.zeros((1, hw, hw, 4), jnp.bfloat16)
    jaxpr = jax.make_jaxpr(
        lambda p, z: decode_latent(p, z, SD_TINY.vae)
    )(f32_params["autoencoder"], z)
    assert_no_f32_matmul(jaxpr.jaxpr)


def test_init_casts_param_tree_once(f32_params):
    """StableDiffusion(compute_dtype=bf16) stores a bf16 tree (no
    per-step f32 weight reads), keeps alphas_cumprod f32."""
    sd = StableDiffusion(f32_params, SD_TINY, compute_dtype=jnp.bfloat16)
    leaves = jax.tree_util.tree_leaves(sd.params["unet"])
    assert all(l.dtype == jnp.bfloat16 for l in leaves
               if jnp.issubdtype(l.dtype, jnp.floating))
    leaves = jax.tree_util.tree_leaves(sd.params["clip"])
    assert all(l.dtype == jnp.bfloat16 for l in leaves
               if jnp.issubdtype(l.dtype, jnp.floating))
    assert np.asarray(sd.params["alphas_cumprod"]).dtype == np.float32
    assert sd.params["n_steps"] == 1000
    # f32 stays untouched (no gratuitous copy/cast)
    sd32 = StableDiffusion(f32_params, SD_TINY)
    assert sd32.params is f32_params


def test_bf16_generate_smoke(f32_params):
    """End-to-end: f32 tree + --bf16 equivalent produces a valid image
    and matches the natively-bf16 tree bit-for-bit."""
    from sdtpu.tokenizer import SimpleTokenizer

    tok = SimpleTokenizer()
    key = jax.random.PRNGKey(3)
    sd = StableDiffusion(f32_params, SD_TINY, compute_dtype=jnp.bfloat16)
    img = sd.generate(tok, "a rock", guidance_scale=5.0, n_steps=2, key=key)
    assert img.dtype == np.uint8 and img.shape[-1] == 3

    pre_cast = StableDiffusion(
        sd.params, SD_TINY, compute_dtype=jnp.bfloat16)
    img2 = pre_cast.generate(tok, "a rock", guidance_scale=5.0, n_steps=2,
                             key=key)
    np.testing.assert_array_equal(img, img2)
