"""Structural and shape tests for CLIP / UNet / VAE on a scaled-down
config (fast on CPU) plus an exact block-layout check against the
reference's hand-written SD v1.4 block lists (unet/mod.rs:41-93)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdtpu.config import CLIPConfig, UNetConfig, AutoencoderConfig, SD_V1_4
from sdtpu.models.clip import clip_apply, init_clip
from sdtpu.models.unet import (
    build_input_specs,
    build_output_specs,
    init_unet,
    unet_apply,
)
from sdtpu.models.vae import (
    decode_latent,
    encode_image,
    init_autoencoder,
)

TINY_CLIP = CLIPConfig(n_vocab=100, n_state=32, n_head=4, n_ctx=16, n_layer=2)
TINY_UNET = UNetConfig(
    model_channels=32,
    channel_mult=(1, 2, 4, 4),
    attention_levels=(0, 1, 2),
    n_head=4,
    context_dim=24,
    time_embed_dim=128,
    groupnorm_groups=8,
)
TINY_VAE = AutoencoderConfig(
    encoder_channels=((16, 16), (16, 32), (32, 64), (64, 64)),
    decoder_channels=((64, 64), (64, 64), (64, 32), (32, 16)),
    groupnorm_groups=8,
)


def test_sd_v14_input_block_names_match_reference():
    specs = build_input_specs(SD_V1_4.unet)
    assert [s.name for s in specs] == [
        "conv", "rt1", "rt2", "d1", "rt3", "rt4", "d2", "rt5", "rt6", "d3", "r1", "r2",
    ]
    # channel progression from unet/mod.rs:42-56
    assert [(s.c_in, s.c_out) for s in specs if s.kind == "res"] == [
        (320, 320), (320, 320), (320, 640), (640, 640),
        (640, 1280), (1280, 1280), (1280, 1280), (1280, 1280),
    ]


def test_sd_v14_output_block_names_match_reference():
    specs, skip_chans = build_output_specs(SD_V1_4.unet)
    assert [s.name for s in specs] == [
        "r1", "r2", "ru", "rt1", "rt2", "rtu1", "rt3", "rt4", "rtu2", "rt5", "rt6", "rt7",
    ]
    # concatenated input channels from unet/mod.rs:61-72
    assert [s.c_in for s in specs] == [
        2560, 2560, 2560, 2560, 2560, 1920, 1920, 1280, 960, 960, 640, 640,
    ]
    assert [s.c_out for s in specs] == [
        1280, 1280, 1280, 1280, 1280, 1280, 640, 640, 640, 320, 320, 320,
    ]
    assert [s.upsample for s in specs] == [
        False, False, True, False, False, True, False, False, True, False, False, False,
    ]


def test_clip_shapes_and_causality():
    params = init_clip(jax.random.PRNGKey(0), TINY_CLIP)
    tokens = jnp.asarray(np.random.default_rng(0).integers(0, 100, (2, 9)))
    out = clip_apply(params, tokens, TINY_CLIP)
    assert out.shape == (2, 9, 32)

    # causality: perturbing a later token must not change earlier outputs
    tokens2 = tokens.at[:, 5].set((tokens[:, 5] + 1) % 100)
    out2 = clip_apply(params, tokens2, TINY_CLIP)
    np.testing.assert_allclose(out[:, :5], out2[:, :5], atol=1e-5)
    assert np.abs(np.asarray(out[:, 5:]) - np.asarray(out2[:, 5:])).max() > 1e-4


def test_clip_padding_does_not_affect_valid_positions():
    params = init_clip(jax.random.PRNGKey(0), TINY_CLIP)
    rng = np.random.default_rng(1)
    toks = rng.integers(0, 100, (1, 7))
    out_short = clip_apply(params, jnp.asarray(toks), TINY_CLIP)
    padded = np.zeros((1, 16), np.int64)
    padded[:, :7] = toks
    out_pad = clip_apply(params, jnp.asarray(padded), TINY_CLIP)
    np.testing.assert_allclose(out_short[0], out_pad[0, :7], atol=1e-5)


def test_unet_shapes():
    params = init_unet(jax.random.PRNGKey(0), TINY_UNET)
    x = jnp.zeros((2, 16, 16, 4))
    ctx = jnp.zeros((2, 7, 24))
    out = unet_apply(params, x, jnp.asarray([999]), ctx, TINY_UNET)
    assert out.shape == (2, 16, 16, 4)


def test_unet_padded_context_equivalence():
    """Static-shape fast path: padded context + ctx_valid must equal the
    reference's variable-length unpadded cross-attention."""
    params = init_unet(jax.random.PRNGKey(0), TINY_UNET)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 4)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 5, 24)), jnp.float32)

    out_ref = unet_apply(params, x, jnp.asarray([42]), ctx, TINY_UNET)

    ctx_pad = jnp.zeros((1, 12, 24), jnp.float32).at[:, :5].set(ctx)
    valid = jnp.zeros((1, 12), bool).at[:, :5].set(True)
    out_fast = unet_apply(params, x, jnp.asarray([42]), ctx_pad, TINY_UNET, ctx_valid=valid)
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_fast), atol=1e-4)


def test_vae_roundtrip_shapes():
    params = init_autoencoder(jax.random.PRNGKey(0), TINY_VAE)
    img = jnp.zeros((1, 32, 32, 3))
    z = encode_image(params, img, TINY_VAE)
    assert z.shape == (1, 4, 4, 4)
    out = decode_latent(params, z, TINY_VAE)
    assert out.shape == (1, 32, 32, 3)


def test_v2_head_derivation():
    cfg = UNetConfig(context_dim=1024, head_dim=64)
    assert cfg.heads_for(320) == 5
    assert cfg.heads_for(640) == 10
    assert cfg.heads_for(1280) == 20


def test_v2_style_unet_runs():
    """head_dim-derived heads (SD v2 style) + 1024-dim context end to end
    on a tiny config."""
    cfg = UNetConfig(
        model_channels=32,
        channel_mult=(1, 2),
        attention_levels=(0,),
        head_dim=16,  # -> 2 heads at 32ch, 4 at 64ch
        context_dim=48,
        time_embed_dim=128,
        groupnorm_groups=8,
    )
    specs = build_input_specs(cfg)
    assert [s.n_head for s in specs if s.transformer] == [2, 2]
    params = init_unet(jax.random.PRNGKey(0), cfg)
    out = unet_apply(params, jnp.zeros((1, 8, 8, 4)), jnp.asarray([5]),
                     jnp.zeros((1, 7, 48)), cfg)
    assert out.shape == (1, 8, 8, 4)
