"""KL autoencoder f=8 (reference: src/model/autoencoder/mod.rs).

NHWC pure-function port: encoder (2 ResnetBlocks per level + asymmetric
(0,1,0,1) stride-2 downsample), Mid (Res + single-head conv self-attention
over h*w tokens + Res), decoder (3 ResnetBlocks per level + nearest-2x
upsample + conv). `encode_image` keeps the first 4 of 8 quant channels
(means only, no sampling) — autoencoder/mod.rs:60-66.

The reference's PaddedConv2d over-pad/slice contraption
(autoencoder/mod.rs:326-412) is replaced by lax explicit asymmetric
padding (see sdtpu/ops/conv.py). Param tree keys mirror the npy dump
layout (autoencoder/load.rs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sdtpu.config import AutoencoderConfig
from sdtpu.models import rng
from sdtpu.models.initializers import init_conv2d, init_norm
from sdtpu.ops import conv2d, group_norm, qkv_attention, silu
from sdtpu.ops.groupnorm import group_norm_silu_op
from sdtpu.ops.conv import upsample2x_conv


# ---------------------------------------------------------------- init

def _init_resnet(key, n_in, n_out, dtype):
    k1, k2, k3 = rng.split(key, 3)
    p = {
        "norm1": init_norm(n_in, dtype),
        "conv1": init_conv2d(k1, n_in, n_out, 3, dtype=dtype),
        "norm2": init_norm(n_out, dtype),
        "conv2": init_conv2d(k2, n_out, n_out, 3, dtype=dtype),
    }
    if n_in != n_out:
        p["nin_shortcut"] = init_conv2d(k3, n_in, n_out, 1, dtype=dtype)
    return p


def _init_attn(key, ch, dtype):
    kq, kk, kv, ko = rng.split(key, 4)
    return {
        "norm": init_norm(ch, dtype),
        "q": init_conv2d(kq, ch, ch, 1, dtype=dtype),
        "k": init_conv2d(kk, ch, ch, 1, dtype=dtype),
        "v": init_conv2d(kv, ch, ch, 1, dtype=dtype),
        "proj_out": init_conv2d(ko, ch, ch, 1, dtype=dtype),
    }


def _init_mid(key, ch, dtype):
    k1, k2, k3 = rng.split(key, 3)
    return {
        "block_1": _init_resnet(k1, ch, ch, dtype),
        "attn": _init_attn(k2, ch, dtype),
        "block_2": _init_resnet(k3, ch, ch, dtype),
    }


def init_autoencoder(key, cfg: AutoencoderConfig, dtype=jnp.float32):
    ke, kd, kq, kp = rng.split(key, 4)

    # encoder
    enc_blocks = []
    keys = rng.split(ke, len(cfg.encoder_channels) + 4)
    for i, (cin, cout) in enumerate(cfg.encoder_channels):
        kb1, kb2, kds = rng.split(keys[i], 3)
        blk = {
            "res1": _init_resnet(kb1, cin, cout, dtype),
            "res2": _init_resnet(kb2, cout, cout, dtype),
        }
        if i != len(cfg.encoder_channels) - 1:
            blk["downsampler"] = {"conv": init_conv2d(kds, cout, cout, 3, dtype=dtype)}
        enc_blocks.append(blk)
    c0 = cfg.encoder_channels[0][1]
    c_final = cfg.encoder_channels[-1][1]
    z = 2 * cfg.latent_channels if cfg.double_z else cfg.latent_channels
    encoder = {
        "conv_in": init_conv2d(keys[-4], cfg.in_channels, c0, 3, dtype=dtype),
        "blocks": enc_blocks,
        "mid": _init_mid(keys[-3], c_final, dtype),
        "norm_out": init_norm(c_final, dtype),
        "conv_out": init_conv2d(keys[-2], c_final, z, 3, dtype=dtype),
    }

    # decoder
    dec_blocks = []
    keys = rng.split(kd, len(cfg.decoder_channels) + 4)
    for i, (cin, cout) in enumerate(cfg.decoder_channels):
        kb1, kb2, kb3, kus = rng.split(keys[i], 4)
        blk = {
            "res1": _init_resnet(kb1, cin, cout, dtype),
            "res2": _init_resnet(kb2, cout, cout, dtype),
            "res3": _init_resnet(kb3, cout, cout, dtype),
        }
        if i != len(cfg.decoder_channels) - 1:
            blk["upsampler"] = init_conv2d(kus, cout, cout, 3, dtype=dtype)
        dec_blocks.append(blk)
    d0 = cfg.decoder_channels[0][0]
    d_final = cfg.decoder_channels[-1][1]
    decoder = {
        "conv_in": init_conv2d(keys[-4], cfg.latent_channels, d0, 3, dtype=dtype),
        "mid": _init_mid(keys[-3], d0, dtype),
        "blocks": dec_blocks,
        "norm_out": init_norm(d_final, dtype),
        "conv_out": init_conv2d(keys[-2], d_final, cfg.in_channels, 3, dtype=dtype),
    }

    return {
        "encoder": encoder,
        "decoder": decoder,
        "quant_conv": init_conv2d(kq, z, z, 1, dtype=dtype),
        "post_quant_conv": init_conv2d(kp, cfg.latent_channels, cfg.latent_channels, 1, dtype=dtype),
    }


# ---------------------------------------------------------------- apply

def _use_fused_resnet(x, cout: int) -> bool:
    """Measured dispatch (benchmarks/conv_micro.py, v5e): XLA's conv3x3
    lowering degrades on large-spatial/small-channel maps (69 TF/s at
    512^2 x 128, 111 TF/s at 256^2 x 256), and the unfused ResnetBlock
    pays ~13 HBM passes; the fused GN+SiLU+conv kernel chain
    (ops/fused_conv.py) wins at every measured VAE shape: resnet ms
    XLA->fused 15.45->6.39 (512^2x128), 9.80->3.46 (256^2x256),
    5.06->4.29 (128^2x512), 1.61->1.10 (64^2x512).
    SDTPU_FUSED_CONV_MIN_ROWS overrides the threshold (tests use it)."""
    import os

    from sdtpu.ops.dispatch import use_pallas

    b, h, w, c = x.shape
    min_rows = int(os.environ.get("SDTPU_FUSED_CONV_MIN_ROWS", str(1 << 12)))
    return (use_pallas() and c % 128 == 0 and cout % 128 == 0
            and h % 8 == 0 and h * w >= min_rows)


def _resnet_apply(p, x, cfg, in_stats=None, emit_stats=False):
    """ResnetBlock (autoencoder/mod.rs:513-529). in_stats: optional
    [B, 2, C] per-channel (sum, sum^2) of x from the PREVIOUS fused
    kernel — skips the GroupNorm stats read. When emit_stats, returns
    (out, stats-of-out) with stats None on the unfused path; callers
    thread them through the decoder (`decode_latent`)."""
    cout = p["conv1"]["w"].shape[-1]
    if _use_fused_resnet(x, cout):
        from sdtpu.ops.fused_conv import (conv3x3_fused, gn_scale_bias,
                                          stats_scale_bias)

        rows = x.shape[1] * x.shape[2]
        if in_stats is not None:
            s1, o1 = stats_scale_bias(in_stats, rows, p["norm1"]["g"],
                                      p["norm1"]["b"], cfg.groupnorm_groups,
                                      cfg.groupnorm_eps)
        else:
            s1, o1 = gn_scale_bias(x, p["norm1"]["g"], p["norm1"]["b"],
                                   cfg.groupnorm_groups, cfg.groupnorm_eps)
        h1, st = conv3x3_fused(x, p["conv1"]["w"], p["conv1"]["b"], s1, o1,
                               emit_stats=True)
        s2, o2 = stats_scale_bias(st, rows, p["norm2"]["g"], p["norm2"]["b"],
                                  cfg.groupnorm_groups, cfg.groupnorm_eps)
        res = conv2d(p["nin_shortcut"], x, padding=0) if "nin_shortcut" in p else x
        # conv3x3_fused returns (y, stats) when emit_stats else y
        return conv3x3_fused(h1, p["conv2"]["w"], p["conv2"]["b"], s2, o2,
                             residual=res, emit_stats=emit_stats)
    h = group_norm_silu_op(x, p["norm1"]["g"], p["norm1"]["b"], cfg.groupnorm_groups, cfg.groupnorm_eps)
    h = conv2d(p["conv1"], h, padding=1)
    h = group_norm_silu_op(h, p["norm2"]["g"], p["norm2"]["b"], cfg.groupnorm_groups, cfg.groupnorm_eps)
    h = conv2d(p["conv2"], h, padding=1)
    if "nin_shortcut" in p:
        x = conv2d(p["nin_shortcut"], x, padding=0)
    y = x + h
    return (y, None) if emit_stats else y


def _attn_apply(p, x, cfg):
    """Single-head self-attention over h*w tokens with 1x1-conv q/k/v
    (autoencoder/mod.rs:553-608)."""
    b, h, w, c = x.shape
    hn = group_norm(x, p["norm"]["g"], p["norm"]["b"], cfg.groupnorm_groups, cfg.groupnorm_eps)
    q = conv2d(p["q"], hn, padding=0).reshape(b, h * w, c)
    k = conv2d(p["k"], hn, padding=0).reshape(b, h * w, c)
    v = conv2d(p["v"], hn, padding=0).reshape(b, h * w, c)
    o = qkv_attention(q, k, v, None, n_head=1).reshape(b, h, w, c)
    return x + conv2d(p["proj_out"], o, padding=0)


def _mid_apply(p, x, cfg, emit_stats=False):
    x = _resnet_apply(p["block_1"], x, cfg)
    x = _attn_apply(p["attn"], x, cfg)
    return _resnet_apply(p["block_2"], x, cfg, emit_stats=emit_stats)


def encoder_apply(params, x, cfg: AutoencoderConfig):
    """x: [B, H, W, 3] -> latent moments [B, H/8, W/8, 2*latent]."""
    p = params["encoder"]
    x = conv2d(p["conv_in"], x, padding=1)
    n = len(p["blocks"])
    for i, blk in enumerate(p["blocks"]):
        x = _resnet_apply(blk["res1"], x, cfg)
        x = _resnet_apply(blk["res2"], x, cfg)
        if "downsampler" in blk:
            # asymmetric (0,1,0,1) pad, stride 2 (autoencoder/mod.rs:231)
            x = conv2d(blk["downsampler"]["conv"], x, stride=2, padding=((0, 1), (0, 1)))
    x = _mid_apply(p["mid"], x, cfg)
    x = group_norm_silu_op(x, p["norm_out"]["g"], p["norm_out"]["b"], cfg.groupnorm_groups, cfg.groupnorm_eps)
    return conv2d(p["conv_out"], x, padding=1)


def encode_image(params, x, cfg: AutoencoderConfig):
    """Full encode path: encoder -> quant_conv -> keep first `latent`
    channels (the means; no sampling) — autoencoder/mod.rs:60-66."""
    moments = encoder_apply(params, x, cfg)
    latent = conv2d(params["quant_conv"], moments, padding=0)
    return latent[..., : cfg.latent_channels]


def decode_latent(params, z, cfg: AutoencoderConfig):
    """z: [B, h, w, latent] -> image [B, 8h, 8w, 3] in [-1, 1].

    On the fused-kernel path, every block emits the per-channel
    (sum, sum^2) of its own f32 output and the next block's GroupNorm
    consumes it — the statistics read of each GroupNorm rides the
    previous kernel's write for free."""
    from sdtpu.ops.conv import use_fused_upsample

    z = conv2d(params["post_quant_conv"], z, padding=0)
    p = params["decoder"]
    x = conv2d(p["conv_in"], z, padding=1)
    x, st = _mid_apply(p["mid"], x, cfg, emit_stats=True)
    for blk in p["blocks"]:
        x, st = _resnet_apply(blk["res1"], x, cfg, in_stats=st, emit_stats=True)
        x, st = _resnet_apply(blk["res2"], x, cfg, in_stats=st, emit_stats=True)
        x, st = _resnet_apply(blk["res3"], x, cfg, in_stats=st, emit_stats=True)
        if "upsampler" in blk:
            # fused subpixel form of nearest-2x + conv3x3 (see ops/conv.py)
            w = blk["upsampler"]["w"]
            bb, hh, ww, cc = x.shape
            if use_fused_upsample(hh, ww, cc, w.shape[-1]):
                from sdtpu.ops.fused_conv import upsample2x_conv_fused

                x, st = upsample2x_conv_fused(x, w, blk["upsampler"]["b"],
                                              emit_stats=True)
            else:
                x = upsample2x_conv(blk["upsampler"], x)
                st = None
    x = group_norm_silu_op(x, p["norm_out"]["g"], p["norm_out"]["b"],
                           cfg.groupnorm_groups, cfg.groupnorm_eps,
                           in_stats=st)
    return conv2d(p["conv_out"], x, padding=1)
