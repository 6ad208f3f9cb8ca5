"""Fused GN+SiLU+conv3x3(+residual) Pallas kernel vs the reference-formula
composition (interpret mode on CPU).

Oracle: sdtpu.ops.conv2d(padding=1) over silu(group_norm(x)) — the exact
ResnetBlock dataflow of src/model/autoencoder/mod.rs:513-529 and
src/model/unet/mod.rs:713-733.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdtpu.ops import conv2d, group_norm, silu
from sdtpu.ops.fused_conv import (
    conv3x3_fused,
    gn_scale_bias,
    stats_scale_bias,
)

RNG = np.random.default_rng(1)


def _rand(shape, dtype=jnp.float32):
    return jnp.asarray(RNG.standard_normal(shape), dtype)


def _conv_params(cin, cout):
    return {"w": _rand((3, 3, cin, cout)) * 0.1, "b": _rand((cout,))}


@pytest.mark.parametrize("shape,cout,block_h", [
    ((2, 16, 16, 128), 128, 0),    # single row block
    ((1, 32, 16, 128), 256, 8),    # multi-block: halo rows exercised
    ((2, 24, 8, 256), 128, 8),     # C != Co both ways
])
def test_plain_conv_matches(shape, cout, block_h):
    x = _rand(shape)
    p = _conv_params(shape[-1], cout)
    want = conv2d(p, x, padding=1)
    got = conv3x3_fused(x, p["w"], p["b"], block_h=block_h, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("block_h", [0, 8])
def test_gn_silu_prologue(block_h):
    """Prologue path == conv2d(silu(group_norm(x))), incl. the halo-row
    masking (silu(bias) must not leak into the zero padding)."""
    x = _rand((2, 32, 16, 128))
    g, b = _rand((128,)), _rand((128,))
    p = _conv_params(128, 128)
    want = conv2d(p, silu(group_norm(x, g, b, 32, 1e-6)), padding=1)
    s, o = gn_scale_bias(x, g, b, 32, 1e-6, interpret=True)
    got = conv3x3_fused(x, p["w"], p["b"], s, o,
                        block_h=block_h, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_full_resnet_chain():
    """Two chained kernels + emitted stats == the unfused ResnetBlock."""
    cfg_groups, eps = 32, 1e-6
    x = _rand((2, 16, 16, 128))
    g1, b1 = _rand((128,)), _rand((128,))
    g2, b2 = _rand((256,)), _rand((256,))
    p1 = _conv_params(128, 256)
    p2 = _conv_params(256, 256)
    pskip = {"w": _rand((1, 1, 128, 256)) * 0.1, "b": _rand((256,))}

    # oracle: the reference ResnetBlock dataflow
    h = conv2d(p1, silu(group_norm(x, g1, b1, cfg_groups, eps)), padding=1)
    h = conv2d(p2, silu(group_norm(h, g2, b2, cfg_groups, eps)), padding=1)
    want = conv2d(pskip, x, padding=0) + h

    s1, o1 = gn_scale_bias(x, g1, b1, cfg_groups, eps, interpret=True)
    h1, st = conv3x3_fused(x, p1["w"], p1["b"], s1, o1,
                           emit_stats=True, block_h=8, interpret=True)
    s2, o2 = stats_scale_bias(st, 16 * 16, g2, b2, cfg_groups, eps)
    res = conv2d(pskip, x, padding=0)
    got = conv3x3_fused(h1, p2["w"], p2["b"], s2, o2, residual=res,
                        block_h=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)


def test_emitted_stats_match_direct():
    """emit_stats partials == per-channel (sum, sum^2) of the output."""
    x = _rand((1, 16, 8, 128))
    p = _conv_params(128, 128)
    y, st = conv3x3_fused(x, p["w"], p["b"], emit_stats=True,
                          block_h=8, interpret=True)
    yf = np.asarray(y, np.float64).reshape(-1, 128)
    np.testing.assert_allclose(np.asarray(st[0, 0]), yf.sum(0), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(st[0, 1]), (yf * yf).sum(0),
                               rtol=1e-4)


@pytest.mark.parametrize("shape,cout,block_h", [
    ((2, 16, 16, 128), 128, 0),
    ((1, 32, 8, 128), 256, 8),     # multi-block halo, C != Co
])
def test_upsample2x_conv_fused(shape, cout, block_h):
    """Subpixel Pallas kernel == conv3x3(nearest_upsample_2x(x))."""
    from sdtpu.ops.conv import nearest_upsample_2x
    from sdtpu.ops.fused_conv import upsample2x_conv_fused

    x = _rand(shape)
    p = _conv_params(shape[-1], cout)
    want = conv2d(p, nearest_upsample_2x(x), padding=1)
    got = upsample2x_conv_fused(x, p["w"], p["b"], block_h=block_h,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_decode_stats_threading(monkeypatch):
    """decode_latent's fused path (resnet chain + subpixel upsample +
    stats threading between every block) == the plain XLA path, end to
    end on CPU via interpret-mode kernels."""
    import functools as ft

    import sdtpu.ops.dispatch as dispatch
    import sdtpu.ops.fused_conv as fc
    import sdtpu.ops.fused_groupnorm as fg
    from sdtpu.config import AutoencoderConfig
    from sdtpu.models import vae as V

    cfg = AutoencoderConfig(
        in_channels=3, latent_channels=4,
        encoder_channels=((128, 128), (128, 128)),
        decoder_channels=((128, 128), (128, 128)),
        groupnorm_groups=32, groupnorm_eps=1e-6)
    params = V.init_autoencoder(jax.random.PRNGKey(0), cfg, jnp.float32)
    z = _rand((1, 8, 8, 4)) * 0.5

    want = V.decode_latent(params, z, cfg)  # CPU -> XLA path

    monkeypatch.setenv("SDTPU_FUSED_CONV_MIN_ROWS", "1")
    monkeypatch.setenv("SDTPU_FUSED_UP_MIN_ROWS", "1")
    monkeypatch.setattr(dispatch, "use_pallas", lambda: True)
    monkeypatch.setattr(fc, "conv3x3_fused",
                        ft.partial(fc.conv3x3_fused, interpret=True))
    monkeypatch.setattr(fc, "upsample2x_conv_fused",
                        ft.partial(fc.upsample2x_conv_fused, interpret=True))
    monkeypatch.setattr(fc, "gn_scale_bias",
                        ft.partial(fc.gn_scale_bias, interpret=True))
    monkeypatch.setattr(fg, "group_norm_silu",
                        ft.partial(fg.group_norm_silu, interpret=True))
    got = V.decode_latent(params, z, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_unet_resblock_emb_folding(monkeypatch):
    """UNet ResBlock fused path (timestep-emb add folded into the stats
    shift + prologue affine, never materialised) == the unfused path."""
    import functools as ft

    import sdtpu.ops.dispatch as dispatch
    import sdtpu.ops.fused_conv as fc
    from sdtpu.config import UNetConfig
    from sdtpu.models import unet as U

    cfg = UNetConfig()
    p = U._init_res_block(jax.random.PRNGKey(3), 96, cfg.time_embed_dim,
                          64, jnp.float32)
    x = _rand((2, 16, 16, 96))
    emb = _rand((2, cfg.time_embed_dim))

    want = U._res_block_apply(p, x, emb, cfg)  # CPU -> XLA path

    monkeypatch.setenv("SDTPU_FUSED_CONV_MIN_ROWS", "1")
    monkeypatch.setenv("SDTPU_FUSED_UNET_MIN_ROWS", "1")
    monkeypatch.setattr(dispatch, "use_pallas", lambda: True)
    monkeypatch.setattr(fc, "conv3x3_fused",
                        ft.partial(fc.conv3x3_fused, interpret=True))
    monkeypatch.setattr(fc, "gn_scale_bias",
                        ft.partial(fc.gn_scale_bias, interpret=True))
    got = U._res_block_apply(p, x, emb, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_conv1x1_fused_matches():
    """conv1x1_fused (GN prologue + residual + stats) == the unfused
    GroupNorm -> 1x1 conv -> residual composition."""
    from sdtpu.ops.fused_conv import conv1x1_fused

    x = _rand((2, 8, 8, 128))
    g, b = _rand((128,)), _rand((128,))
    w = _rand((128, 64)) * 0.1
    cb = _rand((64,))
    res = _rand((2, 8, 8, 64))
    want = conv2d({"w": w[None, None], "b": cb},
                  group_norm(x, g, b, 32, 1e-6), padding=0) + res
    s, o = gn_scale_bias(x, g, b, 32, 1e-6, interpret=True)
    got, st = conv1x1_fused(x, w, cb, s, o, residual=res, emit_stats=True,
                            block_r=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    yf = np.asarray(want, np.float64).reshape(2, -1, 64)
    np.testing.assert_allclose(np.asarray(st[:, 0]), yf.sum(1), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(st[:, 1]), (yf * yf).sum(1),
                               rtol=1e-4)


def test_unet_transformer_fused_projections(monkeypatch):
    """Full SpatialTransformer with fused GN+proj_in entry (stats threaded
    from the preceding ResBlock) and proj_out+residual exit == XLA path."""
    import functools as ft

    import sdtpu.ops.dispatch as dispatch
    import sdtpu.ops.fused_conv as fc
    from sdtpu.config import UNetConfig
    from sdtpu.models import unet as U

    cfg = UNetConfig()
    key = jax.random.PRNGKey(4)
    c, n_head = 64, 4
    p = {
        "res": U._init_res_block(key, c, cfg.time_embed_dim, c, jnp.float32),
        "transformer": U._init_transformer(key, c, cfg.context_dim,
                                           jnp.float32),
    }
    spec = U.BlockSpec("rt1", "res", c, c, transformer=True, n_head=n_head)
    x = _rand((2, 16, 16, c))
    emb = _rand((2, cfg.time_embed_dim))
    ctx = _rand((2, 77, cfg.context_dim))

    want = U._block_apply(p, spec, x, emb, ctx, cfg, None)

    monkeypatch.setenv("SDTPU_FUSED_CONV_MIN_ROWS", "1")
    monkeypatch.setenv("SDTPU_FUSED_UNET_MIN_ROWS", "1")
    monkeypatch.setattr(dispatch, "use_pallas", lambda: True)
    monkeypatch.setattr(fc, "conv3x3_fused",
                        ft.partial(fc.conv3x3_fused, interpret=True))
    monkeypatch.setattr(fc, "conv1x1_fused",
                        ft.partial(fc.conv1x1_fused, interpret=True))
    monkeypatch.setattr(fc, "gn_scale_bias",
                        ft.partial(fc.gn_scale_bias, interpret=True))
    # keep attention/MLP sublayers on the XLA path (separately tested)
    monkeypatch.setattr(U, "_use_fused_attn", lambda *a: False)
    monkeypatch.setattr(U, "_use_fused_xattn", lambda *a: False)
    got = U._block_apply(p, spec, x, emb, ctx, cfg, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_bf16_path():
    x = _rand((1, 16, 16, 128), jnp.bfloat16)
    g, b = jnp.ones(128, jnp.bfloat16), jnp.zeros(128, jnp.bfloat16)
    p = {"w": _rand((3, 3, 128, 128), jnp.bfloat16) * 0.1,
         "b": _rand((128,), jnp.bfloat16)}
    want = conv2d(p, silu(group_norm(x, g, b, 32, 1e-6)), padding=1)
    s, o = gn_scale_bias(x, g, b, 32, 1e-6, interpret=True)
    got = conv3x3_fused(x, p["w"], p["b"], s, o, block_h=8, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=5e-2, atol=5e-2)


def test_dual_input_conv_matches_concat():
    """conv3x3_fused(x, ..., x2=skip) == conv3x3 over the explicit
    channel-concat (the skip-concat fold: conv of a concat is the sum of
    two convs over the parts)."""
    x = _rand((2, 16, 16, 128))
    skip = _rand((2, 16, 16, 64))
    p = _conv_params(192, 96)

    want = conv2d(p, jnp.concatenate([x, skip], axis=-1), padding=1)
    got = conv3x3_fused(x, p["w"], p["b"], silu=False, block_h=8,
                        interpret=True, x2=skip)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_dual_input_gn_prologue_and_stats():
    """Dual-input with the folded GroupNorm prologue split across the two
    channel parts + emitted stats == gn+silu+conv over the concat."""
    from sdtpu.ops.fused_groupnorm import channel_partials

    x = _rand((1, 24, 16, 128))
    skip = _rand((1, 24, 16, 128))
    cat = jnp.concatenate([x, skip], axis=-1)
    g, b = _rand((256,)), _rand((256,))
    p = _conv_params(256, 128)

    h = group_norm(cat, g, b, 32, 1e-5)
    want = conv2d(p, silu(h), padding=1)

    sums = jnp.concatenate([channel_partials(x, interpret=True),
                            channel_partials(skip, interpret=True)], axis=-1)
    s, o = stats_scale_bias(sums, 24 * 16, g, b, 32, 1e-5)
    got, st = conv3x3_fused(x, p["w"], p["b"], s[:, :128], o[:, :128],
                            emit_stats=True, block_h=8, interpret=True,
                            x2=skip, prologue_scale2=s[:, 128:],
                            prologue_bias2=o[:, 128:])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    wf = np.asarray(want, np.float64)
    np.testing.assert_allclose(np.asarray(st[:, 0]),
                               wf.sum(axis=(1, 2)), rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(st[:, 1]),
                               (wf * wf).sum(axis=(1, 2)), rtol=1e-3,
                               atol=1e-2)


def test_unet_resblock_skip_fold(monkeypatch):
    """Up-path ResBlock with a separately-passed skip (fused: concat
    never materialised, 1x1 skip_connection as two matmuls) == the XLA
    path over the explicit concat."""
    import functools as ft

    import sdtpu.ops.dispatch as dispatch
    import sdtpu.ops.fused_conv as fc
    import sdtpu.ops.fused_groupnorm as fgn
    from sdtpu.config import UNetConfig
    from sdtpu.models import unet as U

    cfg = UNetConfig()
    p = U._init_res_block(jax.random.PRNGKey(5), 192, cfg.time_embed_dim,
                          96, jnp.float32)
    x = _rand((2, 16, 16, 128))
    skip = _rand((2, 16, 16, 64))
    emb = _rand((2, cfg.time_embed_dim))

    want = U._res_block_apply(p, x, emb, cfg, skip=skip)  # CPU -> XLA path

    monkeypatch.setenv("SDTPU_FUSED_CONV_MIN_ROWS", "1")
    monkeypatch.setenv("SDTPU_FUSED_UNET_MIN_ROWS", "1")
    monkeypatch.setattr(dispatch, "use_pallas", lambda: True)
    monkeypatch.setattr(fc, "conv3x3_fused",
                        ft.partial(fc.conv3x3_fused, interpret=True))
    monkeypatch.setattr(fc, "gn_scale_bias",
                        ft.partial(fc.gn_scale_bias, interpret=True))
    monkeypatch.setattr(fgn, "channel_partials",
                        ft.partial(fgn.channel_partials, interpret=True))
    got = U._res_block_apply(p, x, emb, cfg, skip=skip)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
