"""Fused GroupNorm+SiLU+conv3x3(+residual) Pallas TPU kernel.

Why: XLA's conv lowering degrades on the VAE decoder's large-spatial /
small-channel maps — measured 66.6 TF/s at 512^2 x 128 and 103 TF/s at
256^2 x 256 (benchmarks/vae_breakdown.py, v5e) vs ~198 TF/s at 64^2 —
and every ResnetBlock (reference: src/model/autoencoder/mod.rs:513-529)
pays ~13 HBM passes over the map (GN stats, normalize write, conv read/
write, twice, plus the residual add). This kernel computes

    y = conv3x3(silu(x * scale + bias)) [+ conv_bias] [+ residual]

in ONE pass over x: the GroupNorm normalize (folded to a per-(batch,
channel) scale/bias computed from separately-reduced statistics) and the
SiLU happen in VMEM on load, the 3x3 conv is 9 shifted-tap matmuls on the
MXU accumulating in f32, and the kernel can emit per-block (sum, sum^2)
partials of its OWN f32 output so the next GroupNorm's statistics cost no
extra HBM read. A full ResnetBlock is then 2 kernel calls + one stats
read (~6 passes) instead of ~13, with the conv matmuls at full MXU
contraction (C = 128/256/512 lanes).

Halo handling: no spatial pre-pad in HBM. The grid tiles rows; each
program receives its aligned [bh, W, C] row block plus a [2, W, C] halo
(the row above and the row below, gathered once outside as a tiny
[B, nblk, 2, W, C] tensor). Column padding is a zero-column concat in
VMEM. Synthetic halo rows (outside the image) are zeroed AFTER the
prologue via a row-validity mask, so silu(bias) never leaks into the
padding.

Statistics are f32; the emitted output stats are computed from the f32
accumulator (before the bf16 store), so a chained GroupNorm matches the
unfused oracle within fp tolerance (tests/test_fused_conv.py pins it).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_part(x_ref, hal_ref, w_ref, ps_ref, pb_ref, acc, *, j, bh, W, H,
               silu, prologue, kpack=False):
    """Accumulate the 9 shifted-tap matmuls of one input tensor into acc.

    conv3x3(concat([a, b], channels)) == conv3x3(a, W[:, :, :Ca]) +
    conv3x3(b, W[:, :, Ca:]), so a channel-concat input is just this
    function called once per part — the concat itself never exists,
    in HBM or VMEM (the skip-concat fold of the UNet up path).
    """
    cdt = x_ref.dtype
    top = hal_ref[0, 0, 0:1]     # row j*bh - 1 (zeros-synthetic at j=0)
    bot = hal_ref[0, 0, 1:2]     # row j*bh + bh (zeros-synthetic at last j)
    xin = jnp.concatenate([top, x_ref[0], bot], axis=0)  # [bh+2, W, C]

    if prologue:
        xf = xin.astype(jnp.float32) * ps_ref[0] + pb_ref[0]
        if silu:
            xf = xf * jax.nn.sigmoid(xf)
        # zero synthetic halo rows: global input row = j*bh - 1 + r
        gr = j * bh - 1 + jax.lax.broadcasted_iota(jnp.int32, (bh + 2, 1, 1), 0)
        xf = jnp.where((gr >= 0) & (gr < H), xf, 0.0)
        xin = xf.astype(cdt)
    # zero-column pad for the dx = 0 / 2 taps
    zc = jnp.zeros((bh + 2, 1, xin.shape[-1]), cdt)
    xp = jnp.concatenate([zc, xin, zc], axis=1)  # [bh+2, W+2, C]

    # hoist the 3 column shifts out of the tap loop: 3 sublane-shift
    # copies instead of 9; the dy slices below index the UNTILED leading
    # dim (free views), and the 3-D dot keeps [bh, W] as M dims with no
    # reshape relayout
    if kpack:
        # K-packed variant: stack the 3 row shifts along channels and run
        # 3 dots at K=3C instead of 9 at K=C — trades one [bh, W+2, 3C]
        # VMEM concat for 6 fewer f32 accumulator read/write rounds.
        # w_ref here is [3, 3C, Co] (dx-major; rows stacked on K).
        xcat = jnp.concatenate([xp[dy:dy + bh] for dy in range(3)], axis=-1)
        for dx in range(3):
            acc = acc + jax.lax.dot_general(
                xcat[:, dx:dx + W], w_ref[dx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return acc
    xcols = [xp[:, dx:dx + W, :] for dx in range(3)]
    for dy in range(3):
        for dx in range(3):
            acc = acc + jax.lax.dot_general(
                xcols[dx][dy:dy + bh], w_ref[dy, dx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    return acc


def _kernel(x_ref, hal_ref, x2_ref, hal2_ref, w_ref, w2_ref, cb_ref,
            ps_ref, pb_ref, ps2_ref, pb2_ref, res_ref,
            o_ref, st_ref, *, bh, W, H, silu, prologue, residual,
            emit_stats, dual, kpack=False):
    j = pl.program_id(1)
    co = o_ref.shape[-1]
    acc = jnp.zeros((bh, W, co), jnp.float32)
    acc = _conv_part(x_ref, hal_ref, w_ref, ps_ref, pb_ref, acc,
                     j=j, bh=bh, W=W, H=H, silu=silu, prologue=prologue,
                     kpack=kpack)
    if dual:
        acc = _conv_part(x2_ref, hal2_ref, w2_ref, ps2_ref, pb2_ref, acc,
                         j=j, bh=bh, W=W, H=H, silu=silu, prologue=prologue,
                         kpack=kpack)
    acc = acc + cb_ref[0]
    if residual:
        acc = acc + res_ref[0].astype(jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)
    if emit_stats:
        st_ref[0, 0] = jnp.stack(
            [jnp.sum(acc, axis=(0, 1)), jnp.sum(acc * acc, axis=(0, 1))])


def _pick_bh(h, w, c, co, itemsize):
    """Largest row block that divides H and keeps the working set
    (x in + col-pad copy + f32 acc + out + residual, double-buffered
    inputs) under ~72MB of VMEM."""
    budget = 72 * 1024 * 1024
    bh = min(h, 256)
    while bh > 8:
        need = (2 * bh * w * c * itemsize * 2      # x block (dbl-buffered)
                + bh * w * c * itemsize            # col-padded copy
                + bh * w * co * 4                  # f32 acc
                + 2 * bh * w * co * itemsize * 2   # out + residual
                )
        if h % bh == 0 and need <= budget:
            return bh
        bh //= 2
    return bh


def _build_halo(x, bh, nblk):
    """[B, nblk, 2, W, C]: [..., 0] = row j*bh - 1, [..., 1] = row j*bh + bh
    (zeros-synthetic outside the image)."""
    b, h, wd, c = x.shape
    zrow = jnp.zeros((b, 1, wd, c), x.dtype)
    if nblk > 1:
        top = jnp.concatenate([zrow, x[:, bh - 1:h - 1:bh]], axis=1)
        bot = jnp.concatenate([x[:, bh::bh], zrow], axis=1)
    else:
        top, bot = zrow, zrow
    return jnp.stack([top, bot], axis=2)


@functools.partial(jax.jit, static_argnames=("silu", "emit_stats", "block_h",
                                             "interpret", "kpack"))
def conv3x3_fused(x, w, conv_bias, prologue_scale=None, prologue_bias=None,
                  residual=None, silu: bool = True,
                  emit_stats: bool = False, block_h: int = 0,
                  interpret: bool = False, x2=None,
                  prologue_scale2=None, prologue_bias2=None,
                  kpack: bool = False):
    """x: [B, H, W, C] NHWC; w: [3, 3, C, Co] HWIO; conv_bias: [Co].

    prologue_scale/bias: optional [B, C] per-(batch, channel) affine
    applied (with optional SiLU) to x on load — pass the folded GroupNorm
    scale/bias from `gn_scale_bias` to fuse normalize+SiLU+conv.
    residual: optional [B, H, W, Co] added to the conv output.
    emit_stats: also return [B, 2, Co] per-channel (sum, sum^2) of the
    f32 conv output — feed `stats_scale_bias` to fold the NEXT GroupNorm.
    x2: optional second input [B, H, W, C2]; the kernel then computes
    conv3x3 over the IMPLICIT channel-concat [x, x2] with
    w: [3, 3, C+C2, Co] — the UNet up-path skip-concat never touches HBM
    (unet/mod.rs:205-216 pops + cats the skip before every up ResBlock).
    prologue_scale2/bias2: the x2 channel slice of the folded GroupNorm.

    Returns y [B, H, W, Co] (and stats if emit_stats).
    """
    b, h, wd, c = x.shape
    co = w.shape[-1]
    dual = x2 is not None
    c2 = x2.shape[-1] if dual else 0
    assert w.shape[:3] == (3, 3, c + c2), (w.shape, c, c2)
    prologue = prologue_scale is not None
    has_res = residual is not None

    bh = block_h or _pick_bh(h, wd, c + c2, co, x.dtype.itemsize)
    assert h % bh == 0, (h, bh)
    nblk = h // bh

    halo = _build_halo(x, bh, nblk)

    cdt = x.dtype

    def fold(ps_, pb_, cc):
        if prologue:
            return (ps_.astype(jnp.float32).reshape(b, 1, cc),
                    pb_.astype(jnp.float32).reshape(b, 1, cc))
        z = jnp.zeros((b, 1, cc), jnp.float32)
        return z, z

    def pack(wp):
        """[3, 3, Ck, Co] -> [3, 3Ck, Co], dx-major, rows stacked on K
        (matches the kernel's xcat channel order dy=0,1,2)."""
        return jnp.stack([jnp.concatenate([wp[0, dx], wp[1, dx], wp[2, dx]],
                                          axis=0) for dx in range(3)])

    ps, pb = fold(prologue_scale, prologue_bias, c)
    w1 = w[:, :, :c].astype(cdt)
    if kpack:
        w1 = pack(w1)
    if dual:
        xb = x2
        halo2 = _build_halo(x2, bh, nblk)
        ps2, pb2 = fold(prologue_scale2, prologue_bias2, c2)
        w2 = w[:, :, c:].astype(cdt)
        if kpack:
            w2 = pack(w2)
        x2_spec = pl.BlockSpec((1, bh, wd, c2), lambda i, j: (i, j, 0, 0))
        h2_spec = pl.BlockSpec((1, 1, 2, wd, c2), lambda i, j: (i, j, 0, 0, 0))
    else:
        xb = jnp.zeros((b, 1, 1, 8), cdt)
        halo2 = jnp.zeros((b, 1, 2, 1, 8), cdt)
        ps2 = pb2 = jnp.zeros((b, 1, 8), jnp.float32)
        w2 = (jnp.zeros((3, 24, co), cdt) if kpack
              else jnp.zeros((3, 3, 8, co), cdt))
        x2_spec = pl.BlockSpec((1, 1, 1, 8), lambda i, j: (i, 0, 0, 0))
        h2_spec = pl.BlockSpec((1, 1, 2, 1, 8), lambda i, j: (i, 0, 0, 0, 0))

    res = residual if has_res else jnp.zeros((b, 1, 1, co), cdt)
    res_spec = (pl.BlockSpec((1, bh, wd, co), lambda i, j: (i, j, 0, 0))
                if has_res else
                pl.BlockSpec((1, 1, 1, co), lambda i, j: (i, 0, 0, 0)))

    out_shapes = (jax.ShapeDtypeStruct((b, h, wd, co), cdt),
                  jax.ShapeDtypeStruct((b, nblk, 2, co), jnp.float32))
    outs = pl.pallas_call(
        functools.partial(_kernel, bh=bh, W=wd, H=h, silu=silu,
                          prologue=prologue, residual=has_res,
                          emit_stats=emit_stats, dual=dual, kpack=kpack),
        grid=(b, nblk),
        in_specs=[
            pl.BlockSpec((1, bh, wd, c), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 2, wd, c), lambda i, j: (i, j, 0, 0, 0)),
            x2_spec,
            h2_spec,
            (pl.BlockSpec((3, 3 * c, co), lambda i, j: (0, 0, 0)) if kpack
             else pl.BlockSpec((3, 3, c, co), lambda i, j: (0, 0, 0, 0))),
            (pl.BlockSpec(w2.shape, lambda i, j: (0, 0, 0)) if kpack
             else pl.BlockSpec((3, 3, w2.shape[2], co),
                               lambda i, j: (0, 0, 0, 0))),
            pl.BlockSpec((1, co), lambda i, j: (0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, ps2.shape[-1]), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, pb2.shape[-1]), lambda i, j: (i, 0, 0)),
            res_spec,
        ],
        out_specs=(pl.BlockSpec((1, bh, wd, co), lambda i, j: (i, j, 0, 0)),
                   pl.BlockSpec((1, 1, 2, co), lambda i, j: (i, j, 0, 0))),
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * wd * (c + c2) * co * 9,
            bytes_accessed=(b * h * wd * (c + c2 + co) + 9 * (c + c2) * co)
                           * cdt.itemsize,
            transcendentals=b * h * wd * (c + c2) if (prologue and silu) else 0,
        ),
        interpret=interpret,
    )(x, halo, xb, halo2, w1, w2, conv_bias.astype(jnp.float32)[None, :],
      ps, pb, ps2, pb2, res)
    y, stats = outs
    if emit_stats:
        return y, stats.sum(axis=1)  # [B, 2, Co]
    return y


def _up_kernel(x_ref, hal_ref, w_ref, cb_ref, o_ref, st_ref, *, bh, W, H,
               emit_stats):
    """Subpixel nearest-2x-upsample + conv3x3: 4 output phases, each a
    4-tap (2x2) shifted matmul over the INPUT-resolution block (see
    ops/conv.py upsample2x_conv for the tap algebra)."""
    j = pl.program_id(1)
    cdt = x_ref.dtype
    top = hal_ref[0, 0, 0:1]
    bot = hal_ref[0, 0, 1:2]
    xin = jnp.concatenate([top, x_ref[0], bot], axis=0)  # [bh+2, W, C]
    zc = jnp.zeros((bh + 2, 1, xin.shape[-1]), cdt)
    xp = jnp.concatenate([zc, xin, zc], axis=1)  # [bh+2, W+2, C]

    co = o_ref.shape[-1]
    # col offsets b+px span {0,1,2}: hoist the 3 sublane shifts like the
    # 3x3 kernel; dy slices are free views of the untiled leading dim
    xcols = [xp[:, k:k + W, :] for k in range(3)]
    s1 = jnp.zeros((co,), jnp.float32)
    s2 = jnp.zeros((co,), jnp.float32)
    for py in range(2):
        for px in range(2):
            acc = jnp.zeros((bh, W, co), jnp.float32)
            for a in range(2):
                for b_ in range(2):
                    acc = acc + jax.lax.dot_general(
                        xcols[b_ + px][a + py:a + py + bh],
                        w_ref[2 * py + px, a, b_],
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            acc = acc + cb_ref[0]
            o_ref[0, :, py, :, px, :] = acc.astype(o_ref.dtype)
            if emit_stats:
                s1 = s1 + jnp.sum(acc, axis=(0, 1))
                s2 = s2 + jnp.sum(acc * acc, axis=(0, 1))
    if emit_stats:
        st_ref[0, 0] = jnp.stack([s1, s2])


@functools.partial(jax.jit, static_argnames=("emit_stats", "block_h",
                                             "interpret"))
def upsample2x_conv_fused(x, w, conv_bias, emit_stats: bool = False,
                          block_h: int = 0, interpret: bool = False):
    """conv3x3(nearest_upsample_2x(x)) as one Pallas kernel: the subpixel
    tap algebra of ops/conv.py:upsample2x_conv (4 effective 2x2 taps per
    output phase, 2.25x fewer FLOPs than the naive form) computed at
    input resolution and written phase-interleaved, so neither the 4x
    upsampled tensor nor the phase stack is ever materialised in HBM.

    x: [B, H, W, C]; w: [3, 3, C, Co]; returns [B, 2H, 2W, Co]."""
    b, h, wd, c = x.shape
    co = w.shape[-1]
    assert w.shape[:3] == (3, 3, c), (w.shape, c)

    # phase kernels: [4, 2, 2, C, Co] (tiny, precomputed by XLA)
    r0 = jnp.stack([w[0], w[1] + w[2]])          # py = 0
    r1 = jnp.stack([w[0] + w[1], w[2]])          # py = 1

    def colmix(k, px):
        if px == 0:
            return jnp.stack([k[:, 0], k[:, 1] + k[:, 2]], axis=1)
        return jnp.stack([k[:, 0] + k[:, 1], k[:, 2]], axis=1)

    wph = jnp.stack([colmix(r0, 0), colmix(r0, 1),
                     colmix(r1, 0), colmix(r1, 1)])  # [4, 2, 2, C, Co]

    if block_h:
        bh = block_h
    elif co <= 256 and h % 8 == 0:
        # measured (benchmarks/up2x_bh_ab.py, interleaved min-of-3, v5e):
        # at 256->512 c256 bh=8 beats the VMEM-derived pick 5.79 vs
        # 6.31ms (+9%) — small row blocks keep the 4-phase interleaved
        # writes cache-resident when the channel dim is narrow. At
        # c512 shapes the larger pick stays best (128->256: 4.52 vs
        # 4.87ms), so the rule is gated on co.
        bh = 8
    else:
        budget = 72 * 1024 * 1024
        it = x.dtype.itemsize
        bh = min(h, 128)
        while bh > 8:
            need = bh * wd * (c * it * 6 + co * (4 + 16 * it))
            if h % bh == 0 and need <= budget:
                break
            bh //= 2
    assert h % bh == 0, (h, bh)
    nblk = h // bh

    zrow = jnp.zeros((b, 1, wd, c), x.dtype)
    if nblk > 1:
        top = jnp.concatenate([zrow, x[:, bh - 1:h - 1:bh]], axis=1)
        bot = jnp.concatenate([x[:, bh::bh], zrow], axis=1)
    else:
        top, bot = zrow, zrow
    halo = jnp.stack([top, bot], axis=2)  # [B, nblk, 2, W, C]

    cdt = x.dtype
    out, stats = pl.pallas_call(
        functools.partial(_up_kernel, bh=bh, W=wd, H=h,
                          emit_stats=emit_stats),
        grid=(b, nblk),
        in_specs=[
            pl.BlockSpec((1, bh, wd, c), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 2, wd, c), lambda i, j: (i, j, 0, 0, 0)),
            pl.BlockSpec((4, 2, 2, c, co), lambda i, j: (0, 0, 0, 0, 0)),
            pl.BlockSpec((1, co), lambda i, j: (0, 0)),
        ],
        out_specs=(pl.BlockSpec((1, bh, 2, wd, 2, co),
                                lambda i, j: (i, j, 0, 0, 0, 0)),
                   pl.BlockSpec((1, 1, 2, co), lambda i, j: (i, j, 0, 0))),
        out_shape=(jax.ShapeDtypeStruct((b, h, 2, wd, 2, co), cdt),
                   jax.ShapeDtypeStruct((b, nblk, 2, co), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * wd * c * co * 16,
            bytes_accessed=(b * h * wd * (c + 4 * co) + 16 * c * co)
                           * cdt.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, halo, wph.astype(cdt), conv_bias.astype(jnp.float32)[None, :])
    # [B, H, 2, W, 2, Co] -> [B, 2H, 2W, Co] is a contiguous (free) reshape
    out = out.reshape(b, 2 * h, 2 * wd, co)
    if emit_stats:
        return out, stats.sum(axis=1)  # [B, 2, Co]
    return out


def _mm_kernel(x_ref, w_ref, cb_ref, ps_ref, pb_ref, res_ref, o_ref, st_ref,
               *, silu, prologue, residual, emit_stats):
    x = x_ref[0]
    if prologue:
        xf = x.astype(jnp.float32) * ps_ref[0] + pb_ref[0]
        if silu:
            xf = xf * jax.nn.sigmoid(xf)
        x = xf.astype(x_ref.dtype)
    acc = jax.lax.dot_general(
        x, w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc = acc + cb_ref[0]
    if residual:
        acc = acc + res_ref[0].astype(jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)
    if emit_stats:
        st_ref[0, 0] = jnp.stack(
            [jnp.sum(acc, axis=0), jnp.sum(acc * acc, axis=0)])


@functools.partial(jax.jit, static_argnames=("silu", "emit_stats", "block_r",
                                             "interpret"))
def conv1x1_fused(x, w, conv_bias, prologue_scale=None, prologue_bias=None,
                  residual=None, silu: bool = False,
                  emit_stats: bool = False, block_r: int = 0,
                  interpret: bool = False):
    """Pointwise conv (= channel matmul) with the same optional fusions
    as conv3x3_fused: GroupNorm-affine(+SiLU) prologue, residual-add
    epilogue, output-stats emission. Covers the SpatialTransformer's
    GN+proj_in entry and proj_out+residual exit (unet/mod.rs:462-480)
    and the VAE attn projections, in ONE pass over the map.

    x: [B, ..., C]; w: [C, Co] (a [1,1,C,Co] HWIO conv weight squeezed);
    residual: same leading shape as x with Co channels."""
    orig_shape = x.shape
    b, c = orig_shape[0], orig_shape[-1]
    rows = x.size // (b * c)
    co = w.shape[-1]
    xr = x.reshape(b, rows, c)
    prologue = prologue_scale is not None
    has_res = residual is not None

    if block_r:
        br = block_r
    else:
        budget = 64 * 1024 * 1024
        it = x.dtype.itemsize
        br = min(rows, 2048)
        while br > 8:
            need = br * (c * it * 3 + co * (4 + 2 * it))
            if rows % br == 0 and need <= budget:
                break
            br //= 2
    assert rows % br == 0, (rows, br)
    nblk = rows // br

    if prologue:
        ps = prologue_scale.astype(jnp.float32).reshape(b, 1, c)
        pb = prologue_bias.astype(jnp.float32).reshape(b, 1, c)
    else:
        ps = jnp.zeros((b, 1, c), jnp.float32)
        pb = ps
    res = (residual.reshape(b, rows, co) if has_res
           else jnp.zeros((b, 1, co), x.dtype))
    res_spec = (pl.BlockSpec((1, br, co), lambda i, j: (i, j, 0))
                if has_res else pl.BlockSpec((1, 1, co), lambda i, j: (i, 0, 0)))

    outs = pl.pallas_call(
        functools.partial(_mm_kernel, silu=silu, prologue=prologue,
                          residual=has_res, emit_stats=emit_stats),
        grid=(b, nblk),
        in_specs=[
            pl.BlockSpec((1, br, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((c, co), lambda i, j: (0, 0)),
            pl.BlockSpec((1, co), lambda i, j: (0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
            res_spec,
        ],
        out_specs=(pl.BlockSpec((1, br, co), lambda i, j: (i, j, 0)),
                   pl.BlockSpec((1, 1, 2, co), lambda i, j: (i, j, 0, 0))),
        out_shape=(jax.ShapeDtypeStruct((b, rows, co), x.dtype),
                   jax.ShapeDtypeStruct((b, nblk, 2, co), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * rows * c * co,
            bytes_accessed=(b * rows * (c + co) + c * co) * x.dtype.itemsize,
            transcendentals=b * rows * c if (prologue and silu) else 0,
        ),
        interpret=interpret,
    )(xr, w.astype(x.dtype), conv_bias.astype(jnp.float32)[None, :],
      ps, pb, res)
    y, stats = outs
    y = y.reshape(orig_shape[:-1] + (co,))
    if emit_stats:
        return y, stats.sum(axis=1)
    return y


def gn_scale_bias(x, gamma, beta, n_group: int, eps: float,
                  interpret: bool = False):
    """Per-(batch, channel) folded GroupNorm affine from one stats pass
    over x (the Pallas partial-sums kernel of ops/fused_groupnorm).

    Returns (scale, bias), each [B, C]:  gn(x) == x * scale + bias.
    """
    from sdtpu.ops.fused_groupnorm import channel_partials

    b, c = x.shape[0], x.shape[-1]
    rows = x.size // (b * c)
    sums = channel_partials(x, interpret=interpret)  # [B, 2, C]
    return stats_scale_bias(sums, rows, gamma, beta, n_group, eps)


def stats_scale_bias(sums, rows: int, gamma, beta, n_group: int, eps: float):
    """Fold per-channel (sum, sum^2) into the GroupNorm scale/bias.

    sums: [B, 2, C] f32; rows = number of spatial elements per channel.
    gn(x) = (x - mean_g) * rsqrt(var_g + eps) * gamma + beta
          == x * scale + bias with the group stats broadcast to channels.
    """
    b, _, c = sums.shape
    cpg = c // n_group
    g = sums.reshape(b, 2, n_group, cpg).sum(-1)  # [B, 2, G]
    n = rows * cpg
    mean = g[:, 0] / n
    var = g[:, 1] / n - mean * mean
    inv = jax.lax.rsqrt(var + eps)  # [B, G]
    inv_c = jnp.repeat(inv, cpg, axis=1)
    mean_c = jnp.repeat(mean, cpg, axis=1)
    gamma_f = gamma.astype(jnp.float32)[None]
    beta_f = beta.astype(jnp.float32)[None]
    scale = inv_c * gamma_f
    bias = beta_f - mean_c * scale
    return scale, bias
