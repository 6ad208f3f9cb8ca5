"""SD v1 UNet epsilon-predictor (reference: src/model/unet/mod.rs).

The reference spells the block list out as 24 named struct fields
(unet/mod.rs:41-73); here the identical structure is *derived* from
UNetConfig (channel_mult, n_res_blocks, attention_levels), so SD v2 or
custom UNets are config edits. Block names are generated to match the
reference dump-tree names exactly (input_blocks/{conv,rt1..rt6,d1..d3,
r1,r2}, middle_block, output_blocks/{r1,r2,ru,rt1..rt7,rtu1,rtu2}) so the
npy loader walks straight in (unet/load.rs:213-279).

Forward pass (unet/mod.rs:109-142): timestep embedding -> MLP; 12 input
blocks pushing a skip stack; middle Res+Transformer+Res; 12 output blocks
each concatenating one popped skip on the channel axis; GroupNorm/SiLU/
conv out. Activations are NHWC.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp

from sdtpu.config import UNetConfig
from sdtpu.models import rng
from sdtpu.models.initializers import init_conv2d, init_linear, init_norm
from sdtpu.ops import (
    conv2d,
    geglu,
    group_norm,
    layer_norm,
    linear,
    qkv_attention,
    silu,
    timestep_embedding,
)
from sdtpu.ops.conv import upsample2x_conv
from sdtpu.ops.groupnorm import group_norm_silu_op


# ------------------------------------------------------------ structure

@dataclass(frozen=True)
class BlockSpec:
    name: str
    kind: str  # conv | res | res_t | down | up-flag carried separately
    c_in: int
    c_out: int
    transformer: bool = False
    upsample: bool = False
    n_head: int = 8


def build_input_specs(cfg: UNetConfig) -> List[BlockSpec]:
    specs: List[BlockSpec] = [
        BlockSpec("conv", "conv", cfg.in_channels, cfg.model_channels)
    ]
    rt = r = d = 0
    ch = cfg.model_channels
    for level, mult in enumerate(cfg.channel_mult):
        out = mult * cfg.model_channels
        attn = level in cfg.attention_levels
        for _ in range(cfg.n_res_blocks):
            if attn:
                rt += 1
                specs.append(BlockSpec(f"rt{rt}", "res", ch, out, transformer=True,
                                       n_head=cfg.heads_for(out)))
            else:
                r += 1
                specs.append(BlockSpec(f"r{r}", "res", ch, out))
            ch = out
        if level != len(cfg.channel_mult) - 1:
            d += 1
            specs.append(BlockSpec(f"d{d}", "down", ch, ch))
    return specs


def build_output_specs(cfg: UNetConfig) -> Tuple[List[BlockSpec], List[int]]:
    """Returns output block specs plus the skip-channel list they consume
    (mirrors the input stack order)."""
    # reconstruct the skip channel stack from the input specs
    skip: List[int] = [s.c_out for s in build_input_specs(cfg)]
    specs: List[BlockSpec] = []
    rt = r = rtu = ru = 0
    ch = skip[-1]
    for level in reversed(range(len(cfg.channel_mult))):
        mult = cfg.channel_mult[level]
        out = mult * cfg.model_channels
        attn = level in cfg.attention_levels
        for i in range(cfg.n_res_blocks + 1):
            ich = skip.pop()
            up = level != 0 and i == cfg.n_res_blocks
            if attn and up:
                rtu += 1
                name = f"rtu{rtu}"
            elif attn:
                rt += 1
                name = f"rt{rt}"
            elif up:
                ru += 1
                name = f"ru{ru}"
            else:
                r += 1
                name = f"r{r}"
            specs.append(BlockSpec(name, "res", ch + ich, out, transformer=attn,
                                   upsample=up, n_head=cfg.heads_for(out)))
            ch = out
    # the reference names the single plain res+upsample block "ru", not
    # "ru1" (unet/mod.rs:63); collapse singleton counters
    if ru == 1:
        specs = [BlockSpec("ru", s.kind, s.c_in, s.c_out, s.transformer, s.upsample,
                           s.n_head) if s.name == "ru1" else s for s in specs]
    return specs, [s.c_in for s in specs]


# ------------------------------------------------------------ init

def _init_res_block(key, c_in, c_embed, c_out, dtype):
    k1, k2, k3, k4 = rng.split(key, 4)
    p = {
        "norm_in": init_norm(c_in, dtype),
        "conv_in": init_conv2d(k1, c_in, c_out, 3, dtype=dtype),
        "lin_embed": init_linear(k2, c_embed, c_out, dtype=dtype),
        "norm_out": init_norm(c_out, dtype),
        "conv_out": init_conv2d(k3, c_out, c_out, 3, dtype=dtype),
    }
    if c_in != c_out:
        p["skip_connection"] = init_conv2d(k4, c_in, c_out, 1, dtype=dtype)
    return p


def _init_cross_attn(key, n_state, n_ctx_state, dtype):
    kq, kk, kv, ko = rng.split(key, 4)
    return {
        "query": init_linear(kq, n_state, n_state, bias=False, dtype=dtype),
        "key": init_linear(kk, n_ctx_state, n_state, bias=False, dtype=dtype),
        "value": init_linear(kv, n_ctx_state, n_state, bias=False, dtype=dtype),
        "out": init_linear(ko, n_state, n_state, dtype=dtype),
    }


def _init_transformer(key, ch, ctx_dim, dtype):
    k1, k2, k3, k4, k5, k6 = rng.split(key, 6)
    return {
        "norm": init_norm(ch, dtype),
        "proj_in": init_conv2d(k1, ch, ch, 1, dtype=dtype),
        "transformer": {
            "norm1": init_norm(ch, dtype),
            "attn1": _init_cross_attn(k2, ch, ch, dtype),
            "norm2": init_norm(ch, dtype),
            "attn2": _init_cross_attn(k3, ch, ctx_dim, dtype),
            "norm3": init_norm(ch, dtype),
            "mlp": {
                "geglu": {"proj": init_linear(k4, ch, 8 * ch, dtype=dtype)},
                "lin": init_linear(k5, 4 * ch, ch, dtype=dtype),
            },
        },
        "proj_out": init_conv2d(k6, ch, ch, 1, dtype=dtype),
    }


def _init_block(key, spec: BlockSpec, cfg: UNetConfig, dtype):
    if spec.kind == "conv":
        return init_conv2d(key, spec.c_in, spec.c_out, 3, dtype=dtype)
    if spec.kind == "down":
        return init_conv2d(key, spec.c_in, spec.c_out, 3, dtype=dtype)
    kr, kt, ku = rng.split(key, 3)
    p = {}
    res = _init_res_block(kr, spec.c_in, cfg.time_embed_dim, spec.c_out, dtype)
    if spec.transformer or spec.upsample:
        p["res"] = res
    else:
        p = res  # bare ResBlock params live at the block root (r1, r2)
    if spec.transformer:
        p["transformer"] = _init_transformer(kt, spec.c_out, cfg.context_dim, dtype)
    if spec.upsample:
        p["upsample"] = {"conv": init_conv2d(ku, spec.c_out, spec.c_out, 3, dtype=dtype)}
    return p


def init_unet(key, cfg: UNetConfig, dtype=jnp.float32):
    in_specs = build_input_specs(cfg)
    out_specs, _ = build_output_specs(cfg)
    keys = rng.split(key, len(in_specs) + len(out_specs) + 8)
    ki = iter(keys)

    input_blocks = {s.name: _init_block(next(ki), s, cfg, dtype) for s in in_specs}

    mid_ch = in_specs[-1].c_out
    middle_block = {
        "res1": _init_res_block(next(ki), mid_ch, cfg.time_embed_dim, mid_ch, dtype),
        "transformer": _init_transformer(next(ki), mid_ch, cfg.context_dim, dtype),
        "res2": _init_res_block(next(ki), mid_ch, cfg.time_embed_dim, mid_ch, dtype),
    }

    output_blocks = {s.name: _init_block(next(ki), s, cfg, dtype) for s in out_specs}

    return {
        "lin1_time_embed": init_linear(next(ki), cfg.model_channels, cfg.time_embed_dim, dtype=dtype),
        "lin2_time_embed": init_linear(next(ki), cfg.time_embed_dim, cfg.time_embed_dim, dtype=dtype),
        "input_blocks": input_blocks,
        "middle_block": middle_block,
        "output_blocks": output_blocks,
        "norm_out": init_norm(cfg.model_channels, dtype),
        "conv_out": init_conv2d(next(ki), cfg.model_channels, cfg.out_channels, 3, dtype=dtype),
    }


# ------------------------------------------------------------ apply

def _use_fused_resblock(x, c_extra: int = 0) -> bool:
    """UNet ResBlock fused-conv dispatch. Measured (v5e, B=8, isolated
    graphs): XLA WINS at the 512px UNet maps — 1.12 vs 1.36ms at
    64^2x320, 1.32 vs 2.34 at 64^2x640->320 (concat input), 1.05 vs 1.04
    at 32^2x640 — its conv lowering is strong when the map tiles stay
    cache-resident. The fused chain only pays off on big maps (VAE
    numbers in BENCHLOG), so the UNet gate starts at 128^2 rows (the
    1024px-latent regime). SDTPU_FUSED_UNET_RES=0 disables."""
    import os

    from sdtpu.ops.dispatch import use_pallas

    if os.environ.get("SDTPU_FUSED_UNET_RES", "1") in ("0", "false"):
        return False
    b, h, w, c = x.shape
    min_rows = int(os.environ.get("SDTPU_FUSED_UNET_MIN_ROWS", str(1 << 14)))
    return (use_pallas() and (c + c_extra) % 8 == 0 and c % 8 == 0
            and h % 8 == 0 and h * w >= min_rows)


def _res_block_apply(p, x, emb, cfg: UNetConfig, emit_stats=False,
                     skip=None):
    """reference: unet/mod.rs:713-733. emit_stats: also return the
    per-channel (sum, sum^2) of the output (fused path; None on the
    XLA path) for the next consumer's GroupNorm.

    skip: optional up-path skip tensor — logically the block input is
    concat([x, skip], channels) (unet/mod.rs:205-216), but on the fused
    path the concat is NEVER materialised: the kernel runs its tap loop
    once per part (conv of a channel-concat == sum of two convs), the
    GroupNorm stats come from the two parts' channel partials, and the
    1x1 skip_connection is two matmuls. Saves a full write+read of the
    concat map per up ResBlock.

    Fused path: the timestep-embedding add between conv_in and norm_out
    is never materialised — h1+e's GroupNorm statistics are derived from
    the kernel-emitted stats of h1 by a per-channel shift
    (sum' = sum + N*e, sumsq' = sumsq + 2e*sum + N*e^2), and the
    normalize-affine of the second conv's prologue absorbs e
    (scale*(x+e)+bias == scale*x + (bias+scale*e), all per-(batch,
    channel)) — bit-equivalent up to fp order."""
    import os

    e = linear(p["lin_embed"], silu(emb))  # [B?, c_out]
    if (skip is not None
            and os.environ.get("SDTPU_SKIP_FOLD", "1") in ("0", "false")):
        # A/B knob: materialise the concat and take the single-input
        # fused path (isolates the fold's contribution in-context)
        x = jnp.concatenate([x, skip], axis=-1)
        skip = None
    c_extra = skip.shape[-1] if skip is not None else 0
    if _use_fused_resblock(x, c_extra):
        from sdtpu.ops.fused_conv import (conv3x3_fused, gn_scale_bias,
                                          stats_scale_bias)

        rows = x.shape[1] * x.shape[2]
        c1 = x.shape[-1]
        if skip is None:
            s1, o1 = gn_scale_bias(x, p["norm_in"]["g"], p["norm_in"]["b"],
                                   cfg.groupnorm_groups, cfg.groupnorm_eps)
            h1, st = conv3x3_fused(x, p["conv_in"]["w"], p["conv_in"]["b"],
                                   s1, o1, emit_stats=True)
        else:
            from sdtpu.ops.fused_groupnorm import channel_partials

            sums = jnp.concatenate(
                [channel_partials(x), channel_partials(skip)], axis=-1)
            s1, o1 = stats_scale_bias(sums, rows, p["norm_in"]["g"],
                                      p["norm_in"]["b"],
                                      cfg.groupnorm_groups, cfg.groupnorm_eps)
            h1, st = conv3x3_fused(
                x, p["conv_in"]["w"], p["conv_in"]["b"],
                s1[:, :c1], o1[:, :c1], emit_stats=True,
                x2=skip, prologue_scale2=s1[:, c1:],
                prologue_bias2=o1[:, c1:])
        ef = e.astype(jnp.float32)  # [B, c_out]
        st = jnp.stack([st[:, 0] + rows * ef,
                        st[:, 1] + 2.0 * ef * st[:, 0] + rows * ef * ef],
                       axis=1)
        s2, o2 = stats_scale_bias(st, rows, p["norm_out"]["g"],
                                  p["norm_out"]["b"], cfg.groupnorm_groups,
                                  cfg.groupnorm_eps)
        o2 = o2 + s2 * ef  # prologue absorbs the (un-stored) emb add
        if skip is None:
            res = (conv2d(p["skip_connection"], x, padding=0)
                   if "skip_connection" in p else x)
        else:
            # 1x1 conv over the implicit concat = two channel matmuls
            wsk = p["skip_connection"]["w"][0, 0]  # [c1+c2, co]
            res = (jnp.einsum("bhwc,co->bhwo", x, wsk[:c1].astype(x.dtype))
                   + jnp.einsum("bhwc,co->bhwo", skip,
                                wsk[c1:].astype(x.dtype)))
            res = res + p["skip_connection"]["b"].astype(res.dtype)
        return conv3x3_fused(h1, p["conv_out"]["w"], p["conv_out"]["b"],
                             s2, o2, residual=res, emit_stats=emit_stats)
    if skip is not None:
        x = jnp.concatenate([x, skip], axis=-1)
    h = group_norm_silu_op(x, p["norm_in"]["g"], p["norm_in"]["b"], cfg.groupnorm_groups, cfg.groupnorm_eps)
    h = conv2d(p["conv_in"], h, padding=1)
    h = h + e[:, None, None, :]
    h = group_norm_silu_op(h, p["norm_out"]["g"], p["norm_out"]["b"], cfg.groupnorm_groups, cfg.groupnorm_eps)
    h = conv2d(p["conv_out"], h, padding=1)
    if "skip_connection" in p:
        x = conv2d(p["skip_connection"], x, padding=0)
    y = x + h
    return (y, None) if emit_stats else y


def _mha_apply(p, x, context, n_head, key_valid=None):
    """unet MultiHeadAttention (unet/mod.rs:642-652): q from x, k/v from
    context (or x for self-attention), no mask in the reference; key_valid
    implements the static-shape padded-context equivalent."""
    xa = x if context is None else context
    q = linear(p["query"], x)
    k = linear(p["key"], xa)
    v = linear(p["value"], xa)
    return linear(p["out"], qkv_attention(q, k, v, None, n_head, key_valid=key_valid))


def _use_fused_attn(s: int, c: int, n_head: int) -> bool:
    """Measured dispatch (benchmarks/fused_attn_micro.py +
    longctx_micro.py, TPU v5e): the fused LN+qkv+attention+out-proj
    kernel beats the unfused path from the 16^2 up to the 128^2
    (1024px-class) UNet maps — 4.0 -> 3.1ms at S=4096; at S=16384 the
    fused sublayer (bq=128) is 20.1ms vs 26.1ms for the unfused
    sublayer INCLUDING its LN/projection/split-merge glue (the r1 '14.8
    vs 18.0' reading compared the fused sublayer against the bare
    attention core — glue-blind, superseded).

    The kernel keeps x, LN(x) and K/V for the WHOLE row in VMEM
    (~8*S*C bytes + the [bq, S] f32 score tile), so the gate bounds
    S*C at the measured-good 16384*320 point — at 2048px the 128^2
    C=640 level compiles to 136MB > 128MB VMEM and must fall back to
    the composite flash path."""
    from sdtpu.ops.dispatch import use_pallas

    return (use_pallas() and 256 <= s <= 16384 and s % 128 == 0
            and s * c <= 16384 * 320
            and (c // n_head) % 8 == 0)


def _use_fused_xattn(s: int, c: int, n_head: int) -> bool:
    """Precomputed-K/V fused cross-attention sublayer dispatch.

    Default OFF: measured end-to-end on v5e (BENCHLOG r2), the kernel
    LOSES ~2ms/UNet-step to XLA's 77-key composite (56.54 -> 58.62ms)
    even with K/V hoisted out — same verdict as the K/V-recompute
    variant. XLA fuses the small-key cross-attention chain well; the
    kernel is kept for non-SD shapes (SDTPU_FUSED_XATTN=1 enables)."""
    import os

    from sdtpu.ops.dispatch import use_pallas

    if os.environ.get("SDTPU_FUSED_XATTN", "0") in ("0", "false", ""):
        return False
    return (use_pallas() and 256 <= s <= 4096 and s % 128 == 0
            and (c // n_head) % 8 == 0)


def _use_fused_proj(rows: int, c: int) -> bool:
    """GN+proj_in / proj_out+residual 1x1-conv fusion dispatch
    (ops/fused_conv.py:conv1x1_fused). SDTPU_FUSED_PROJ=0 disables."""
    import os

    from sdtpu.ops.dispatch import use_pallas

    if os.environ.get("SDTPU_FUSED_PROJ", "1") in ("0", "false"):
        return False
    min_rows = int(os.environ.get("SDTPU_FUSED_CONV_MIN_ROWS", str(1 << 12)))
    return use_pallas() and c % 8 == 0 and rows % 8 == 0 and rows >= min_rows


def _transformer_apply(p, x, context, cfg: UNetConfig, n_head, ctx_valid=None,
                       in_stats=None):
    """SpatialTransformer (unet/mod.rs:462-480) + inner TransformerBlock
    (unet/mod.rs:522-527). in_stats: optional [B, 2, C] (sum, sum^2) of x
    from the preceding fused ResBlock — the entry GroupNorm consumes it
    instead of re-reading the map."""
    b, h, w, c = x.shape
    x_in = x
    if _use_fused_proj(h * w, c):
        from sdtpu.ops.fused_conv import (conv1x1_fused, gn_scale_bias,
                                          stats_scale_bias)

        if in_stats is not None:
            s, o = stats_scale_bias(in_stats, h * w, p["norm"]["g"],
                                    p["norm"]["b"], cfg.groupnorm_groups,
                                    cfg.groupnorm_eps)
        else:
            s, o = gn_scale_bias(x, p["norm"]["g"], p["norm"]["b"],
                                 cfg.groupnorm_groups, cfg.groupnorm_eps)
        x = conv1x1_fused(x.reshape(b, h * w, c), p["proj_in"]["w"][0, 0],
                          p["proj_in"]["b"], s, o)
    else:
        x = group_norm(x, p["norm"]["g"], p["norm"]["b"], cfg.groupnorm_groups, cfg.groupnorm_eps)
        x = conv2d(p["proj_in"], x, padding=0).reshape(b, h * w, c)

    t = p["transformer"]
    if _use_fused_attn(h * w, c, n_head):
        from sdtpu.ops.fused_transformer import fused_self_attention

        a1 = t["attn1"]
        x = fused_self_attention(
            x, t["norm1"]["g"], t["norm1"]["b"],
            a1["query"]["w"], a1["key"]["w"], a1["value"]["w"],
            a1["out"]["w"], a1["out"]["b"], n_head, cfg.ln_eps)
    else:
        x = x + _mha_apply(t["attn1"], layer_norm(x, t["norm1"]["g"], t["norm1"]["b"], cfg.ln_eps), None, n_head)
    # Cross-attention: the K/V-recompute fused kernel measured SLOWER
    # end-to-end (58.9 vs 56.8ms UNet step, BENCHLOG r2) and stays off;
    # the precomputed-K/V variant (fused_cross_attention_kv) removes the
    # in-kernel small-matmul chain that caused that loss.
    if _use_fused_xattn(h * w, c, n_head):
        from sdtpu.ops.fused_cross_attention import fused_cross_attention_kv

        a2 = t["attn2"]
        kt = jnp.einsum("bsd,dc->bcs", context,
                        a2["key"]["w"].astype(x.dtype))
        vt = jnp.einsum("bsd,dc->bcs", context,
                        a2["value"]["w"].astype(x.dtype))
        x = fused_cross_attention_kv(
            x, kt, vt, t["norm2"]["g"], t["norm2"]["b"],
            a2["query"]["w"], a2["out"]["w"], a2["out"]["b"],
            key_valid=ctx_valid, n_head=n_head, eps=cfg.ln_eps)
    else:
        x = x + _mha_apply(t["attn2"], layer_norm(x, t["norm2"]["g"], t["norm2"]["b"], cfg.ln_eps),
                           context, n_head, key_valid=ctx_valid)
    # Measured (TPU v5e, benchmarks/fused_attn_micro.py session logs in
    # BENCHLOG.md): XLA runs the 64^2 MLP at its matmul roofline already
    # (0.52ms) and the fused kernel LOSES there (0.61ms+); at S=1024 the
    # fused kernel wins (0.31-0.35 vs 0.51ms). Dispatch accordingly.
    if _use_fused_attn(h * w, c, n_head) and h * w < 2048:
        from sdtpu.ops.fused_mlp import fused_geglu_mlp

        x = fused_geglu_mlp(
            x, t["norm3"]["g"], t["norm3"]["b"],
            t["mlp"]["geglu"]["proj"]["w"], t["mlp"]["geglu"]["proj"]["b"],
            t["mlp"]["lin"]["w"], t["mlp"]["lin"]["b"], cfg.ln_eps)
    else:
        hN = layer_norm(x, t["norm3"]["g"], t["norm3"]["b"], cfg.ln_eps)
        proj = linear(t["mlp"]["geglu"]["proj"], hN)
        val, gate = jnp.split(proj, 2, axis=-1)
        x = x + linear(t["mlp"]["lin"], geglu(val, gate))

    if _use_fused_proj(h * w, c):
        from sdtpu.ops.fused_conv import conv1x1_fused

        out = conv1x1_fused(x, p["proj_out"]["w"][0, 0], p["proj_out"]["b"],
                            residual=x_in.reshape(b, h * w, c))
        return out.reshape(b, h, w, c)
    x = x.reshape(b, h, w, c)
    return x_in + conv2d(p["proj_out"], x, padding=0)


def _block_apply(p, spec: BlockSpec, x, emb, context, cfg, ctx_valid,
                 skip=None):
    if spec.kind == "conv":
        return conv2d(p, x, padding=1)
    if spec.kind == "down":
        return conv2d(p, x, stride=2, padding=1)
    res_p = p["res"] if (spec.transformer or spec.upsample) else p
    if spec.transformer:
        # thread the resblock's output stats into the transformer's
        # entry GroupNorm (fused path only; st is None otherwise)
        x, st = _res_block_apply(res_p, x, emb, cfg, emit_stats=True,
                                 skip=skip)
        x = _transformer_apply(p["transformer"], x, context, cfg,
                               spec.n_head, ctx_valid, in_stats=st)
    else:
        x = _res_block_apply(res_p, x, emb, cfg, skip=skip)
    if spec.upsample:
        # fused subpixel form of nearest-2x + conv3x3 (see ops/conv.py)
        x = upsample2x_conv(p["upsample"]["conv"], x)
    return x


REMAT_POLICIES = ("full", "dots", "heavy")


def _remat_policy(remat):
    """Map the `remat` argument to (use_checkpoint, jax checkpoint policy).

    - False/None: no rematerialisation (inference / small models)
    - True or "full": plain block-granular jax.checkpoint — everything
      inside a block recomputed in the backward pass (min memory)
    - "dots": save non-batched dot_general outputs (every linear/einsum
      over weights) + attention outputs; recompute convs + elementwise
    - "heavy": additionally save conv outputs ('conv_out' tags in
      ops/conv.py) — the backward recompute is then only the cheap
      elementwise/normalisation chains between heavy ops (max speed
      that still bounds activation memory per block)
    """
    if not remat:
        return False, None
    if remat is True or remat == "full":
        return True, None
    cp = jax.checkpoint_policies
    if remat == "dots":
        return True, cp.save_from_both_policies(
            cp.checkpoint_dots_with_no_batch_dims,
            cp.save_only_these_names("attn_out"))
    if remat == "heavy":
        return True, cp.save_from_both_policies(
            cp.checkpoint_dots_with_no_batch_dims,
            cp.save_only_these_names("conv_out", "attn_out"))
    raise ValueError(
        f"remat must be bool or one of {REMAT_POLICIES}, got {remat!r}")


def unet_apply(params, x, t, context, cfg: UNetConfig, ctx_valid=None,
               remat=False):
    """x: [B, h, w, in_ch] NHWC latent; t: scalar (or [1]) timestep;
    context: [B, S, context_dim]; ctx_valid: optional [B, S] bool marking
    real context tokens (static-shape fast path).

    remat: rematerialise each block in the backward pass
    (jax.checkpoint at block granularity) — training-time memory drops
    from every-intermediate to one activation per block boundary, at the
    cost of one extra forward. String values select a jax.checkpoint
    *policy* that saves the expensive intermediates and recomputes only
    the cheap ones (see _remat_policy). Inference paths never set it.

    Returns epsilon prediction [B, h, w, out_ch].
    """
    use_ckpt, policy = _remat_policy(remat)
    block = (jax.checkpoint(_block_apply, static_argnums=(1, 5),
                            policy=policy)
             if use_ckpt else _block_apply)
    dtype = x.dtype
    t_emb = timestep_embedding(t, cfg.model_channels, cfg.max_period, dtype=dtype)
    emb = linear(params["lin2_time_embed"], silu(linear(params["lin1_time_embed"], t_emb)))

    skips = []
    h = x
    for spec in build_input_specs(cfg):
        h = block(params["input_blocks"][spec.name], spec, h, emb, context, cfg, ctx_valid)
        skips.append(h)

    def _mid(m, h, emb, context, ctx_valid):
        mid_heads = cfg.heads_for(h.shape[-1])
        h = _res_block_apply(m["res1"], h, emb, cfg)
        h = _transformer_apply(m["transformer"], h, context, cfg, mid_heads, ctx_valid)
        return _res_block_apply(m["res2"], h, emb, cfg)

    h = (jax.checkpoint(_mid, policy=policy) if use_ckpt else _mid)(
        params["middle_block"], h, emb, context, ctx_valid)

    out_specs, _ = build_output_specs(cfg)
    for spec in out_specs:
        # the skip is passed SEPARATELY: the fused resblock folds the
        # channel-concat into its tap loop (see _res_block_apply);
        # the XLA path concatenates internally as before
        h = block(params["output_blocks"][spec.name], spec, h, emb,
                  context, cfg, ctx_valid, skips.pop())

    h = group_norm(h, params["norm_out"]["g"], params["norm_out"]["b"],
                   cfg.groupnorm_groups, cfg.groupnorm_eps)
    return conv2d(params["conv_out"], silu(h), padding=1)
