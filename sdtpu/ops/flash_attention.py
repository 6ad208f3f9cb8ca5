"""Blockwise (flash) attention Pallas TPU kernel.

Replaces the reference's materialize-everything attention — which builds
the full [B, h, q, k] score tensor (reference: src/model/attention.rs:31-41)
— with an online-softmax kernel that keeps only [block_q, block_k] score
tiles in VMEM. At SD's 4096-token self-attention this is already faster
(scores stay on-chip, fused exp/max/sum on the VPU between MXU tiles);
at 1024px+ resolutions (16K+ tokens) it is the difference between
running and OOM.

Math parity: softmax(q k^T / sqrt(d_head)) v — identical to the
reference's dual (d_head)^-0.25 scaling of q and k (attention.rs:15-26),
folded into one score scale. Statistics are f32 regardless of input dtype.

Used for the UNet's unmasked self-attention and the VAE mid-block
attention; tiny masked cases (CLIP causal at seq<=77, cross-attention
over 77 keys) stay on the XLA path where they are already optimal.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, scale, nk):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # [bq, d]
    k = k_ref[0]  # [bk, d]
    v = v_ref[0]  # [bk, d]

    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [bq, bk]

    m_prev = m_scr[:, :1]  # [bq, 1]
    l_prev = l_scr[:, :1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)  # [bq, bk]
    l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)

    acc = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scr[:] = acc
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(j == nk - 1)
    def _finalize():
        o_ref[0] = (acc_scr[:] / l_scr[:, :1]).astype(o_ref.dtype)


def _flash_ot_kernel(q_ref, k_ref, v_ref, ot_ref, m_scr, l_scr, acc_scr,
                     *, scale, nk):
    """Transposed online-softmax variant for small head dims (d <= 64).

    Everything lives transposed: scores are computed as k @ q^T
    ([bk, bq], same MXU cost as q @ k^T), the softmax statistics are
    column stats ([1, bq], kept in an 8-sublane scratch row), and the
    p @ v product is contract(v, p^T) -> [dv, bq], so the accumulator's
    narrow head dim sits on 8-granular SUBLANES instead of one
    mostly-padded 128-lane tile — the same layout win as
    _fullk_ot_body (21% there), applied to the 16K-token online path
    where the [bq, 128-padded] accumulator was 128/48 = 2.7x wasted
    MXU streaming at d=40. The caller untransposes outside."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # [bq, d_pad]
    k = k_ref[0]  # [bk, d_pad]
    v = v_ref[0]  # [bk, dv]

    st = jax.lax.dot_general(
        k, q,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [bk, bq]

    m_prev = m_scr[0:1]  # [1, bq]
    l_prev = l_scr[0:1]
    m_cur = jnp.max(st, axis=0, keepdims=True)  # [1, bq]
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(st - m_new)  # [bk, bq]
    l_new = l_prev * alpha + jnp.sum(p, axis=0, keepdims=True)

    acc = acc_scr[:] * alpha + jax.lax.dot_general(
        v, p.astype(v.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [dv, bq]
    acc_scr[:] = acc
    m_scr[0:1] = m_new
    l_scr[0:1] = l_new

    @pl.when(j == nk - 1)
    def _finalize():
        ot_ref[0] = (acc_scr[:] / l_scr[0:1]).astype(ot_ref.dtype)


def _fullk_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    """Single-k-block variant: the whole K/V for one (b,h) fits VMEM
    (sk*d_pad*2B <= ~1MB at SD sizes), so softmax is direct row softmax —
    no online rescaling, no scratch round-trips."""
    _fullk_body(q_ref[0], k_ref[0], v_ref[0], None, o_ref, scale)


def _fullk_bias_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale):
    """Full-K with an additive per-key bias row ([1, sk], 0 or -1e30) —
    implements key-padding masks for cross-attention (the reference's
    variable-length context, stablediffusion/mod.rs:198-211, under
    static shapes)."""
    _fullk_body(q_ref[0], k_ref[0], v_ref[0], bias_ref[0], o_ref, scale)


def _fullk_body(q, k, v, bias, o_ref, scale):
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    if bias is not None:
        s = s + bias  # [1, sk] broadcast over query rows
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / l).astype(o_ref.dtype)


def _fullk_ot_kernel(q_ref, k_ref, v_ref, ot_ref, *, scale):
    _fullk_ot_body(q_ref[0], k_ref[0], v_ref[0], None, ot_ref, scale)


def _fullk_bias_ot_kernel(q_ref, k_ref, v_ref, bias_ref, ot_ref, *, scale):
    _fullk_ot_body(q_ref[0], k_ref[0], v_ref[0], bias_ref[0], ot_ref, scale)


def _fullk_ot_body(q, k, v, bias, ot_ref, scale):
    """Transposed-output variant for small head dims: the p @ v product
    is computed as o^T = contract(v, p) so the (<=64)-wide result sits on
    8-granular SUBLANES instead of one mostly-wasted 128-lane tile —
    measured 21% faster at d=40 (bit-identical). v arrives padded only
    to a sublane multiple; the caller untransposes outside the kernel."""
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    if bias is not None:
        s = s + bias
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    ot = jax.lax.dot_general(
        v, p.astype(v.dtype),
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [dv, bq]
    ot_ref[0] = (ot / l.T).astype(ot_ref.dtype)


def _pad_head_dim(x, d_pad):
    d = x.shape[-1]
    if d == d_pad:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, d_pad - d)]
    return jnp.pad(x, pad)


def _pick_online_blocks(block_q, block_k, sq, sk, d):
    """Block sizes for the online-softmax path. Callers on the defaults
    get a measured large-S override: at 65536 tokens the kernel is
    partly K/V-restream-bound (nq x whole-K/V HBM traffic), so a large
    q block wins — bq=4096/bk=1024 218.6ms vs 251.5ms at the 512/1024
    default (+15%), same-window (benchmarks/attn65536_ext.py, v5e,
    s=65536 d=40 bh=16). d>64 (the VAE-mid d=512 shape) measured best
    AT the default, so the override is gated on small head dims."""
    bq = min(block_q, sq)
    bk = min(block_k, sk)
    if (block_q == 512 and block_k == 1024   # caller on defaults
            and sq >= 32768 and sq % 4096 == 0 and d <= 64):
        bq = 4096
    return bq, bk


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "n_head", "single_k",
                              "interpret")
)
def flash_attention_heads(q, k, v, key_bias=None, n_head: int = 1,
                          block_q: int = 512, block_k: int = 1024,
                          single_k: bool | None = None,
                          interpret: bool = False):
    """q: [BH, Sq, D], k/v: [BH, Sk, D] (heads pre-flattened into batch).

    Attention with the reference's 1/sqrt(D) effective scaling. D may be
    any size; it is zero-padded to a lane multiple internally. key_bias:
    optional additive f32 [BH // n_head, Sk] row (0 / -1e30) applied to
    the scores of every head of that batch element — the key-padding
    mask for cross-attention (full-K path only).
    """
    bh, sq, d = q.shape
    sk = k.shape[1]
    scale = float(d) ** -0.5  # == ((d)**-0.25)**2 applied to q and k

    d_pad = max(128, -(-d // 128) * 128)
    # pad the key length to a sublane multiple (cross-attention: 77 -> 80)
    sk_pad = -(-sk // 128) * 128 if key_bias is not None else sk
    if sk_pad != sk:
        pad = [(0, 0), (0, sk_pad - sk), (0, 0)]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        key_bias = jnp.pad(key_bias, [(0, 0), (0, sk_pad - sk)],
                           constant_values=_NEG_INF)
        sk = sk_pad

    bq, bk = _pick_online_blocks(block_q, block_k, sq, sk, d)
    assert sq % bq == 0 and sk % bk == 0, (sq, sk, bq, bk)
    nq, nk = sq // bq, sk // bk

    qp = _pad_head_dim(q, d_pad)
    kp = _pad_head_dim(k, d_pad)
    vp = _pad_head_dim(v, d_pad)

    # full-K fast path: K/V + a [bq, sk] f32 score tile fit in VMEM ->
    # direct row softmax, no online-rescale scratch traffic. v5e has
    # 128MB physical VMEM; Mosaic's default 16MB scoped limit is raised
    # explicitly (measured: bq=1024 @ 64MB limit is ~1.6x bq=256 @ 16MB).
    fullk_bq = min(bq, 1024)
    while sq % fullk_bq:
        fullk_bq //= 2

    def _fullk_vmem(bq_):
        return (2 * sk * d_pad * qp.dtype.itemsize  # K and V
                + bq_ * sk * 6                      # scores f32 + p bf16
                + 2 * bq_ * d_pad * qp.dtype.itemsize)

    # shrink the q block until the K/V + score tile estimate fits the
    # 48MB budget (key-masked shapes must land here: the online kernel
    # below has no bias input). Measured (TPU v5e, benchmarks/
    # longctx_micro.py): unmasked, a SHRUNK full-K loses to the online
    # kernel (s=8192: 4.6 vs 4.2ms; s=16384: 17.7 vs 14.8ms, where online
    # is 1.91x XLA), so shrinking is only used when the mask requires it.
    shrunk = False
    while _fullk_vmem(fullk_bq) >= 48 * 1024 * 1024 and fullk_bq > 128:
        fullk_bq //= 2
        shrunk = True
    fullk_vmem = _fullk_vmem(fullk_bq)
    take_fullk = (nk > 1 or key_bias is not None) \
        and fullk_vmem < 48 * 1024 * 1024 \
        and (key_bias is not None or not shrunk)
    if take_fullk:
        grid = (bh, sq // fullk_bq)
        # transposed-output path for small head dims (see _fullk_ot_body)
        use_ot = d <= 64
        dv = -(-d // 8) * 8
        if use_ot:
            v_in = jnp.pad(v, [(0, 0), (0, 0), (0, dv - d)]) if dv != d else v
            out_specs = pl.BlockSpec((1, dv, fullk_bq), lambda b, i: (b, 0, i))
            out_shape = jax.ShapeDtypeStruct((bh, dv, sq), q.dtype)
            kern, bias_kern = _fullk_ot_kernel, _fullk_bias_ot_kernel
            v_spec = pl.BlockSpec((1, sk, dv), lambda b, i: (b, 0, 0))
        else:
            v_in = vp
            out_specs = pl.BlockSpec((1, fullk_bq, d_pad), lambda b, i: (b, i, 0))
            out_shape = jax.ShapeDtypeStruct((bh, sq, d_pad), q.dtype)
            kern, bias_kern = _fullk_kernel, _fullk_bias_kernel
            v_spec = pl.BlockSpec((1, sk, d_pad), lambda b, i: (b, 0, 0))
        common = dict(
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=96 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * bh * sq * sk * d_pad * 2,
                bytes_accessed=(qp.size + kp.size + v_in.size) * qp.dtype.itemsize,
                transcendentals=bh * sq * sk,
            ),
            interpret=interpret,
        )
        qkv_specs = [
            pl.BlockSpec((1, fullk_bq, d_pad), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, sk, d_pad), lambda b, i: (b, 0, 0)),
            v_spec,
        ]
        if key_bias is not None:
            nh = n_head
            out = pl.pallas_call(
                functools.partial(bias_kern, scale=scale),
                grid=grid,
                in_specs=qkv_specs + [
                    # [B, 1, sk] with a unit sublane axis (Mosaic requires
                    # the 2nd-minor block dim be 8-divisible OR the full
                    # array dim)
                    pl.BlockSpec((1, 1, sk), lambda b, i: (b // nh, 0, 0)),
                ],
                **common,
            )(qp, kp, v_in, key_bias.astype(jnp.float32)[:, None, :])
        else:
            out = pl.pallas_call(
                functools.partial(kern, scale=scale),
                grid=grid,
                in_specs=qkv_specs,
                **common,
            )(qp, kp, v_in)
        if use_ot:
            return out[:, :d, :].transpose(0, 2, 1)
        return out[..., :d]

    if key_bias is not None:
        # The online-softmax kernel below has no bias input; silently
        # attending to padded keys would be wrong. Callers with a key mask
        # at VMEM-exceeding sizes must use the XLA masked path
        # (sdtpu.ops.attention.qkv_attention with key_valid).
        raise NotImplementedError(
            "key_bias requires the full-K path; this shape "
            f"(sk={sk}, d_pad={d_pad}, est. {fullk_vmem >> 20}MB VMEM) "
            "exceeds its budget — use the XLA masked attention instead")
    # single-k-block preference (measured, benchmarks/longctx_micro.py
    # s=16384 d=40 B=2, v5e: ONE direct pass 13.2ms vs 15.6ms for 16
    # pipelined k-steps — no scratch round-trips, no per-step online
    # rescale). Take it whenever the [bq, sk] f32 score tile + whole K/V
    # fit the scoped-VMEM budget; shrink the q block before giving up.
    if nk > 1 and single_k is not False:
        for bq_c in (512, 256, 128):
            # K/V blocks are double-buffered across the (b, i) grid even
            # at nk == 1 (the 1024px VAE mid attention, d_pad=512, hit
            # 64.75M of a 64.5M limit with a single-counted estimate)
            need = (bq_c * sk * 6                          # scores f32 + p
                    + 4 * sk * d_pad * qp.dtype.itemsize   # K + V, dbl-buf
                    + 4 * bq_c * d_pad * 4)
            if sq % bq_c == 0 and (single_k
                                   or need <= 80 * 1024 * 1024):
                bq, bk, nq, nk = bq_c, sk, sq // bq_c, 1
                break
    grid = (bh, nq, nk)
    common = dict(
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # Mosaic's default scoped limit is 16MB; the 512x1024 blocks +
            # scratch just tip over it at sk>=16384 (16.06MB). 96MB gives
            # the single-k-block path (whole-K/V blocks, double-buffered)
            # headroom at d_pad=512 — 64MB was 256KB short there.
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * sq * sk * d_pad * 2,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=bh * sq * sk,
        ),
        interpret=interpret,
    )
    if d <= 64:
        # transposed variant: the p @ v accumulator is [dv, bq] on
        # 8-granular sublanes (see _flash_ot_kernel)
        dv = -(-d // 8) * 8
        v_in = jnp.pad(v, [(0, 0), (0, 0), (0, dv - d)]) if dv != d else v
        out = pl.pallas_call(
            functools.partial(_flash_ot_kernel, scale=scale, nk=nk),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, d_pad), lambda b, i, j: (b, i, 0)),
                pl.BlockSpec((1, bk, d_pad), lambda b, i, j: (b, j, 0)),
                pl.BlockSpec((1, bk, dv), lambda b, i, j: (b, j, 0)),
            ],
            out_specs=pl.BlockSpec((1, dv, bq), lambda b, i, j: (b, 0, i)),
            out_shape=jax.ShapeDtypeStruct((bh, dv, sq), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((8, bq), jnp.float32),
                pltpu.VMEM((8, bq), jnp.float32),
                pltpu.VMEM((dv, bq), jnp.float32),
            ],
            **common,
        )(qp, kp, v_in)
        return out[:, :d, :].transpose(0, 2, 1)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, nk=nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d_pad), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bk, d_pad), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bk, d_pad), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d_pad), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d_pad), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d_pad), jnp.float32),
        ],
        **common,
    )(qp, kp, vp)
    return out[..., :d]


def flash_qkv_attention(q, k, v, n_head: int, key_valid=None,
                        interpret: bool = False):
    """Drop-in for sdtpu.ops.attention.qkv_attention: q/k/v [B, S,
    n_state] flattened-head layout -> [B, Sq, n_state]. key_valid:
    optional bool [B, Sk] marking real keys (cross-attention padding)."""
    b, sq, n_state = q.shape
    sk = k.shape[1]
    dh = n_state // n_head

    def split(x, s):
        return (x.reshape(b, s, n_head, dh).transpose(0, 2, 1, 3)
                .reshape(b * n_head, s, dh))

    key_bias = None
    if key_valid is not None:
        key_bias = jnp.where(key_valid, 0.0, _NEG_INF).astype(jnp.float32)

    o = flash_attention_heads(split(q, sq), split(k, sk), split(v, sk),
                              key_bias=key_bias, n_head=n_head,
                              interpret=interpret)
    return (o.reshape(b, n_head, sq, dh).transpose(0, 2, 1, 3)
            .reshape(b, sq, n_state))


# ---------------------------------------------------------------- autodiff

def _xla_attention_twin(q, k, v, n_head):
    """Differentiable XLA twin of flash_qkv_attention (mask-free):
    bit-for-bit the reference math of ops/attention.py's XLA path. Used
    only to derive the backward of the custom_vjp below — the forward
    runs the Pallas kernel; the VJP of this twin is the gradient."""
    b, sq, d = q.shape
    sk = k.shape[1]
    d_head = d // n_head
    scale = (d / n_head) ** -0.25
    qh = (q * scale).reshape(b, sq, n_head, d_head).transpose(0, 2, 1, 3)
    kh = (k * scale).reshape(b, sk, n_head, d_head).transpose(0, 2, 1, 3)
    vh = v.reshape(b, sk, n_head, d_head).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                   preferred_element_type=jnp.float32)
    w = jnp.exp(s - jax.lax.stop_gradient(s.max(axis=-1, keepdims=True)))
    w = (w / w.sum(axis=-1, keepdims=True)).astype(v.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", w, vh,
                   preferred_element_type=jnp.float32)
    return o.astype(v.dtype).transpose(0, 2, 1, 3).reshape(b, sq, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_qkv_attention_diff(q, k, v, n_head: int, interpret: bool = False):
    """Differentiable flash attention (mask-free): Pallas forward, Pallas
    full-K backward (_fullk_bwd_kernel — softmax recomputed per q block
    against whole K/V, dK/dV accumulated in VMEM scratch, O(bq*Sk) live
    score memory) with an XLA-twin autodiff fallback for shapes whose
    blocks exceed the VMEM budget or non-TPU backends. Both directions
    verified gradient-equivalent to XLA autodiff (tests). Measured
    (v5e, train_micro): batch-4 512px train step 334ms all-XLA -> 301ms
    Pallas-fwd -> 227ms Pallas-fwd+bwd; makes 1024px (16384-token)
    single-chip training fit at all (the XLA backward would materialise
    [B,h,S,S] f32 scores). Dispatched under
    dispatch.force_xla(allow_differentiable=True) in training."""
    return flash_qkv_attention(q, k, v, n_head, interpret=interpret)


def _flash_diff_fwd(q, k, v, n_head, interpret):
    return flash_qkv_attention(q, k, v, n_head, interpret=interpret), (q, k, v)


def _flash_diff_bwd(n_head, interpret, res, g):
    q, k, v = res
    b, sq, c = q.shape
    sk = k.shape[1]
    dh = c // n_head

    use_kernel = interpret
    if not use_kernel:
        from sdtpu.ops.dispatch import use_pallas_differentiable

        use_kernel = use_pallas_differentiable()
    if use_kernel:
        def split(x, s):
            return (x.reshape(b, s, n_head, dh).transpose(0, 2, 1, 3)
                    .reshape(b * n_head, s, dh))

        try:
            dqh, dkh, dvh = flash_attention_bwd_heads(
                split(q, sq), split(k, sk), split(v, sk), split(g, sq),
                interpret=interpret)

            def merge(x, s):
                return (x.reshape(b, n_head, s, dh).transpose(0, 2, 1, 3)
                        .reshape(b, s, n_head * dh))

            return merge(dqh, sq), merge(dkh, sk), merge(dvh, sk)
        except ValueError:
            pass  # shape exceeds the kernel's VMEM budget → XLA twin
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _xla_attention_twin(q_, k_, v_, n_head), q, k, v)
    return vjp(g)


flash_qkv_attention_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


def _fullk_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                      dk_scr, dv_scr, *, scale, nq):
    """Full-K attention backward: one q-row-block per grid step against
    the whole K/V. The softmax is recomputed directly from the block's
    scores (no saved logsumexp, no forward changes), dK/dV accumulate in
    f32 scratch across the q loop, dQ writes per block. O(bq*Sk) live
    score memory instead of XLA's O(Sq*Sk) materialisation."""
    i = pl.program_id(1)
    cdt = q_ref.dtype

    @pl.when(i == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0]      # [bq, d]
    k = k_ref[0]      # [sk, d]
    v = v_ref[0]      # [sk, d]
    do = do_ref[0]    # [bq, d]

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [bq, sk]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    pn = p / jnp.sum(p, axis=-1, keepdims=True)          # true probs, f32
    pn_c = pn.astype(cdt)
    dv_scr[...] += jax.lax.dot_general(                   # P^T @ dO
        pn_c, do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(                             # dO @ V^T
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)               # [bq, sk]
    rowd = jnp.sum(dp * pn, axis=-1, keepdims=True)       # rowsum(dO o O)
    ds = (pn * (dp - rowd) * scale).astype(cdt)           # [bq, sk]
    dk_scr[...] += jax.lax.dot_general(                   # dS^T @ Q
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dq_ref[0] = jax.lax.dot_general(                      # dS @ K
        ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(cdt)

    @pl.when(i == nq - 1)
    def _finalize():
        dk_ref[0] = dk_scr[...].astype(cdt)
        dv_ref[0] = dv_scr[...].astype(cdt)


def flash_attention_bwd_heads(q, k, v, do, interpret: bool = False):
    """Gradients (dq, dk, dv) of mask-free full-K attention with the
    reference 1/sqrt(d) scaling. q/k/v/do: [BH, S, D] split-head layout.
    Returns arrays in the input dtype. Raises ValueError when no q block
    fits the VMEM budget (caller falls back to the XLA twin)."""
    bh, sq, d = q.shape
    sk = k.shape[1]
    scale = float(d) ** -0.5
    d_pad = max(128, -(-d // 128) * 128)

    bq = None
    for bq_c in (512, 256, 128):
        if sq % bq_c:
            continue
        need = (bq_c * sk * 10                    # s/dp f32 + pn/ds bf16-ish
                + 2 * sk * d_pad * 4              # dk/dv scratch f32
                + 3 * sk * d_pad * q.dtype.itemsize * 2   # k, v (dbl-buf)
                + 4 * bq_c * d_pad * 4)
        if need <= 88 * 1024 * 1024:
            bq = bq_c
            break
    if bq is None:
        raise ValueError(f"no q block fits VMEM for bwd (sq={sq}, sk={sk})")
    nq = sq // bq

    qp = _pad_head_dim(q, d_pad)
    kp = _pad_head_dim(k, d_pad)
    vp = _pad_head_dim(v, d_pad)
    dop = _pad_head_dim(do, d_pad)

    grid = (bh, nq)
    blk_q = pl.BlockSpec((1, bq, d_pad), lambda b, i: (b, i, 0))
    blk_kv = pl.BlockSpec((1, sk, d_pad), lambda b, i: (b, 0, 0))
    dq_p, dk_p, dv_p = pl.pallas_call(
        functools.partial(_fullk_bwd_kernel, scale=scale, nq=nq),
        grid=grid,
        in_specs=[blk_q, blk_kv, blk_kv, blk_q],
        out_specs=(blk_q, blk_kv, blk_kv),
        out_shape=(jax.ShapeDtypeStruct((bh, sq, d_pad), q.dtype),
                   jax.ShapeDtypeStruct((bh, sk, d_pad), q.dtype),
                   jax.ShapeDtypeStruct((bh, sk, d_pad), q.dtype)),
        scratch_shapes=[pltpu.VMEM((sk, d_pad), jnp.float32),
                        pltpu.VMEM((sk, d_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * bh * sq * sk * d_pad,
            bytes_accessed=4 * (qp.size + kp.size) * qp.dtype.itemsize,
            transcendentals=bh * sq * sk,
        ),
        interpret=interpret,
    )(qp, kp, vp, dop)
    return dq_p[..., :d], dk_p[..., :d], dv_p[..., :d]
