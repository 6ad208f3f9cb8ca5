"""Multi-head attention with the reference's exact scaling.

The reference's single attention kernel (reference: src/model/attention.rs:5-44,
duplicated at src/backend.rs:88-128) scales BOTH q and k by
(n_state/n_head)^-0.25 before the q @ k^T product, adds an optional additive
mask, softmaxes over the key axis, and applies the value weighting.

This module is the XLA-fused reference path; the Pallas flash-attention
kernel in sdtpu/ops/flash_attention.py implements the same math blockwise
and is selected via `sdtpu.ops.dispatch`.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import lax
from jax.ad_checkpoint import checkpoint_name

NEG_INF = float("-inf")


def causal_mask(seq_len: int, dtype=jnp.float32):
    """Dense additive causal mask: 0 on/below the diagonal, -inf above
    (reference: src/model/attention.rs:47-56 builds this with an O(seq)
    slice_assign loop; here it is one triu)."""
    return jnp.triu(jnp.full((seq_len, seq_len), NEG_INF, dtype=dtype), k=1)


def qkv_attention(
    q,
    k,
    v,
    mask=None,
    n_head: int = 1,
    key_valid: Optional[jnp.ndarray] = None,
):
    """Attention over flattened-head inputs.

    q: [B, Sq, D], k/v: [B, Sk, D]; mask: additive [Sq, Sk] or None;
    key_valid: optional boolean [B, Sk] marking real (non-padding) keys —
    used by the static-shape fast path; -inf is added to invalid keys,
    which reproduces the reference's unpadded variable-length softmax
    exactly (masked keys get zero weight).

    Returns [B, Sq, D]. Softmax statistics are computed in f32.

    Dispatch: mask-free attention at useful sizes routes to the Pallas
    flash kernel on TPU (sdtpu/ops/flash_attention.py); masked/small
    cases (CLIP causal seq<=77, cross-attention over 77 keys) stay on
    the XLA path below.
    """
    b, sq, d = q.shape
    sk = k.shape[1]

    # Measured on TPU v5e (benchmarks/attn_micro.py + /tmp A/Bs, scan-in-
    # jit method): the full-K Pallas kernel is 3.5x XLA at the dominant
    # self-attention shape (s=4096, d=40, 2.09ms vs 7.37ms); XLA keeps
    # 77-key cross-attention (0.48ms vs 0.61ms pallas), the VAE's
    # single-head d=512 at 512px sizes (204 TF/s), short sequences, and
    # additive-mask (CLIP causal) cases. Above s=8192 even large head
    # dims go blockwise regardless: the XLA path materialises the
    # [b, h, s, s] f32 score tensor (the 2048px VAE mid attention is
    # 65536^2 x 4B = 17GB — a compile-time HBM OOM, not a slowdown).
    d_head = d // n_head
    if (mask is None and sq >= 2048 and sk >= 2048
            and (d_head <= 160 or sq >= 8192)):
        from sdtpu.ops.dispatch import use_pallas, use_pallas_differentiable

        if sq % min(512, sq) == 0 and (
                key_valid is not None or sk % min(1024, sk) == 0):
            if key_valid is None and use_pallas_differentiable():
                # custom-VJP form (Pallas forward, XLA backward): safe
                # to differentiate, so it may dispatch even under
                # force_xla(allow_differentiable=True) in training.
                # checkpoint_name: under remat="dots"/"heavy" the output
                # is saved so the backward pass never re-runs the flash
                # forward (its own VJP recomputes from q/k/v, which the
                # dots policy saves as linear outputs)
                from sdtpu.ops.flash_attention import flash_qkv_attention_diff

                return checkpoint_name(
                    flash_qkv_attention_diff(q, k, v, n_head), "attn_out")
            if key_valid is not None and use_pallas():
                from sdtpu.ops.flash_attention import flash_qkv_attention

                return flash_qkv_attention(q, k, v, n_head,
                                           key_valid=key_valid)
    scale = (d / n_head) ** -0.25

    q = (q * scale).reshape(b, sq, n_head, d_head).transpose(0, 2, 1, 3)
    k = (k * scale).reshape(b, sk, n_head, d_head).transpose(0, 2, 1, 3)
    v = v.reshape(b, sk, n_head, d_head).transpose(0, 2, 1, 3)

    # [B, h, Sq, Sk] — accumulate on the MXU in f32
    qk = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)

    if mask is not None:
        qk = qk + mask[:sq, :sk]
    if key_valid is not None:
        qk = jnp.where(key_valid[:, None, None, :], qk, NEG_INF)

    w = jnp.exp(qk - lax.stop_gradient(qk.max(axis=-1, keepdims=True)))
    w = w / w.sum(axis=-1, keepdims=True)
    w = w.astype(v.dtype)

    o = jnp.einsum("bhqk,bhkd->bhqd", w, v, preferred_element_type=jnp.float32)
    o = o.astype(v.dtype).transpose(0, 2, 1, 3).reshape(b, sq, d)
    return checkpoint_name(o, "attn_out")
