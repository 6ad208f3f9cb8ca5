#!/usr/bin/env python
"""Long-context (1024px-class) attention A/B at s=16384, d_head=40:
XLA vs online-softmax flash vs full-K (VMEM-shrunk q block) vs the fused
self-attention sublayer kernel. Same process, scan-in-jit timing."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from benchmarks.fused_attn_micro import bench  # noqa: E402
from sdtpu.ops.attention import qkv_attention  # noqa: E402
from sdtpu.ops.conv import linear  # noqa: E402
from sdtpu.ops.flash_attention import flash_attention_heads, flash_qkv_attention  # noqa: E402
from sdtpu.ops.fused_transformer import fused_self_attention  # noqa: E402
from sdtpu.ops.groupnorm import layer_norm  # noqa: E402


def xla_attention(q, k, v, n_head):
    """The pure-XLA path (mirrors qkv_attention's non-dispatch branch)."""
    b, sq, d = q.shape
    sk = k.shape[1]
    d_head = d // n_head
    scale = (d / n_head) ** -0.25
    q = (q * scale).reshape(b, sq, n_head, d_head).transpose(0, 2, 1, 3)
    k = (k * scale).reshape(b, sk, n_head, d_head).transpose(0, 2, 1, 3)
    v = v.reshape(b, sk, n_head, d_head).transpose(0, 2, 1, 3)
    qk = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    w = jnp.exp(qk - jax.lax.stop_gradient(qk.max(axis=-1, keepdims=True)))
    w = (w / w.sum(axis=-1, keepdims=True)).astype(v.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", w, v, preferred_element_type=jnp.float32)
    return o.astype(v.dtype).transpose(0, 2, 1, 3).reshape(b, sq, d)


def main():
    dtype = jnp.bfloat16
    b, s, c, h = int(os.environ.get("B", "2")), 16384, 320, 8
    print(f"device: {jax.devices()[0]}  B={b} S={s} C={c} h={h} (1024px class)")
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    q = jax.random.normal(ks[0], (b, s, c), dtype)
    k = jax.random.normal(ks[1], (b, s, c), dtype)
    v = jax.random.normal(ks[2], (b, s, c), dtype)

    res = {}
    res["xla"] = bench(lambda q, k, v: xla_attention(q, k, v, h), (q, k, v), iters=6)
    res["flash_online"] = bench(
        lambda q, k, v: flash_qkv_attention(q, k, v, h), (q, k, v), iters=6)

    def split(x):
        return (x.reshape(b, s, h, c // h).transpose(0, 2, 1, 3)
                .reshape(b * h, s, c // h))
    qh, kh, vh = split(q), split(k), split(v)
    for bq in (128, 256, 512):
        res[f"fullk_bq{bq}"] = bench(
            lambda qh, kh, vh, bq=bq: flash_attention_heads(
                qh, kh, vh, n_head=h, block_q=bq, block_k=s),
            (qh, kh, vh), iters=6)

    # whole fused sublayer (includes LN + projections — more work, but the
    # number that matters for an end-to-end 1024px UNet)
    g = 1.0 + 0.1 * jax.random.normal(ks[3], (c,), dtype)
    bb = 0.1 * jax.random.normal(ks[4], (c,), dtype)
    wq, wk, wv, wo = (c ** -0.5 * jax.random.normal(kk, (c, c), dtype)
                      for kk in jax.random.split(ks[5], 4))
    bo = 0.1 * jax.random.normal(ks[6], (c,), dtype)
    for bq in (128, 256):
        try:
            res[f"fused_sublayer_bq{bq}"] = bench(
                lambda x, bq=bq: fused_self_attention(
                    x, g, bb, wq, wk, wv, wo, bo, h, block_q=bq),
                (q,), iters=6)
        except Exception as e:
            res[f"fused_sublayer_bq{bq}"] = float("nan")
            print(f"  fused bq={bq} failed: {str(e)[:90]}")

    # the number fused_sublayer must actually beat: the UNFUSED sublayer
    # (LN + 3 projections + flash core + out proj + residual), i.e. what
    # models/unet.py runs when the fused kernel is not dispatched
    def composite(x):
        xin = layer_norm(x, g, bb)
        o = flash_qkv_attention(linear({"w": wq}, xin), linear({"w": wk}, xin),
                                linear({"w": wv}, xin), h)
        return x + linear({"w": wo, "b": bo}, o)

    res["composite_glue"] = bench(composite, (q,), iters=6)

    for name, ms in res.items():
        print(f"{name:22s}: {ms:8.3f}ms")
    base = res["xla"]
    best = min((v for v in res.values() if v == v and v > 0), default=base)
    print(f"best vs XLA: {base / best:.2f}x")


if __name__ == "__main__":
    main()
