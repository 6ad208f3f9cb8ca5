#!/usr/bin/env python
"""(bq, bk) sweep of the online-softmax flash kernel at s=65536 — the
2048px regime (VERDICT r3 task #8).

Two shapes:
  - UNet 256²-latent self-attention: d_head=40, 8 heads, B=2 (CFG) →
    bh=16. 2048px step measured 1.60 s at the default (bq=512, bk=1024).
  - VAE mid attention: d=512, 1 head, B=1 (single image decode).

Roofline context (v5e): scores contract over d_pad=128 with d=40 real →
~52 TF/s structural ceiling on the scores matmul (BENCHLOG floor
analysis); p@v contracts over S at ~197 TF/s. Per-layer FLOPs at
s=65536, bh=16: 2·2·s²·d·bh ≈ 11 TFLOP → ≥ ~180 ms/layer at the mixed
ceiling. The sweep measures how close each (bq, bk) gets.
"""

import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from benchmarks.fused_attn_micro import bench  # noqa: E402
from sdtpu.ops.flash_attention import flash_attention_heads  # noqa: E402


def sweep(tag, bh, s, d, n_head, configs, iters=3):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (bh, s, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (bh, s, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (bh, s, d), jnp.bfloat16)
    flops = 2 * 2 * bh * s * s * d
    for bq, bk in configs:
        try:
            ms = bench(
                lambda q, k, v, bq=bq, bk=bk: flash_attention_heads(
                    q, k, v, n_head=n_head, block_q=bq, block_k=bk,
                    single_k=False),
                (q, k, v), iters=iters)
            tf = flops / (ms * 1e-3) / 1e12
            print(f"{tag} bq={bq:5d} bk={bk:5d}: {ms:9.2f}ms  {tf:6.1f} TF/s",
                  flush=True)
        except Exception as e:
            print(f"{tag} bq={bq:5d} bk={bk:5d}: FAIL {str(e)[:110]}",
                  flush=True)


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    s = 65536
    # UNet shape (2048px): d=40, 8 heads pre-flattened -> bh = 2*8
    sweep("unet d40 bh16", 16, s, 40, 8, [
        (512, 1024),   # current default
        (512, 2048),
        (512, 4096),
        (1024, 1024),
        (1024, 2048),
        (1024, 4096),
        (2048, 2048),
        (256, 1024),
    ])
    # VAE mid attention (2048px decode): d=512, 1 head
    sweep("vae d512 bh1", 1, s, 512, 1, [
        (512, 1024),   # current default
        (512, 2048),
        (1024, 1024),
        (1024, 2048),
        (256, 2048),
    ], iters=2)


if __name__ == "__main__":
    main()
