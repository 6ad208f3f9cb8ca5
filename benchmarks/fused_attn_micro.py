#!/usr/bin/env python
"""A/B: fused self-attention sublayer kernel vs the unfused composition
(layer_norm -> q/k/v linear -> dispatched qkv_attention -> out linear ->
residual) at the SD v1 UNet shapes, same process, scan-in-jit timing."""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sdtpu.ops.attention import qkv_attention
from sdtpu.ops.conv import linear
from sdtpu.ops.fused_transformer import fused_self_attention
from sdtpu.ops.groupnorm import layer_norm


def bench(fn, args, iters=12):
    def run(args, n):
        def body(c, _):
            out = fn(*c)
            c0 = c[0] + 0.0 * jnp.mean(out.astype(c[0].dtype))
            return (c0,) + c[1:], None
        c, _ = jax.lax.scan(body, args, None, length=n)
        return jnp.sum(c[0].astype(jnp.float32))

    run1 = jax.jit(functools.partial(run, n=1))
    runN = jax.jit(functools.partial(run, n=iters))
    np.asarray(run1(args)); np.asarray(runN(args))
    t0 = time.perf_counter(); np.asarray(run1(args)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); np.asarray(runN(args)); tn = time.perf_counter() - t0
    return (tn - t1) / (iters - 1) * 1000


def main():
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    print(f"device: {jax.devices()[0]}")
    for (b, s, c, h) in [(8, 4096, 320, 8), (8, 1024, 640, 8),
                         (8, 256, 1280, 8), (8, 64, 1280, 8)]:
        ks = jax.random.split(key, 8)
        x = jax.random.normal(ks[0], (b, s, c), dtype)
        g = 1.0 + 0.1 * jax.random.normal(ks[1], (c,), dtype)
        bb = 0.1 * jax.random.normal(ks[2], (c,), dtype)
        wscale = c ** -0.5
        wq, wk, wv, wo = (wscale * jax.random.normal(k, (c, c), dtype)
                          for k in ks[3:7])
        bo = 0.1 * jax.random.normal(ks[7], (c,), dtype)

        def unfused(x):
            xn = layer_norm(x, g, bb, 1e-5)
            q = linear({"w": wq}, xn)
            k = linear({"w": wk}, xn)
            v = linear({"w": wv}, xn)
            o = qkv_attention(q, k, v, None, h)
            return x + linear({"w": wo, "b": bo}, o)

        def fused(x):
            return fused_self_attention(x, g, bb, wq, wk, wv, wo, bo, h)

        ms_un = bench(unfused, (x,))
        ms_f = bench(fused, (x,))
        # correctness spot check on-device
        du = np.asarray(unfused(x).astype(jnp.float32))
        df = np.asarray(fused(x).astype(jnp.float32))
        rel = np.max(np.abs(du - df)) / (np.max(np.abs(du)) + 1e-9)
        print(f"B{b} S{s:5d} C{c:4d} h{h}: unfused {ms_un:7.3f}ms  "
              f"fused {ms_f:7.3f}ms  speedup {ms_un/ms_f:5.2f}x  relerr {rel:.2e}")


if __name__ == "__main__":
    main()
