#!/usr/bin/env python
"""Sweep block_h for conv3x3_fused / upsample2x_conv_fused at the VAE
decoder's hot shapes (r2 'known headroom': 512^2x128 conv, up2x kernels).

Methodology note (BENCHLOG): sub-ms kernels through the tunnel need LONG
scans — the scalar-fetch sync costs an RTT comparable to tens of kernel
invocations, so this sweep times (N+256 iters) - (N iters) and divides by
256, min-of-3, instead of the usual 8-iter delta.
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

EXTRA = 256


def bench(fn, args, repeats=3):
    def run(args, n):
        def body(c, _):
            out = fn(*c)
            out = out[0] if isinstance(out, tuple) else out
            c0 = c[0] + 0.0 * jnp.mean(out.astype(c[0].dtype))
            return (c0,) + c[1:], None
        c, _ = jax.lax.scan(body, args, None, length=n)
        return jnp.sum(c[0].astype(jnp.float32))

    run1 = jax.jit(functools.partial(run, n=16))
    runN = jax.jit(functools.partial(run, n=16 + EXTRA))
    np.asarray(run1(args)); np.asarray(runN(args))
    best = 1e9
    for _ in range(repeats):
        t0 = time.perf_counter(); np.asarray(run1(args)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(runN(args)); tn = time.perf_counter() - t0
        best = min(best, (tn - t1) / EXTRA * 1000)
    return best


def main():
    from sdtpu.ops.fused_conv import conv3x3_fused, upsample2x_conv_fused

    key = jax.random.PRNGKey(0)
    B = 4
    dtype = jnp.bfloat16

    for res, c, co, bhs in [
        (512, 128, 128, (0, 8, 16, 32)),
        (256, 256, 256, (0, 16, 32)),
        (128, 512, 512, (0, 16, 32)),
    ]:
        x = jax.random.normal(key, (B, res, res, c), dtype)
        w = jax.random.normal(key, (3, 3, c, co), dtype) * 0.05
        cb = jnp.zeros((co,), dtype)
        flops = 2 * B * res * res * c * co * 9
        for bh in bhs:
            ms = bench(lambda x: conv3x3_fused(x, w, cb, silu=False,
                                               block_h=bh), (x,))
            print(f"conv3x3 {res}^2 c{c}->{co} bh={bh or 'auto'}: "
                  f"{ms:6.3f}ms {flops/ms/1e9:6.1f} TF/s", flush=True)

    for res, c, co, bhs in [
        (64, 512, 512, (0, 8, 16)),
        (128, 512, 512, (0, 8, 16)),
        (256, 256, 256, (0, 8, 16, 32)),
    ]:
        x = jax.random.normal(key, (B, res, res, c), dtype)
        w = jax.random.normal(key, (3, 3, c, co), dtype) * 0.05
        cb = jnp.zeros((co,), dtype)
        flops = 2 * B * (2 * res) ** 2 * c * co * 4
        for bh in bhs:
            try:
                ms = bench(lambda x: upsample2x_conv_fused(x, w, cb,
                                                           block_h=bh), (x,))
                print(f"up2x {res}->{2*res} c{c}->{co} bh={bh or 'auto'}: "
                      f"{ms:6.3f}ms {flops/ms/1e9:6.1f} TF/s", flush=True)
            except Exception as e:
                print(f"up2x {res} bh={bh}: FAIL {type(e).__name__} "
                      f"{str(e)[:90]}", flush=True)


if __name__ == "__main__":
    main()
