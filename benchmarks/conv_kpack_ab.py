#!/usr/bin/env python
"""Interleaved A/B: conv3x3_fused tap-loop (9 dots, K=C) vs K-packed
(3 dots, K=3C) at the VAE decoder shapes. Interleaved min-of-N because
the tunneled TPU drifts +-15% across minutes (BENCHLOG methodology note).
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


def make_runner(fn, args):
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

    def measure():
        t0 = time.perf_counter(); np.asarray(run1(args)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(runN(args)); tn = time.perf_counter() - t0
        return (tn - t1) / EXTRA * 1000

    return measure


def main():
    from sdtpu.ops.fused_conv import conv3x3_fused

    key = jax.random.PRNGKey(0)
    B = 4
    dtype = jnp.bfloat16

    for res, c, co in [(512, 128, 128), (256, 256, 256), (128, 512, 512),
                       (128, 640, 640)]:
        x = jax.random.normal(key, (B, res, res, c), dtype)
        w = jax.random.normal(key, (3, 3, c, co), dtype) * 0.05
        cb = jnp.zeros((co,), dtype)
        g = jnp.ones((c,), dtype)
        bb = jnp.zeros((c,), dtype)
        flops = 2 * B * res * res * c * co * 9
        from sdtpu.ops.fused_conv import gn_scale_bias

        s, o = gn_scale_bias(x, g, bb, 32, 1e-6)
        base = make_runner(
            lambda x: conv3x3_fused(x, w, cb, s, o), (x,))
        pack = make_runner(
            lambda x: conv3x3_fused(x, w, cb, s, o, kpack=True), (x,))
        mb, mp = 1e9, 1e9
        for _ in range(3):
            mb = min(mb, base())
            mp = min(mp, pack())
        print(f"conv3x3+gn {res}^2 c{c}->{co}: base {mb:6.3f}ms "
              f"({flops/mb/1e9:6.1f} TF/s)  kpack {mp:6.3f}ms "
              f"({flops/mp/1e9:6.1f} TF/s)", flush=True)


if __name__ == "__main__":
    main()
