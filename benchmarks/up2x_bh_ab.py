#!/usr/bin/env python
"""Interleaved A/B: upsample2x_conv_fused auto block_h vs explicit small
bh at the VAE decoder up shapes. The one consistent signal from the r3
block sweep was 256->512 c256 bh=16 at +16% vs auto — but the sweep ran
each config in its own window and the tunnel drifts ±15-25%; this is the
clean (interleaved min-of-N) verdict.
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

EXTRA = 128


def make_runner(fn, args):
    def run(args, n):
        def body(c, _):
            out = fn(*c)
            out = out[0] if isinstance(out, tuple) else out
            c0 = c[0] + 0.0 * jnp.mean(out.astype(c[0].dtype))
            return (c0,) + c[1:], None
        c, _ = jax.lax.scan(body, args, None, length=n)
        return jnp.sum(c[0].astype(jnp.float32))

    run1 = jax.jit(functools.partial(run, n=8))
    runN = jax.jit(functools.partial(run, n=8 + EXTRA))
    np.asarray(run1(args)); np.asarray(runN(args))

    def measure():
        t0 = time.perf_counter(); np.asarray(run1(args)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(runN(args)); tn = time.perf_counter() - t0
        return (tn - t1) / EXTRA * 1000

    return measure


def main():
    from sdtpu.ops.fused_conv import upsample2x_conv_fused

    key = jax.random.PRNGKey(0)
    B = 4
    dtype = jnp.bfloat16

    # (input res, cin, cout) of the VAE decoder / UNet up stages
    for res, c, co, bhs in [(256, 256, 256, (8, 16, 32)),
                            (128, 512, 512, (8, 16)),
                            (64, 512, 512, (8, 16))]:
        x = jax.random.normal(key, (B, res, res, c), dtype)
        w = jax.random.normal(key, (3, 3, c, co), dtype) * 0.05
        bias = jnp.zeros((co,), dtype)
        flops = 2 * B * (2 * res) ** 2 * c * co * 4  # 4 effective taps
        runners = {"auto": make_runner(
            lambda x: upsample2x_conv_fused(x, w, bias), (x,))}
        for bh in bhs:
            runners[f"bh={bh}"] = make_runner(
                lambda x, bh=bh: upsample2x_conv_fused(x, w, bias,
                                                       block_h=bh), (x,))
        best = {k: 1e9 for k in runners}
        for _ in range(3):  # interleaved rounds
            for k, r in runners.items():
                best[k] = min(best[k], r())
        row = "  ".join(f"{k} {v:6.3f}ms ({flops/v/1e9:5.1f} TF/s)"
                        for k, v in best.items())
        print(f"up2x {res}->{2*res} c{c}->{co}: {row}", flush=True)


if __name__ == "__main__":
    main()
