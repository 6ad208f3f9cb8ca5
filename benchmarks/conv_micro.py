#!/usr/bin/env python
"""Fused GN+SiLU+conv3x3 Pallas kernel vs XLA at the VAE decoder shapes.

XLA baseline (benchmarks/vae_breakdown.py): conv3x3 runs at 66.6 TF/s at
512^2 x 128 and 103 TF/s at 256^2 x 256. Roofline at ~197 TF/s bf16.
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench(fn, args, iters=8):
    def run(args, n):
        def body(c, _):
            out = fn(*c)
            out = out[0] if isinstance(out, tuple) else out
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


from contextlib import contextmanager


@contextmanager
def force_xla():
    """Pin the self-dispatching model paths to XLA while timing the
    baseline (ADVICE r2: _resnet_apply/upsample2x_conv auto-dispatch to
    the fused kernels at these shapes, so an unguarded A/B compares
    fused-vs-fused and future boundary re-measurements would be silently
    corrupted)."""
    keys = {
        "SDTPU_FUSED_CONV_MIN_ROWS": str(1 << 30),
        "SDTPU_FUSED_UP_MIN_ROWS": str(1 << 30),
        "SDTPU_FUSED_GN": "0",
    }
    old = {k: os.environ.get(k) for k in keys}
    os.environ.update(keys)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def main():
    from sdtpu.config import SD_V1_4
    from sdtpu.models import vae as V
    from sdtpu.ops import conv2d
    from sdtpu.ops.fused_conv import (conv3x3_fused, gn_scale_bias,
                                      stats_scale_bias)

    cfg = SD_V1_4.vae
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    B = 4

    for res, ch in [(64, 512), (128, 512), (256, 256), (512, 128)]:
        x = jax.random.normal(key, (B, res, res, ch), dtype)
        rp = V._init_resnet(key, ch, ch, dtype)
        flops = 2 * B * res * res * ch * ch * 9

        ms_xla = bench(lambda x: conv2d(rp["conv1"], x, padding=1), (x,))
        ms_pal = bench(lambda x: conv3x3_fused(
            x, rp["conv1"]["w"], rp["conv1"]["b"], silu=False), (x,))
        print(f"res {res:3d} ch {ch:3d} conv3x3: XLA {ms_xla:6.2f}ms "
              f"({flops/ms_xla/1e9:6.1f} TF/s)  pallas {ms_pal:6.2f}ms "
              f"({flops/ms_pal/1e9:6.1f} TF/s)", flush=True)

        # full resnet: unfused oracle vs 2-kernel chain
        with force_xla():
            ms_res_xla = bench(lambda x: V._resnet_apply(rp, x, cfg), (x,))

        def fused_resnet(x):
            s1, o1 = gn_scale_bias(x, rp["norm1"]["g"], rp["norm1"]["b"],
                                   cfg.groupnorm_groups, cfg.groupnorm_eps)
            h1, st = conv3x3_fused(x, rp["conv1"]["w"], rp["conv1"]["b"],
                                   s1, o1, emit_stats=True)
            s2, o2 = stats_scale_bias(st, res * res, rp["norm2"]["g"],
                                      rp["norm2"]["b"],
                                      cfg.groupnorm_groups, cfg.groupnorm_eps)
            return conv3x3_fused(h1, rp["conv2"]["w"], rp["conv2"]["b"],
                                 s2, o2, residual=x)

        ms_res_pal = bench(fused_resnet, (x,))
        print(f"             resnet: XLA {ms_res_xla:6.2f}ms  "
              f"fused-chain {ms_res_pal:6.2f}ms", flush=True)

    from sdtpu.ops.conv import upsample2x_conv
    from sdtpu.ops.fused_conv import upsample2x_conv_fused
    from sdtpu.models.initializers import init_conv2d

    for res, ch in [(64, 512), (128, 512), (256, 256)]:
        x = jax.random.normal(key, (B, res, res, ch), dtype)
        cp = init_conv2d(key, ch, ch, 3, dtype=dtype)
        flops = 2 * B * (2 * res) ** 2 * ch * ch * 4  # subpixel effective
        with force_xla():
            ms_sub = bench(lambda x: upsample2x_conv(cp, x), (x,))
        ms_pal = bench(lambda x: upsample2x_conv_fused(x, cp["w"], cp["b"]),
                       (x,))
        print(f"up2x {res:3d}->{2*res:3d} ch {ch:3d}: subpixel-XLA "
              f"{ms_sub:6.2f}ms ({flops/ms_sub/1e9:6.1f} TF/s)  pallas "
              f"{ms_pal:6.2f}ms ({flops/ms_pal/1e9:6.1f} TF/s)", flush=True)


if __name__ == "__main__":
    main()
