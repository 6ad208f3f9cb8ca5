#!/usr/bin/env python
"""VAE decoder component timings (batch 4, bf16) — the decode path costs
~420ms/batch in the headline bench; find out where."""

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
    from sdtpu.config import SD_V1_4
    from sdtpu.models import vae as V
    from sdtpu.models.initializers import init_conv2d
    from sdtpu.ops import conv2d, group_norm, silu
    from sdtpu.ops.conv import nearest_upsample_2x

    cfg = SD_V1_4.vae
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    B = 4

    print("== VAE decoder components (batch 4 bf16) ==", flush=True)
    for res, ch in [(64, 512), (128, 512), (256, 256), (512, 128)]:
        x = jax.random.normal(key, (B, res, res, ch), dtype)
        rp = V._init_resnet(key, ch, ch, dtype)
        ms_res = bench(lambda x: V._resnet_apply(rp, x, cfg), (x,))
        gp = {"g": jnp.ones(ch, dtype), "b": jnp.zeros(ch, dtype)}
        ms_gn = bench(lambda x: silu(group_norm(x, gp["g"], gp["b"], 32, 1e-6)), (x,))
        cp = init_conv2d(key, ch, ch, 3, dtype=dtype)
        ms_conv = bench(lambda x: conv2d(cp, x, padding=1), (x,))
        flops_conv = 2 * B * res * res * ch * ch * 9
        print(f"res {res:3d} ch {ch:3d}: resnet {ms_res:7.2f}ms  gn+silu {ms_gn:6.2f}ms"
              f"  conv3x3 {ms_conv:6.2f}ms ({flops_conv/max(ms_conv,1e-9)/1e9:6.1f} TF/s)",
              flush=True)
        if res < 512:
            ms_up = bench(lambda x: conv2d(cp, nearest_upsample_2x(x), padding=1), (x,))
            print(f"              upsample2x+conv {ms_up:7.2f}ms", flush=True)

    vp = V.init_autoencoder(jax.random.PRNGKey(1), cfg, dtype)
    z = jax.random.normal(key, (B, 64, 64, 4), dtype)
    ms = bench(lambda z: V.decode_latent(vp, z, cfg), (z,), iters=4)
    print(f"vae decode total (batch {B}): {ms:.2f}ms", flush=True)


if __name__ == "__main__":
    main()
