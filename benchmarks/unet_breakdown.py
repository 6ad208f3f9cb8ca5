#!/usr/bin/env python
"""Where does the UNet step / VAE decode time go? Scan-in-jit timing of
each block type at each resolution (batch 8 = 4 images x batched CFG,
bf16), plus whole-model numbers."""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench(fn, args, iters=12):
    """(t[iters]-t[1])/(iters-1), scalar-fetch synced, one dispatch."""
    def run(args, n):
        def body(c, _):
            out = fn(*c)
            # keep data dependence: mix output back into first arg
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
    from sdtpu.models import unet as U
    from sdtpu.models import vae as V
    from sdtpu.ops import conv2d, group_norm, silu

    cfg = SD_V1_4.unet
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    B = 8

    # --- per-block-type timings at each level
    from sdtpu.models.initializers import init_conv2d
    print("== components (batch 8 bf16) ==")
    for res, ch in [(64, 320), (32, 640), (16, 1280), (8, 1280)]:
        x = jax.random.normal(key, (B, res, res, ch), dtype)
        emb = jax.random.normal(key, (1, 1280), dtype)
        ctx = jax.random.normal(key, (B, 77, 768), dtype)

        rp = U._init_res_block(key, ch, 1280, ch, dtype)
        ms_res = bench(lambda x, emb: U._res_block_apply(rp, x, emb, cfg), (x, emb))

        gp = {"g": jnp.ones(ch, dtype), "b": jnp.zeros(ch, dtype)}
        ms_gn = bench(lambda x: silu(group_norm(x, gp["g"], gp["b"], 32, 1e-5)), (x,))

        cp = init_conv2d(key, ch, ch, 3, dtype=dtype)
        ms_conv = bench(lambda x: conv2d(cp, x, padding=1), (x,))

        line = (f"res {res:3d} ch {ch:4d}: resblock {ms_res:7.2f}ms  "
                f"gn+silu {ms_gn:6.2f}ms  conv3x3 {ms_conv:6.2f}ms")
        if res > 8:
            tp = U._init_transformer(key, ch, 768, dtype)
            ms_tr = bench(
                lambda x, ctx: U._transformer_apply(tp, x, ctx, cfg, cfg.heads_for(ch)),
                (x, ctx))
            line += f"  spatial-transformer {ms_tr:7.2f}ms"
        print(line)

    # --- whole models
    print("== whole models ==")
    up = U.init_unet(key, cfg, dtype)
    x = jax.random.normal(key, (B, 64, 64, 4), dtype)
    ctx = jax.random.normal(key, (B, 77, 768), dtype)
    ms = bench(lambda x, ctx: U.unet_apply(up, x, jnp.int32(500), ctx, cfg), (x, ctx),
               iters=6)
    print(f"unet step (batch {B}): {ms:.2f}ms")

    vp = V.init_autoencoder(jax.random.PRNGKey(1), SD_V1_4.vae, dtype)
    z = jax.random.normal(key, (4, 64, 64, 4), dtype)
    ms = bench(lambda z: V.decode_latent(vp, z, SD_V1_4.vae), (z,), iters=4)
    print(f"vae decode (batch 4): {ms:.2f}ms")


if __name__ == "__main__":
    main()
