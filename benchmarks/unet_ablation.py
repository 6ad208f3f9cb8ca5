#!/usr/bin/env python
"""Time attribution for the UNet step via ablation: run the full step,
then variants with pieces monkeypatched to cheap identities, all inside
one process (consistent measurement conditions)."""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("SDTPU_CACHE", "/tmp/sdtpu_jax_cache"))


def bench(fn, args, iters=8):
    """Plain-jit timing with a scalar-fetch sync per call (the remote
    compile helper dies on scan-wrapped full-UNet graphs). Includes a
    fixed per-dispatch tunnel overhead, identical across variants."""
    f = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    np.asarray(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(f(*args))
    return (time.perf_counter() - t0) / iters * 1000


def main():
    from sdtpu.config import SD_V1_4
    from sdtpu.models import unet as U
    from sdtpu.ops import linear

    cfg = SD_V1_4.unet
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    B = int(os.environ.get("SDTPU_ABL_BATCH", "8"))
    s = int(os.environ.get("SDTPU_ABL_LATENT", "64"))  # 128 = 1024px class
    up = U.init_unet(key, cfg, dtype)
    x = jax.random.normal(key, (B, s, s, 4), dtype)
    ctx = jax.random.normal(key, (B, 77, 768), dtype)

    def step(x, ctx):
        return U.unet_apply(up, x, jnp.int32(500), ctx, cfg)

    orig_mha = U._mha_apply
    orig_tr = U._transformer_apply
    orig_res = U._res_block_apply

    def mha_self_only(p, xq, context, n_head, key_valid=None):
        if context is None:
            return linear(p["out"], linear(p["query"], xq))  # kill self-attn core
        return orig_mha(p, xq, context, n_head, key_valid)

    def mha_cross_only(p, xq, context, n_head, key_valid=None):
        if context is not None:
            return linear(p["out"], linear(p["query"], xq))  # kill cross-attn core
        return orig_mha(p, xq, context, n_head, key_valid)

    def no_transformer(p, xx, context, cfg_, n_head, ctx_valid=None,
                       in_stats=None):
        return xx

    def light_res(p, xx, emb, cfg_, emit_stats=False):
        # keep channel change via skip conv only
        if "skip_connection" in p:
            from sdtpu.ops import conv2d
            xx = conv2d(p["skip_connection"], xx, padding=0)
        return (xx, None) if emit_stats else xx

    variants = [("full", {})]
    variants.append(("no-self-attn-core", {"_mha_apply": mha_self_only}))
    variants.append(("no-cross-attn-core", {"_mha_apply": mha_cross_only}))
    variants.append(("no-transformers", {"_transformer_apply": no_transformer}))
    variants.append(("no-resblock-convs", {"_res_block_apply": light_res}))

    for name, patches in variants:
        for attr, fn in patches.items():
            setattr(U, attr, fn)
        try:
            ms = bench(step, (x, ctx))
            print(f"{name:22s}: {ms:7.2f}ms", flush=True)
        except Exception as e:
            print(f"{name:22s}: FAILED {type(e).__name__}: {e}", flush=True)
        finally:
            U._mha_apply = orig_mha
            U._transformer_apply = orig_tr
            U._res_block_apply = orig_res


if __name__ == "__main__":
    main()
