#!/usr/bin/env python
"""Full SD v1.4 train-step throughput on one chip (beyond-reference
feature — the reference is inference-only, so there is no baseline;
this records sdtpu's own number).

Config: 512px-class latents (64x64x4), AdamW f32 optimizer state, f32
master params, bf16 compute, block-granular rematerialisation
(training.make_train_step(remat=True)). Without remat a full SD v1
f32 train step cannot fit a 16GB v5e; with it batch 4 fits.
Donation of (params, opt_state) is required — without it the updated
tree would double params+opt HBM.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("SDTPU_CACHE", "/tmp/sdtpu_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def main():
    from sdtpu.config import SD_V1_4
    from sdtpu.models.unet import init_unet
    from sdtpu.training import make_optimizer, make_train_step

    cfg = SD_V1_4
    print(f"device: {jax.devices()[0]}", flush=True)

    params = jax.jit(lambda k: init_unet(k, cfg.unet, dtype=jnp.float32))(
        jax.random.PRNGKey(0))
    opt = make_optimizer()
    opt_state = jax.jit(opt.init)(params)
    jax.block_until_ready(opt_state)
    n_params = jax.tree_util.tree_reduce(lambda a, b: a + b.size, params, 0)
    print(f"params: {n_params/1e6:.1f}M (f32 master + f32 AdamW m/v)",
          flush=True)

    # (batch, accum, remat, res): accum>1 scans `accum` micro-batches of
    # batch/accum inside one jitted step (training.make_train_step) —
    # activation memory of the micro-batch, optimizer sees the full
    # effective batch. batch 16 does NOT fit without accumulation.
    for batch, accum, remat, res in ((4, 1, True, 64), (2, 1, True, 64),
                                     (1, 1, True, 128), (2, 1, True, 128),
                                     (8, 2, True, 64), (16, 4, True, 64)):
        step = jax.jit(
            make_train_step(cfg, opt, compute_dtype=jnp.bfloat16,
                            remat=remat, accum=accum),
            donate_argnums=(0, 1))
        latents = jax.random.normal(jax.random.PRNGKey(1),
                                    (batch, res, res, 4), jnp.float32)
        context = jax.random.normal(jax.random.PRNGKey(2),
                                    (batch, 77, cfg.unet.context_dim),
                                    jnp.float32)
        p, o = params, opt_state
        try:
            t0 = time.perf_counter()
            p, o, loss = step(p, o, (latents, context), jax.random.PRNGKey(3))
            loss = float(loss)  # sync
            compile_s = time.perf_counter() - t0
            ts = []
            for i in range(4):
                t0 = time.perf_counter()
                p, o, loss = step(p, o, (latents, context),
                                  jax.random.PRNGKey(4 + i))
                loss = float(loss)
                ts.append(time.perf_counter() - t0)
            ms = min(ts) * 1000
            print(f"batch {batch} accum {accum} {res*8}px remat={remat}: "
                  f"{ms:8.1f}ms/step "
                  f"({batch/ms*1000:.2f} img/s) loss {loss:.4f} "
                  f"compile+first {compile_s:.1f}s", flush=True)
            del p, o
            params = jax.jit(
                lambda k: init_unet(k, cfg.unet, dtype=jnp.float32))(
                jax.random.PRNGKey(0))
            opt_state = jax.jit(opt.init)(params)
            jax.block_until_ready(opt_state)
        except Exception as e:
            print(f"batch {batch} accum {accum} {res*8}px remat={remat}: "
                  f"FAIL {str(e)[:140]}", flush=True)
            # donated buffers are consumed even on failure — drop every
            # reference (incl. the compiled executable) before rebuilding
            import gc

            del p, o, step, params, opt_state
            gc.collect()
            params = jax.jit(
                lambda k: init_unet(k, cfg.unet, dtype=jnp.float32))(
                jax.random.PRNGKey(0))
            opt_state = jax.jit(opt.init)(params)
            jax.block_until_ready(opt_state)


if __name__ == "__main__":
    main()
