#!/usr/bin/env python
"""Gradient-accumulation throughput at SD v1.4 scale, single chip.

Strategy: optax.MultiSteps + per-micro-batch jitted steps (what
finetune.run_finetune uses). The in-jit lax.scan alternative
(training.make_train_step(accum=k)) crashes the remote TPU compile
helper at this scale — the while loop carries the full ~700-leaf/3.4GB
grads tree (SD_TINY compiles fine; remat/kernel-mode/micro-batch size
all irrelevant; measured 2026-08, see make_train_step docstring).

HBM note: MultiSteps adds a params-sized f32 gradient accumulator
(3.4GB) on top of the AdamW m/v (6.9GB) and master params (3.4GB), so
the persistent state is 13.7GB — micro-batch sizing is what keeps the
transient peak inside a 16GB chip.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("SDTPU_CACHE", "/tmp/sdtpu_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def main():
    import optax

    from sdtpu.config import SD_V1_4
    from sdtpu.models.unet import init_unet
    from sdtpu.training import make_optimizer, make_train_step

    cfg = SD_V1_4
    print(f"device: {jax.devices()[0]}", flush=True)

    # (micro_bs, accum): effective batch = micro_bs * accum
    # argv[1]: comma-separated micro:accum pairs, e.g. "4:2"
    if len(sys.argv) > 1:
        configs = tuple(tuple(int(v) for v in t.split(":"))
                        for t in sys.argv[1].split(","))
    else:
        configs = ((2, 2), (2, 4), (4, 2))
    for micro_bs, accum in configs:
        params = jax.jit(lambda k: init_unet(k, cfg.unet, dtype=jnp.float32))(
            jax.random.PRNGKey(0))
        opt = optax.MultiSteps(make_optimizer(), every_k_schedule=accum)
        opt_state = jax.jit(opt.init)(params)
        jax.block_until_ready(opt_state)
        step = jax.jit(
            make_train_step(cfg, opt, compute_dtype=jnp.bfloat16,
                            remat=True),
            donate_argnums=(0, 1))
        latents = jax.random.normal(jax.random.PRNGKey(1),
                                    (micro_bs, 64, 64, 4), jnp.float32)
        context = jax.random.normal(jax.random.PRNGKey(2),
                                    (micro_bs, 77, cfg.unet.context_dim),
                                    jnp.float32)
        p, o = params, opt_state
        try:
            t0 = time.perf_counter()
            p, o, loss = step(p, o, (latents, context), jax.random.PRNGKey(3))
            loss = float(loss)
            compile_s = time.perf_counter() - t0
            ts = []
            for i in range(2 * accum):  # full optimizer cycles
                t0 = time.perf_counter()
                p, o, loss = step(p, o, (latents, context),
                                  jax.random.PRNGKey(4 + i))
                loss = float(loss)
                ts.append(time.perf_counter() - t0)
            ms = min(ts) * 1000
            eff = micro_bs * accum
            print(f"micro {micro_bs} x accum {accum} (eff batch {eff}): "
                  f"{ms:8.1f}ms/micro-step "
                  f"({micro_bs/ms*1000:.2f} img/s) loss {loss:.4f} "
                  f"compile+first {compile_s:.1f}s", flush=True)
        except Exception as e:
            print(f"micro {micro_bs} x accum {accum}: FAIL {str(e)[:140]}",
                  flush=True)
        import gc

        del p, o, step, params, opt_state
        gc.collect()


if __name__ == "__main__":
    main()
