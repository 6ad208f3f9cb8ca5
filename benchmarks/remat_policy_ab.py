#!/usr/bin/env python
"""Selective-remat policy A/B on the full SD v1.4 train step (one chip).

Compares remat=True ("full": recompute everything inside each block,
min memory) against the checkpoint policies added for VERDICT r3 task 2:
"dots" (save non-batched dot outputs + attention outputs) and "heavy"
(additionally save conv outputs) — models/unet.py:_remat_policy.

Methodology: interleaved min-of-N (the only trustworthy A/B on the
tunneled chip, BENCHLOG r3). All configs share ONE (params, opt_state)
tree — each jitted step donates its inputs and its outputs feed the next
config's step, so HBM holds a single 10.3GB persistent state no matter
how many configs run. Per-step sync is the scalar loss fetch (validated
timing method, BENCHLOG r2).

Usage: python benchmarks/remat_policy_ab.py [batch] [cycles]
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
    from sdtpu.config import SD_V1_4
    from sdtpu.models.unet import init_unet
    from sdtpu.training import make_optimizer, make_train_step

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    configs = (sys.argv[3].split(",") if len(sys.argv) > 3
               else ["full", "dots", "heavy"])

    cfg = SD_V1_4
    print(f"device: {jax.devices()[0]}  batch {batch}  cycles {cycles}",
          flush=True)

    params = jax.jit(lambda k: init_unet(k, cfg.unet, dtype=jnp.float32))(
        jax.random.PRNGKey(0))
    opt = make_optimizer()
    opt_state = jax.jit(opt.init)(params)
    jax.block_until_ready(opt_state)

    latents = jax.random.normal(jax.random.PRNGKey(1),
                                (batch, 64, 64, 4), jnp.float32)
    context = jax.random.normal(jax.random.PRNGKey(2),
                                (batch, 77, cfg.unet.context_dim),
                                jnp.float32)

    steps = {}
    for name in configs:
        remat = True if name == "full" else name
        steps[name] = jax.jit(
            make_train_step(cfg, opt, compute_dtype=jnp.bfloat16,
                            remat=remat),
            donate_argnums=(0, 1))

    # Compile + first-exec each config once, chaining the donated state.
    p, o = params, opt_state
    del params, opt_state
    live = []
    for name in configs:
        t0 = time.perf_counter()
        try:
            p, o, loss = steps[name](p, o, (latents, context),
                                     jax.random.PRNGKey(3))
            loss = float(loss)
            print(f"  {name}: compile+first {time.perf_counter()-t0:.1f}s "
                  f"loss {loss:.4f}", flush=True)
            live.append(name)
        except Exception as e:
            print(f"  {name}: FAIL {str(e)[:160]}", flush=True)
            # The donated (p, o) buffers are consumed even on failure;
            # this harness cannot recover shared state — rerun with the
            # failing config excluded (argv[3]).
            return

    times = {name: [] for name in live}
    key = jax.random.PRNGKey(4)
    for c in range(cycles):
        for name in live:
            key, sub = jax.random.split(key)
            t0 = time.perf_counter()
            p, o, loss = steps[name](p, o, (latents, context), sub)
            loss = float(loss)
            times[name].append(time.perf_counter() - t0)

    for name in live:
        ts = sorted(times[name])
        mn, md = ts[0] * 1000, ts[len(ts) // 2] * 1000
        print(f"{name:>6}: min {mn:8.1f}ms  med {md:8.1f}ms  "
              f"({batch/mn*1000:.2f} img/s at min)", flush=True)


if __name__ == "__main__":
    main()
