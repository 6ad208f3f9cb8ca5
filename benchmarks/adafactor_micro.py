#!/usr/bin/env python
"""Adafactor vs AdamW full-finetune throughput (VERDICT r4 #5).

make_optimizer(kind="adafactor") claims ~7GB HBM freed (the factored
second moment replaces AdamW's 2x-params m/v = 6.9GB f32 at SD-v1
scale). That headroom should buy either no-remat at batches AdamW
cannot compile (the r3 finding: batch 4 no-remat + AdamW does not
compile on 16GB) or bigger batches under light remat — and convert to
img/s, or be recorded as a dead end (BENCHLOG).

Each config gets FRESH (params, opt_state) — adafactor and AdamW state
trees differ in shape, so the interleaved shared-state trick
(remat_policy_ab.py) cannot apply across optimizers. Per-config min-of-N
with the scalar-loss sync; between configs every reference (including
the jitted executable) is freed — a failed donated step otherwise
leaves the chip full and the next config OOMs spuriously (BENCHLOG r3).

Usage:
    python benchmarks/adafactor_micro.py "adafactor:4:none,adafactor:8:heavy"
    (default sweep below; config = optimizer:batch:remat)
"""

import gc
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

DEFAULT = ("adafactor:4:heavy,adafactor:4:none,adafactor:8:heavy,"
           "adafactor:8:none,adafactor:12:heavy,adamw:4:heavy")


def run_config(kind: str, batch: int, policy: str, iters: int) -> None:
    from sdtpu.config import SD_V1_4
    from sdtpu.models.unet import init_unet
    from sdtpu.training import make_optimizer, make_train_step

    cfg = SD_V1_4
    remat = {"none": False, "full": True}.get(policy, policy)

    params = jax.jit(lambda k: init_unet(k, cfg.unet, dtype=jnp.float32))(
        jax.random.PRNGKey(0))
    opt = make_optimizer(kind=kind)
    opt_state = jax.jit(opt.init)(params)
    jax.block_until_ready(opt_state)

    latents = jax.random.normal(jax.random.PRNGKey(1),
                                (batch, 64, 64, 4), jnp.float32)
    context = jax.random.normal(jax.random.PRNGKey(2),
                                (batch, 77, cfg.unet.context_dim),
                                jnp.float32)
    step = jax.jit(make_train_step(cfg, opt, compute_dtype=jnp.bfloat16,
                                   remat=remat), donate_argnums=(0, 1))

    label = f"{kind} b{batch} remat={policy}"
    t0 = time.perf_counter()
    params, opt_state, loss = step(params, opt_state, (latents, context),
                                   jax.random.PRNGKey(3))
    loss = float(loss)  # scalar sync
    print(f"{label}: compile+first {time.perf_counter()-t0:.1f}s "
          f"loss {loss:.4f}", flush=True)

    times = []
    key = jax.random.PRNGKey(4)
    for _ in range(iters):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        params, opt_state, loss = step(params, opt_state,
                                       (latents, context), sub)
        loss = float(loss)
        times.append(time.perf_counter() - t0)
    ts = sorted(times)
    mn, md = ts[0] * 1000, ts[len(ts) // 2] * 1000
    print(f"{label}: min {mn:8.1f}ms  med {md:8.1f}ms  "
          f"({batch/mn*1000:.2f} img/s at min)", flush=True)


def main():
    spec = sys.argv[1] if len(sys.argv) > 1 else DEFAULT
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    print(f"device: {jax.devices()[0]}  iters {iters}", flush=True)

    for part in filter(None, (p.strip() for p in spec.split(","))):
        kind, b, policy = part.split(":")
        try:
            run_config(kind, int(b), policy, iters)
        except Exception as e:
            print(f"{part}: FAIL {str(e)[:200]}", flush=True)
        # free EVERYTHING (donated buffers + executables) before the
        # next config — see module docstring
        jax.clear_caches()
        gc.collect()


if __name__ == "__main__":
    main()
