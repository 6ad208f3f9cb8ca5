#!/usr/bin/env python
"""bf16-vs-f32 gradient-accumulator A/B at SD v1.4 scale (VERDICT r3
task 2b). The finetune path (optax-MultiSteps-style per-micro-batch
stepping — the in-jit scan crashes the remote compiler at this scale)
reads+writes a params-sized accumulator every micro-step: 3.4GB in f32,
1.7GB in bf16 (training.multi_steps(accum_dtype=bfloat16), the
--accum-bf16 CLI flag). The f32 accumulator was measured +12% per
micro-step in r3; this pins the bf16 recovery under the selective-remat
policies.

Both configs run in one process, sequentially (their persistent states
cannot coexist: 13.7GB + 12.0GB > 16GB HBM). Micro-step times are
min-of-N per config; run the script twice for cross-window confidence.

Usage: python benchmarks/accum_bf16_ab.py [micro_bs] [accum] [remat]
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


def main():
    from sdtpu.config import SD_V1_4
    from sdtpu.models.unet import init_unet
    from sdtpu.training import make_optimizer, make_train_step, multi_steps

    micro_bs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    accum = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    remat = sys.argv[3] if len(sys.argv) > 3 else "heavy"
    remat = {"full": True}.get(remat, remat)

    cfg = SD_V1_4
    print(f"device: {jax.devices()[0]}  micro_bs {micro_bs} accum {accum} "
          f"remat {remat}", flush=True)

    latents = jax.random.normal(jax.random.PRNGKey(1),
                                (micro_bs, 64, 64, 4), jnp.float32)
    context = jax.random.normal(jax.random.PRNGKey(2),
                                (micro_bs, 77, cfg.unet.context_dim),
                                jnp.float32)

    for name, acc_dtype in (("f32-accum", None), ("bf16-accum", jnp.bfloat16)):
        params = jax.jit(lambda k: init_unet(k, cfg.unet, dtype=jnp.float32))(
            jax.random.PRNGKey(0))
        opt = multi_steps(make_optimizer(), accum, accum_dtype=acc_dtype)
        opt_state = jax.jit(opt.init)(params)
        jax.block_until_ready(opt_state)
        step = jax.jit(
            make_train_step(cfg, opt, compute_dtype=jnp.bfloat16,
                            remat=remat),
            donate_argnums=(0, 1))
        p, o = params, opt_state
        del params, opt_state
        try:
            t0 = time.perf_counter()
            p, o, loss = step(p, o, (latents, context), jax.random.PRNGKey(3))
            loss = float(loss)
            print(f"  {name}: compile+first {time.perf_counter()-t0:.1f}s "
                  f"loss {loss:.4f}", flush=True)
            ts = []
            key = jax.random.PRNGKey(4)
            for i in range(10):
                key, sub = jax.random.split(key)
                t0 = time.perf_counter()
                p, o, loss = step(p, o, (latents, context), sub)
                loss = float(loss)
                ts.append(time.perf_counter() - t0)
            ts.sort()
            mn, md = ts[0] * 1000, ts[len(ts) // 2] * 1000
            eff = micro_bs / mn * 1000
            print(f"{name:>11}: micro-step min {mn:7.1f}ms med {md:7.1f}ms "
                  f"({eff:.2f} img/s at min)", flush=True)
        except Exception as e:
            print(f"  {name}: FAIL {str(e)[:160]}", flush=True)
        del p, o, step
        gc.collect()


if __name__ == "__main__":
    main()
