#!/usr/bin/env python
"""LoRA fine-tune throughput at SD v1.4 scale, single chip.

vs full fine-tuning: the optimizer state covers only the adapter (a few
MB instead of 6.9GB AdamW m/v) and the base stays frozen in f32
(3.4GB), so the HBM freed goes to batch. Full fine-tune tops out at
batch 4 on a 16GB v5e (BENCHLOG); this measures how far LoRA pushes it.
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
    from sdtpu.lora import init_lora, lora_param_count, make_lora_train_step
    from sdtpu.models.unet import init_unet
    from sdtpu.training import make_optimizer

    cfg = SD_V1_4
    print(f"device: {jax.devices()[0]}", flush=True)

    base = jax.jit(lambda k: init_unet(k, cfg.unet, dtype=jnp.float32))(
        jax.random.PRNGKey(0))
    import numpy as np

    rank = 8
    lora0 = init_lora(jax.random.PRNGKey(1), base, rank=rank)
    # host copy: the train step donates its lora arg, so each config
    # must start from a fresh device tree
    lora_host = jax.tree_util.tree_map(np.asarray, lora0)
    print(f"rank {rank}: {lora_param_count(lora0)/1e6:.2f}M adapter params",
          flush=True)
    opt = make_optimizer(lr=1e-4)
    # argv[1]: comma-separated batch:remat pairs (remat in
    # full/dots/heavy/none), e.g. "16:none,24:heavy,32:heavy" — r4
    # re-measure of the plateau under the selective policies.
    if len(sys.argv) > 1:
        def _r(tok):
            b, r = tok.split(":")
            return int(b), {"full": True, "none": False}.get(r, r)
        configs = tuple(_r(t) for t in sys.argv[1].split(","))
    else:
        configs = ((4, True), (8, True), (16, True), (8, False),
                   (16, False), (24, False))
    for batch, remat in configs:
        lora = jax.tree_util.tree_map(jnp.asarray, lora_host)
        opt_state = jax.jit(opt.init)(lora)
        step = jax.jit(
            make_lora_train_step(cfg, opt, scale=2.0,
                                 compute_dtype=jnp.bfloat16, remat=remat),
            donate_argnums=(0, 1))
        latents = jax.random.normal(jax.random.PRNGKey(2),
                                    (batch, 64, 64, 4), jnp.float32)
        context = jax.random.normal(jax.random.PRNGKey(3),
                                    (batch, 77, cfg.unet.context_dim),
                                    jnp.float32)
        l, o = lora, opt_state
        try:
            t0 = time.perf_counter()
            l, o, loss = step(l, o, base, (latents, context),
                              jax.random.PRNGKey(4))
            loss = float(loss)
            compile_s = time.perf_counter() - t0
            ts = []
            for i in range(4):
                t0 = time.perf_counter()
                l, o, loss = step(l, o, base, (latents, context),
                                  jax.random.PRNGKey(5 + i))
                loss = float(loss)
                ts.append(time.perf_counter() - t0)
            ms = min(ts) * 1000
            print(f"lora batch {batch} remat={remat}: {ms:8.1f}ms/step "
                  f"({batch/ms*1000:.2f} img/s) loss {loss:.4f} "
                  f"compile+first {compile_s:.1f}s", flush=True)
        except Exception as e:
            print(f"lora batch {batch} remat={remat}: FAIL {str(e)[:140]}",
                  flush=True)
        import gc

        del l, o, step, opt_state
        gc.collect()


if __name__ == "__main__":
    main()
