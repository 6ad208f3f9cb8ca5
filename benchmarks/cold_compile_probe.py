#!/usr/bin/env python
"""Cold-compile attribution probe (VERDICT r3 task #3).

Separates, for the 512px sampler graph on the tunneled TPU:
  lower_s    - trace + jaxpr -> StableHLO lowering (local CPU)
  compile_s  - XLA/Mosaic compilation (remote via the axon tunnel)
  first_s    - FIRST execution incl. program load on the device
  second_s   - steady-state execution

Run with SDTPU_CACHE pointed at an EMPTY dir for the cold numbers and at
the warm dir for the delta. Observed r3 (BENCHLOG): the bench-visible
"compile" cost has a large silent component between the logged XLA
compile and the first result — this probe pins which phase owns it.
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
                      os.environ.get("SDTPU_CACHE", "/tmp/sdtpu_probe_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def main():
    from sdtpu.config import SD_V1_4
    from sdtpu.diffusion import scaled_linear_alphas_cumprod
    from sdtpu.models.unet import init_unet
    import sdtpu.pipeline as pipeline

    cfg = SD_V1_4
    dtype = jnp.bfloat16
    params = {
        "unet": init_unet(jax.random.PRNGKey(0), cfg.unet, dtype=dtype),
        "alphas_cumprod": scaled_linear_alphas_cumprod(1000),
        "n_steps": 1000,
    }
    jax.block_until_ready(params["unet"])
    print(f"device: {jax.devices()[0]}", flush=True)

    batch, steps = 4, 20
    ctx = jnp.zeros((batch, 77, cfg.unet.context_dim), dtype)
    unctx = jnp.zeros((1, 77, cfg.unet.context_dim), dtype)
    valid = jnp.ones((batch, 77), bool)
    unvalid = jnp.ones((1, 77), bool)
    lat0 = jax.random.normal(jax.random.PRNGKey(7), (batch, 64, 64, 4),
                             jnp.float32)
    args = (params, lat0, ctx, valid, unctx, unvalid, 7.5)
    kwargs = dict(config=cfg, compute_dtype=dtype, n_train_steps=1000,
                  n_steps=steps, parity_two_pass=False, sampler="ddim")

    t0 = time.perf_counter()
    lowered = pipeline._sample_latent_impl.lower(*args, **kwargs)
    lower_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = compiled(*args)
    np.asarray(jnp.sum(out))
    first_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = compiled(*args)
    np.asarray(jnp.sum(out))
    second_s = time.perf_counter() - t0
    print(f"trace+lower_s={lower_s:.2f} compile_s={compile_s:.2f} "
          f"first_exec_s={first_s:.2f} second_exec_s={second_s:.2f}",
          flush=True)


if __name__ == "__main__":
    main()
