#!/usr/bin/env python
"""Serialized-executable AOT probe (VERDICT r3 task #1, last clause).

Question: can `jax.experimental.serialize_executable` capture the
compiled sampler so a FRESH process skips the server-side codegen that
dominates cold starts (BENCHLOG: first_exec 637s cold / 143s warm-local
-cache on the tunneled TPU)?

Three modes:
  support  - tiny matmul graph: serialize -> fresh-deserialize in-process,
             proves/disproves runtime support cheaply.
  save     - compile the 512px sampler graph, run it once (so any
             load-time server codegen has happened), serialize to
             /tmp/sdtpu_aot/sampler.bin (+ pickled in/out trees).
  load     - FRESH process: deserialize_and_load + time the first
             execution. Compare against the 143s warm-local-cache
             first-exec from cold_compile_probe.

The sampler graph mirrors benchmarks/cold_compile_probe.py (UNet-only
params; reference scope: the sample binary's one hot graph,
sample/main.rs:39-77 equivalent).
"""

import os
import pickle
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

AOT_DIR = os.environ.get("SDTPU_AOT_DIR", "/tmp/sdtpu_aot")

# deliberately NOT sharing bench's persistent cache: this probe measures
# what the serialized executable buys INDEPENDENT of the StableHLO cache
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("SDTPU_CACHE", "/tmp/sdtpu_aot_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def _support():
    from jax.experimental import serialize_executable as se

    @jax.jit
    def f(a, b):
        return jnp.tanh(a @ b) + 1.0

    a = jnp.ones((256, 256), jnp.bfloat16)
    b = jnp.ones((256, 256), jnp.bfloat16)
    compiled = jax.jit(f).lower(a, b).compile()
    np.asarray(jnp.sum(compiled(a, b).astype(jnp.float32)))
    t0 = time.perf_counter()
    payload, in_tree, out_tree = se.serialize(compiled)
    ser_s = time.perf_counter() - t0
    print(f"serialize: OK, {len(payload)} bytes in {ser_s:.2f}s", flush=True)
    t0 = time.perf_counter()
    reloaded = se.deserialize_and_load(payload, in_tree, out_tree)
    out = reloaded(a, b)
    np.asarray(jnp.sum(out.astype(jnp.float32)))
    print(f"deserialize+exec: OK in {time.perf_counter() - t0:.2f}s",
          flush=True)
    ref = np.asarray(compiled(a, b).astype(jnp.float32))
    got = np.asarray(out.astype(jnp.float32))
    assert np.array_equal(ref, got)
    print("support: PASS (bit-equal output)", flush=True)


def _build_args():
    from sdtpu.config import SD_V1_4
    from sdtpu.diffusion import scaled_linear_alphas_cumprod
    from sdtpu.models.unet import init_unet

    cfg = SD_V1_4
    dtype = jnp.bfloat16
    params = {
        "unet": init_unet(jax.random.PRNGKey(0), cfg.unet, dtype=dtype),
        "alphas_cumprod": scaled_linear_alphas_cumprod(1000),
        "n_steps": 1000,
    }
    jax.block_until_ready(params["unet"])
    batch = 4
    ctx = jnp.zeros((batch, 77, cfg.unet.context_dim), dtype)
    unctx = jnp.zeros((1, 77, cfg.unet.context_dim), dtype)
    valid = jnp.ones((batch, 77), bool)
    unvalid = jnp.ones((1, 77), bool)
    lat0 = jax.random.normal(jax.random.PRNGKey(7), (batch, 64, 64, 4),
                             jnp.float32)
    args = (params, lat0, ctx, valid, unctx, unvalid, 7.5)
    kwargs = dict(config=cfg, compute_dtype=dtype, n_train_steps=1000,
                  n_steps=20, parity_two_pass=False, sampler="ddim")
    return args, kwargs


def _save():
    from jax.experimental import serialize_executable as se
    import sdtpu.pipeline as pipeline

    args, kwargs = _build_args()
    t0 = time.perf_counter()
    compiled = pipeline._sample_latent_impl.lower(*args, **kwargs).compile()
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(jnp.sum(compiled(*args)))
    first_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    payload, in_tree, out_tree = se.serialize(compiled)
    ser_s = time.perf_counter() - t0
    os.makedirs(AOT_DIR, exist_ok=True)
    with open(os.path.join(AOT_DIR, "sampler.bin"), "wb") as f:
        f.write(payload)
    with open(os.path.join(AOT_DIR, "sampler.trees"), "wb") as f:
        pickle.dump((in_tree, out_tree), f)
    print(f"compile_s={compile_s:.2f} first_exec_s={first_s:.2f} "
          f"serialize_s={ser_s:.2f} bytes={len(payload)}", flush=True)


def _load():
    from jax.experimental import serialize_executable as se

    with open(os.path.join(AOT_DIR, "sampler.bin"), "rb") as f:
        payload = f.read()
    with open(os.path.join(AOT_DIR, "sampler.trees"), "rb") as f:
        in_tree, out_tree = pickle.load(f)
    t0 = time.perf_counter()
    reloaded = se.deserialize_and_load(payload, in_tree, out_tree)
    deser_s = time.perf_counter() - t0
    args, _ = _build_args()
    t0 = time.perf_counter()
    out = reloaded(*args)
    np.asarray(jnp.sum(out))
    first_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(jnp.sum(reloaded(*args)))
    second_s = time.perf_counter() - t0
    print(f"deserialize_s={deser_s:.2f} first_exec_s={first_s:.2f} "
          f"second_exec_s={second_s:.2f}", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "support"
    print(f"device: {jax.devices()[0]}  mode: {mode}", flush=True)
    {"support": _support, "save": _save, "load": _load}[mode]()
