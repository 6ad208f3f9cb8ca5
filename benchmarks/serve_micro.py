#!/usr/bin/env python
"""Steady-state serving throughput through the dynamic micro-batcher
(sdtpu/serve.py:Batcher) on the real chip — the end-to-end number a
deployment sees: tokenize + batched-CFG sampling + decode + u8 readback,
with concurrent requests coalesced into padded batches.

Reference point: bench.py's raw device throughput (sampling+decode, no
batching layer) is ~3.22 img/s/chip at the same config; the gap is the
batching window + per-item host work.
"""

import os
import sys
import threading
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
    from sdtpu.diffusion import scaled_linear_alphas_cumprod
    from sdtpu.models.clip import init_clip
    from sdtpu.models.unet import init_unet
    from sdtpu.models.vae import init_autoencoder
    from sdtpu.pipeline import StableDiffusion
    from sdtpu.serve import Batcher
    from sdtpu.tokenizer import SimpleTokenizer

    cfg = SD_V1_4
    print(f"device: {jax.devices()[0]}", flush=True)

    @jax.jit
    def _build(key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "clip": init_clip(k1, cfg.clip, dtype=jnp.bfloat16),
            "unet": init_unet(k2, cfg.unet, dtype=jnp.bfloat16),
            "autoencoder": init_autoencoder(k3, cfg.vae, dtype=jnp.bfloat16),
            "alphas_cumprod": scaled_linear_alphas_cumprod(1000),
        }

    params = _build(jax.random.PRNGKey(0))
    params["n_steps"] = 1000
    sd = StableDiffusion(params, cfg, compute_dtype=jnp.bfloat16)

    # NOREADBACK=1: device-resident serving — complete requests on a
    # cheap scalar sync (the validated device-done signal, CLAUDE.md)
    # instead of fetching the u8 image batch through the tunnel. The
    # A-vs-B gap is the TRANSPORT share of the serving stack; what
    # remains above bench.py's raw device number is the framework share
    # (VERDICT r3 task 4).
    class NoReadbackBatcher(Batcher):
        def _complete(self):
            while True:
                images, items, counts = self._readback_q.get()
                try:
                    float(jnp.sum(images[0, 0, 0].astype(jnp.float32)))
                    for *_rest, ev, slot in items:
                        slot["images"] = []
                        ev.set()
                except Exception as e:  # pragma: no cover
                    for *_rest, ev, slot in items:
                        slot["error"] = f"{type(e).__name__}: {e}"
                        ev.set()

    cls = (NoReadbackBatcher if os.environ.get("NOREADBACK", "0") == "1"
           else Batcher)
    ctx_cache = 0 if os.environ.get("CTXCACHE", "1") == "0" else 256
    print(f"mode: {'no-readback' if cls is NoReadbackBatcher else 'full'}"
          f" ctx_cache={ctx_cache}", flush=True)
    batcher = cls(sd, SimpleTokenizer(), max_batch=4, window_ms=25.0,
                  timeout_s=3600.0, ctx_cache_size=ctx_cache)

    steps = int(os.environ.get("STEPS", "20"))

    def one(seed):
        return batcher.submit("An ancient mossy stone.", steps=steps,
                              scale=7.5, seed=seed, n_images=1, negative="")

    t0 = time.perf_counter()
    one(0)  # compiles batch-1 graph
    print(f"warm batch-1: {time.perf_counter()-t0:.1f}s", flush=True)
    # warm the coalesced batch-4 graph
    t0 = time.perf_counter()
    th = [threading.Thread(target=one, args=(i,)) for i in range(1, 5)]
    [t.start() for t in th]
    [t.join() for t in th]
    print(f"warm batch-4: {time.perf_counter()-t0:.1f}s", flush=True)

    # steady state: 8 client threads, 32 images total
    n_clients, per_client = 8, 4
    done = []
    lock = threading.Lock()

    def client(cid):
        for i in range(per_client):
            one(100 + cid * per_client + i)
            with lock:
                done.append(time.perf_counter())

    t0 = time.perf_counter()
    th = [threading.Thread(target=client, args=(c,)) for c in range(n_clients)]
    [t.start() for t in th]
    [t.join() for t in th]
    wall = time.perf_counter() - t0
    n = n_clients * per_client
    print(f"steady-state: {n} images in {wall:.2f}s = "
          f"{n/wall:.3f} img/s through the serving stack", flush=True)
    # interior rate: drop the first full batch window's completions
    # (client startup + the first fill) so the number measures the
    # pipeline's steady state rather than amortised ramp — with only n
    # images the fill is a visible slice of the wall clock. The cut is
    # derived from the batcher config (ADVICE r4: a hardcoded 4 skews
    # the headline under different serve configs); RAMP_DROP overrides.
    done.sort()
    cut = int(os.environ.get("RAMP_DROP", str(batcher.max_batch)))
    interior = done[cut:]
    if len(interior) > 1:
        rate = (len(interior) - 1) / (interior[-1] - interior[0])
        print(f"interior (completions {cut + 1}..{n}): {rate:.3f} img/s",
              flush=True)


if __name__ == "__main__":
    main()
