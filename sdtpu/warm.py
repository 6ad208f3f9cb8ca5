"""Cold-start overlap: background AOT warm of the sampler/decode graphs.

The reference binary is eager — it loads weights and runs
(sample/main.rs:21-60), paying no compile step. sdtpu's first image
instead pays four *serialized* phases on the tunneled TPU: the
session-attach stall (server tears down the previous client's buffers,
BENCHLOG r4), param init, the CLIP encodes, and the sampler/decode
compile + server-side program load (the dominant residual,
BENCHLOG r3 cold_compile_probe: codegen happens at first *execution*
of a never-loaded program, not at the XLA-compile step).

The compile phase has no data dependency on any of the others — it
needs only shapes. `WarmStart` runs it on a background thread:

  1. `.lower()` + `.compile()` the sampler and decode jits from
     ShapeDtypeStructs (host CPU + compile-RPC work),
  2. optionally executes each compiled program once on device-created
     zeros, forcing the server-side program load while the main thread
     is still paying attach/init/CLIP.

The compiled executables are handed back so the caller's first real
call reuses them directly (zero retrace, zero reload). bench.py uses
this behind SDTPU_OVERLAP=1 and reports `first_image_s`; the CLI warms
during weight load.

Scope: single-device, noise-free samplers (ddim/dpmpp/euler/heun —
euler_a threads a PRNG key whose construction the caller owns).
Everything is best-effort: any failure is recorded and the caller
falls back to the plain jit path.
"""

from __future__ import annotations

import threading
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

NOISE_FREE_SAMPLERS = ("ddim", "dpmpp", "euler", "heun")


def build_sample_avals(config, *, batch: int, size: int, compute_dtype,
                       seed: int = 0):
    """ShapeDtypeStructs exactly matching the first `sample_latent` call
    on a spec-init + `_cast_param_tree`-cast tree (the bench/CLI path).

    Float param leaves take `compute_dtype` (StableDiffusion casts at
    load, pipeline.py:_cast_param_tree); `alphas_cumprod` stays f32 and
    `n_steps` stays a Python int, matching the real pytree.
    """
    from sdtpu.diffusion import scaled_linear_alphas_cumprod
    from sdtpu.models import rng
    from sdtpu.models.clip import init_clip
    from sdtpu.models.unet import init_unet
    from sdtpu.models.vae import init_autoencoder

    k1, k2, k3 = rng.split(rng.spec_key(seed), 3)
    spec = {
        "clip": init_clip(k1, config.clip),
        "unet": init_unet(k2, config.unet),
        "autoencoder": init_autoencoder(k3, config.vae),
    }

    def aval(s: rng.LeafSpec):
        dt = np.dtype(s.dtype)
        if jnp.issubdtype(dt, jnp.floating):
            dt = np.dtype(compute_dtype)
        return jax.ShapeDtypeStruct(s.shape, dt)

    params = rng._map_specs(spec, aval)
    # init_* emits norm scales/biases (and other constant-initialised
    # leaves) as CONCRETE arrays, not LeafSpecs — _map_specs passes them
    # through. Abstract them too, with the same float->compute_dtype
    # cast rule, or the AOT signature pins them at the init default f32.
    def concrete_aval(leaf):
        if isinstance(leaf, jax.ShapeDtypeStruct):
            return leaf
        arr = np.asarray(leaf)
        dt = (np.dtype(compute_dtype)
              if jnp.issubdtype(arr.dtype, jnp.floating) else arr.dtype)
        return jax.ShapeDtypeStruct(arr.shape, dt)

    params = jax.tree_util.tree_map(concrete_aval, params)
    alphas = np.asarray(scaled_linear_alphas_cumprod(1000))
    params["alphas_cumprod"] = jax.ShapeDtypeStruct(alphas.shape, alphas.dtype)
    params["n_steps"] = 1000

    n_ctx, width = config.clip.n_ctx, config.clip.n_state
    cdt = np.dtype(compute_dtype)
    # config-derived spatial factor, NOT a hardcoded 8: presets with
    # fewer VAE levels (e.g. the tiny test config) have vae_factor != 8
    # and a mismatched aval would waste the whole warm compile+exec
    hw = size // config.vae_factor
    return dict(
        params=params,
        latent=jax.ShapeDtypeStruct((batch, hw, hw, 4), np.float32),
        context=jax.ShapeDtypeStruct((batch, n_ctx, width), cdt),
        ctx_valid=jax.ShapeDtypeStruct((batch, n_ctx), np.bool_),
        uncond_context=jax.ShapeDtypeStruct((1, n_ctx, width), cdt),
        uncond_valid=jax.ShapeDtypeStruct((1, n_ctx), np.bool_),
        tokens=jax.ShapeDtypeStruct((1, n_ctx), np.int32),
    )


def _zeros_like_avals(tree):
    """Device zeros for a pytree of ShapeDtypeStructs (non-aval leaves —
    e.g. the n_steps int — pass through). One trivial fill program."""
    def z(a):
        if isinstance(a, jax.ShapeDtypeStruct):
            return jnp.zeros(a.shape, a.dtype)
        return a
    return jax.jit(lambda: jax.tree_util.tree_map(z, tree))()


class WarmStart:
    """Background AOT warm of the sampler (and decode) graphs.

    start() returns immediately; join() blocks until done. On success
    `.sampler` / `.decode` hold compiled executables callable with the
    same positional args as `_sample_latent_impl` / `_decode_u8_impl`
    (statics baked in); on any failure they stay None and `.error`
    holds the exception.
    """

    def __init__(self, config, *, batch: int, size: int, compute_dtype,
                 guidance_scale: float = 7.5, n_steps: int = 20,
                 sampler: str = "ddim", karras_sigmas: bool = False,
                 parity_two_pass: bool = False,
                 exec_warm: bool = True, warm_clip: bool = True,
                 seed: int = 0):
        if sampler not in NOISE_FREE_SAMPLERS:
            raise ValueError(
                f"warm start supports {NOISE_FREE_SAMPLERS}, not {sampler!r}")
        self.config = config
        self.kw = dict(batch=batch, size=size, compute_dtype=compute_dtype,
                       guidance_scale=guidance_scale, n_steps=n_steps,
                       sampler=sampler, karras_sigmas=karras_sigmas,
                       parity_two_pass=parity_two_pass,
                       exec_warm=exec_warm, warm_clip=warm_clip, seed=seed)
        self.sampler: Optional[object] = None
        self.decode: Optional[object] = None
        self.clip: Optional[object] = None
        self.error: Optional[BaseException] = None
        self.timeline: list = []  # (label, seconds-from-start)
        self._thread: Optional[threading.Thread] = None
        self._t0 = None

    # ------------------------------------------------------------ run
    def _run(self):
        import time

        from sdtpu.pipeline import (_clip_impl, _decode_u8_impl,
                                    _sample_latent_impl)

        kw = self.kw
        cfg = self.config
        t0 = self._t0 = time.perf_counter()
        mark = lambda label: self.timeline.append(
            (label, round(time.perf_counter() - t0, 2)))
        try:
            av = build_sample_avals(cfg, batch=kw["batch"], size=kw["size"],
                                    compute_dtype=kw["compute_dtype"],
                                    seed=kw["seed"])
            mark("avals")

            sampler_c = _sample_latent_impl.lower(
                av["params"], av["latent"], av["context"], av["ctx_valid"],
                av["uncond_context"], av["uncond_valid"],
                kw["guidance_scale"], None, None, None,
                config=cfg, compute_dtype=kw["compute_dtype"],
                n_train_steps=1000, n_steps=kw["n_steps"],
                parity_two_pass=kw["parity_two_pass"],
                sampler=kw["sampler"], skip_steps=0,
                karras_sigmas=kw["karras_sigmas"],
            ).compile()
            mark("sampler_compile")

            decode_c = _decode_u8_impl.lower(
                av["params"], av["latent"], config=cfg,
                compute_dtype=kw["compute_dtype"],
            ).compile()
            mark("decode_compile")

            clip_c = None
            if kw["warm_clip"]:
                clip_c = _clip_impl.lower(
                    av["params"]["clip"], av["tokens"], config=cfg,
                ).compile()
                mark("clip_compile")

            if kw["exec_warm"]:
                # Execute once on zeros: forces the server-side program
                # load (BENCHLOG r3: the dominant cold cost defers to
                # first execution) while the main thread does init/CLIP.
                z = _zeros_like_avals(av)
                mark("zeros")
                if clip_c is not None:
                    np.asarray(clip_c(z["params"]["clip"], z["tokens"]))[0, 0, 0]
                    mark("clip_exec")
                lat = sampler_c(
                    z["params"], z["latent"], z["context"], z["ctx_valid"],
                    z["uncond_context"], z["uncond_valid"],
                    kw["guidance_scale"], None, None, None)
                np.asarray(jnp.sum(lat))  # scalar sync (CLAUDE.md)
                mark("sampler_exec")
                img = decode_c(z["params"], lat)
                np.asarray(img[0, 0, 0])  # 3-byte corner fetch sync
                mark("decode_exec")
                del z, lat, img  # free the ~2.1GB dummy tree

            # publish only after exec so callers never race a half-warm
            # executable
            self.sampler, self.decode, self.clip = sampler_c, decode_c, clip_c
        except BaseException as e:  # noqa: BLE001 — best-effort by design
            self.error = e
            mark(f"error:{type(e).__name__}")

    # ------------------------------------------------------------ api
    def start(self) -> "WarmStart":
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="sdtpu-warm")
        self._thread.start()
        return self

    def join(self, timeout: Optional[float] = None) -> bool:
        """True if warm completed successfully (executables available)."""
        if self._thread is not None:
            self._thread.join(timeout)
        return self.sampler is not None and self.error is None
