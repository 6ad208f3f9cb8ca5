"""Random param-tree initializers.

The reference can only load weights, never train; we keep initializers so
the framework runs standalone (tests, benches, training from scratch).
Shapes follow sdtpu conventions: linear [in,out], conv HWIO, see
sdtpu/ops/conv.py.

RNG goes through models/rng.py: pass a jax PRNG key for device-side
(traceable) init, or an `rng.HostKey` for pure-numpy init with zero XLA
compiles (the tree is then pushed with one device_put — see rng.py).
Affine norm params are plain numpy constants either way (no RNG, and a
bare jnp.ones outside jit would itself be a tiny remote compile each).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from sdtpu.models import rng


def _fan_in_uniform(key, shape, fan_in, dtype=jnp.float32):
    bound = 1.0 / (fan_in ** 0.5)
    return rng.uniform(key, shape, dtype, -bound, bound)


def init_linear(key, n_in: int, n_out: int, bias: bool = True, dtype=jnp.float32):
    kw, kb = rng.split(key)
    p = {"w": _fan_in_uniform(kw, (n_in, n_out), n_in, dtype)}
    if bias:
        p["b"] = _fan_in_uniform(kb, (n_out,), n_in, dtype)
    return p


def init_conv2d(key, n_in: int, n_out: int, k: int = 3, bias: bool = True, dtype=jnp.float32):
    kw, kb = rng.split(key)
    fan_in = n_in * k * k
    p = {"w": _fan_in_uniform(kw, (k, k, n_in, n_out), fan_in, dtype)}
    if bias:
        p["b"] = _fan_in_uniform(kb, (n_out,), fan_in, dtype)
    return p


def init_norm(n: int, dtype=jnp.float32):
    return {"g": np.ones((n,), np.dtype(dtype)), "b": np.zeros((n,), np.dtype(dtype))}


def init_embedding(key, n_vocab: int, n_dim: int, dtype=jnp.float32):
    return {"w": rng.normal(key, (n_vocab, n_dim), dtype, scale=0.02)}
