"""Elementwise activations.

These are VPU-bound; they exist as plain jnp functions so XLA fuses them
into the neighbouring matmul/conv — the reference instead dispatches each
as a separate libtorch op (e.g. SILU at reference: src/model/silu.rs:14-16).
"""

import jax
import jax.numpy as jnp


def silu(x):
    """x * sigmoid(x) (reference: src/model/silu.rs:14-16)."""
    return x * jax.nn.sigmoid(x)


def quick_gelu(x):
    """x * sigmoid(1.702 x) — CLIP's GELU approximation
    (reference: src/model/clip/mod.rs:217-227)."""
    return x * jax.nn.sigmoid(1.702 * x)


def gelu(x):
    """Exact erf-based GELU, matching burn's nn::Gelu used inside GEGLU
    (reference: src/model/unet/mod.rs:566-591)."""
    return jax.nn.gelu(x, approximate=False)


def geglu(x, gate):
    """GEGLU gate: x * gelu(gate) (reference: src/model/unet/mod.rs:578-592)."""
    return x * gelu(gate)
