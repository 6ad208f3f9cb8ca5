"""Kernel dispatch policy.

Selects between the XLA-fused reference ops and the Pallas TPU kernels
(sdtpu/ops/flash_attention.py, fused groupnorm). Controlled by the
SDTPU_KERNELS env var: "xla" (portable default off-TPU), "pallas"
(TPU fast path), "auto" (pallas on TPU backends, xla elsewhere).
"""

from __future__ import annotations

import contextlib
import os
from functools import lru_cache

import jax

# depth of active force_xla() contexts (trace-time Python state — the
# _use_* gates all run at trace time, so a context wrapped around a
# traced region reliably pins every dispatch inside it)
_FORCE_XLA_DEPTH = 0
# depth of force_xla(allow_differentiable=True) contexts: kernels that
# carry a custom VJP (use_pallas_differentiable) may still dispatch
_ALLOW_DIFF_DEPTH = 0


@lru_cache()
def kernel_mode() -> str:
    mode = os.environ.get("SDTPU_KERNELS", "auto").lower()
    if mode not in ("auto", "xla", "pallas"):
        raise ValueError(f"SDTPU_KERNELS must be auto|xla|pallas, got {mode}")
    return mode


@contextlib.contextmanager
def force_xla(allow_differentiable: bool = False):
    """Pin every kernel dispatch inside the context to the XLA path.

    Used by the training loss: most Pallas kernels are forward-only
    (no custom VJP), so differentiating a graph that dispatched to them
    fails with 'Linearization failed ...'. Training traces under this
    context and gets a fully-differentiable lowering; inference
    dispatch is unaffected.

    allow_differentiable=True keeps the kernels that DO carry a custom
    VJP (gated on use_pallas_differentiable — the flash-attention
    forward) on their Pallas path; everything else still pins to XLA.
    """
    global _FORCE_XLA_DEPTH, _ALLOW_DIFF_DEPTH
    _FORCE_XLA_DEPTH += 1
    _ALLOW_DIFF_DEPTH += bool(allow_differentiable)
    try:
        yield
    finally:
        _FORCE_XLA_DEPTH -= 1
        _ALLOW_DIFF_DEPTH -= bool(allow_differentiable)


def use_pallas() -> bool:
    if _FORCE_XLA_DEPTH:
        return False
    return _use_pallas_cached()


def use_pallas_differentiable() -> bool:
    """Dispatch gate for kernels wrapped in a custom VJP (Pallas forward
    + XLA backward): allowed under force_xla(allow_differentiable=True),
    where plain use_pallas() kernels are not."""
    if _FORCE_XLA_DEPTH and not _ALLOW_DIFF_DEPTH:
        return False
    return _use_pallas_cached()


@lru_cache()
def _use_pallas_cached() -> bool:
    mode = kernel_mode()
    if mode == "pallas":
        return True
    if mode == "xla":
        return False
    # Explicit allowlist: the Pallas kernels here are Mosaic/TPU programs;
    # an unknown future backend must opt in via SDTPU_KERNELS=pallas
    # rather than being assumed capable.
    return jax.default_backend() == "tpu"
