"""Kernel dispatch policy.

Selects between the XLA-fused reference ops and the Pallas TPU kernels
(sdtpu/ops/flash_attention.py, fused groupnorm). Controlled by the
SDTPU_KERNELS env var: "xla" (portable default off-TPU), "pallas"
(TPU fast path), "auto" (pallas on TPU backends, xla elsewhere).
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax


@lru_cache()
def kernel_mode() -> str:
    mode = os.environ.get("SDTPU_KERNELS", "auto").lower()
    if mode not in ("auto", "xla", "pallas"):
        raise ValueError(f"SDTPU_KERNELS must be auto|xla|pallas, got {mode}")
    return mode


@lru_cache()
def use_pallas() -> bool:
    mode = kernel_mode()
    if mode == "pallas":
        return True
    if mode == "xla":
        return False
    # Explicit allowlist: the Pallas kernels here are Mosaic/TPU programs;
    # an unknown future backend must opt in via SDTPU_KERNELS=pallas
    # rather than being assumed capable.
    return jax.default_backend() == "tpu"
