"""Device-mesh construction.

The reference has no parallelism at all — one process, one device,
selected once at startup (reference: src/bin/sample/main.rs:59-83) and
zero collectives (Cargo.toml has no comm deps). sdtpu scales with
`jax.sharding.Mesh` + NamedSharding: XLA emits the collectives over
ICI/DCN; there is no hand-rolled transport layer to maintain.

Axes:
- "dp": data parallel — batch dim sharded; the BASELINE v5e-8 config
- "tp": tensor parallel — attention heads / channel dims of the big
  weights sharded; optional, for batch-1 latency
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    dp: Optional[int] = None,
    tp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ("dp", "tp") mesh. dp defaults to n_devices // tp."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // tp
    assert dp * tp <= n, f"mesh {dp}x{tp} needs {dp*tp} devices, have {n}"
    grid = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(grid, ("dp", "tp"))
