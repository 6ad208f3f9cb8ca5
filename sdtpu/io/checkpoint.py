"""Training checkpoint/resume (orbax-backed).

The reference has model-weight files only and no mid-run state at all
(SURVEY.md §5 — sampling runs are seconds, training doesn't exist).
sdtpu's training loop checkpoints (params, opt_state, step) atomically
and restores across restarts — including resharding onto a different
mesh layout at restore time, since orbax stores the logical pytree.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_train_state(path: str, params, opt_state, step: int,
                     ema: Optional[Any] = None) -> None:
    """Atomic save of the full train state under `path` (a directory).
    ema: optional EMA shadow params (saved under their own key)."""
    ckptr = _checkpointer()
    state = {"params": params, "opt_state": opt_state,
             "step": np.asarray(step, np.int64)}
    if ema is not None:
        state["ema"] = ema
    ckptr.save(os.path.abspath(path), state, force=True)


def restore_train_state(path: str, shardings: Optional[Any] = None,
                        template: Optional[Any] = None,
                        ema: Optional[Any] = None) -> Tuple[Any, ...]:
    """Restore (params, opt_state, step) — plus the EMA shadow as a 4th
    element when an `ema` template is given.

    template: a (params, opt_state) pair with the target pytree structure
    — REQUIRED to reconstruct optax NamedTuple states (orbax alone would
    return plain dicts). Pass a matching pytree of NamedShardings in
    `shardings` to place params directly onto a mesh (possibly a
    different layout than the one that saved)."""
    ckptr = _checkpointer()
    item = None
    if template is not None:
        t_params, t_opt = template
        item = {"params": t_params, "opt_state": t_opt,
                "step": np.asarray(0, np.int64)}
        if ema is not None:
            item["ema"] = ema
    state = ckptr.restore(os.path.abspath(path), item=item)
    params, opt_state = state["params"], state["opt_state"]
    if shardings is not None:
        params = jax.device_put(params, shardings)
    out = (params, opt_state, int(state["step"]))
    if ema is not None:
        out = out + (state["ema"],)
    return out
