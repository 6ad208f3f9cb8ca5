"""Debug invariants (SURVEY.md §5: the JAX-side answer to sanitizers).

- `assert_finite(tree, name)`: host-side NaN/Inf check over a pytree
- `checked(fn)`: wraps a jitted function with jax.debug NaN checks when
  SDTPU_DEBUG_NANS=1 (zero cost otherwise)
- `shape_check(x, expect)`: explicit shape/dtype invariant with a
  readable error
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def debug_enabled() -> bool:
    return os.environ.get("SDTPU_DEBUG_NANS", "0") not in ("0", "", "false")


def assert_finite(tree, name: str = "tree") -> None:
    bad = []

    def check(path, leaf):
        a = np.asarray(leaf)
        if a.dtype.kind == "f" and not np.isfinite(a).all():
            bad.append(jax.tree_util.keystr(path))

    jax.tree_util.tree_map_with_path(check, tree)
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad[:10]}")


def checked(fn):
    """In debug mode, insert a traced NaN check on the function output."""
    if not debug_enabled():
        return fn

    def wrapped(*args, **kw):
        out = fn(*args, **kw)

        def _chk(leaf):
            if isinstance(leaf, jnp.ndarray) and jnp.issubdtype(leaf.dtype, jnp.floating):
                jax.debug.callback(
                    lambda a: (_ for _ in ()).throw(FloatingPointError("NaN detected"))
                    if not np.isfinite(np.asarray(a)).all() else None, leaf)
            return leaf

        return jax.tree_util.tree_map(_chk, out)

    return wrapped


def shape_check(x, expect, name: str = "tensor") -> None:
    shape = tuple(x.shape)
    assert len(shape) == len(expect) and all(
        e is None or s == e for s, e in zip(shape, expect)
    ), f"{name}: expected shape {expect}, got {shape}"
