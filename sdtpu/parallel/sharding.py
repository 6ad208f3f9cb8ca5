"""Sharding rules: map param-tree paths to PartitionSpecs.

Tensor-parallel rules shard the contraction-friendly dims of the large
weights over "tp" (GSPMD then propagates through the computation and
inserts the all-reduces over ICI):

- attention / MLP input projections (query, key, value, fc1, geglu.proj):
  linear w [in, out] -> (None, "tp")   (column parallel)
- output projections (out, fc2, mlp.lin): w [in, out] -> ("tp", None)
  (row parallel; XLA inserts the psum)
- conv kernels [kh, kw, in, out]: out-channel sharded (None,)*3 + ("tp",)
  for 3x3 convs where channels >= 256
- everything else (norms, biases, embeddings, time-embed MLP): replicated

Batch ("dp") sharding applies to activations only.
"""

from __future__ import annotations

from typing import Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_COLUMN_PARALLEL = ("query/w", "key/w", "value/w", "fc1/w", "geglu/proj/w")
_ROW_PARALLEL = ("out/w", "fc2/w", "mlp/lin/w")


def _spec_for(path: str, shape: Tuple[int, ...], tp: int) -> P:
    if tp <= 1:
        return P()
    for suffix in _COLUMN_PARALLEL:
        if path.endswith(suffix) and shape[-1] % tp == 0:
            return P(*((None,) * (len(shape) - 1) + ("tp",)))
    for suffix in _ROW_PARALLEL:
        if path.endswith(suffix) and shape[0] % tp == 0:
            return P(*(("tp",) + (None,) * (len(shape) - 1)))
    if path.endswith("/w") and len(shape) == 4 and shape[-1] >= 256 and shape[-1] % tp == 0:
        return P(None, None, None, "tp")
    return P()


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings for the param tree."""
    tp = mesh.shape.get("tp", 1)

    def f(path, leaf):
        arr = np.asarray(leaf) if not hasattr(leaf, "shape") else leaf
        shape = tuple(getattr(arr, "shape", ()))
        return NamedSharding(mesh, _spec_for(_path_str(path), shape, tp))

    return jax.tree_util.tree_map_with_path(f, params)


def shard_params(params, mesh: Mesh):
    return jax.device_put(params, param_shardings(params, mesh))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard dim 0 (batch) over dp, replicate the rest."""
    return NamedSharding(mesh, P(*(("dp",) + (None,) * (ndim - 1))))


def shard_batch(x, mesh: Mesh):
    return jax.device_put(x, batch_sharding(mesh, x.ndim))
