"""Burn NamedMpk (`SDv1-4.mpk`) checkpoint reader.

The reference distributes weights as a Burn `NamedMpkFileRecorder::
<FullPrecisionSettings>` record (reference: src/bin/sample/main.rs:25-34,
README.md:14) — rmp-serde "named" msgpack where each Rust record struct is
a map keyed by field name. Because sdtpu's param tree deliberately uses
the same field names as the reference's module structs, reading an .mpk
is a structural transform:

- Param<Tensor> records unwrap ({"id": ..., "param": <tensor>})
- tensor payloads ({"shape": [...], "value"/"bytes": ...}) -> np.ndarray
- gamma/beta -> g/b, weight -> w (conv OIHW -> HWIO), bias -> b
- module hyperparams stored in records (n_head, eps, stride, ...) and
  stateless modules (SILU records) are dropped
- StableDiffusion root: alpha_cumulative_products -> alphas_cumprod,
  diffusion -> unet (stablediffusion/mod.rs:41-48)
"""

from __future__ import annotations

from typing import Any

import numpy as np

_DROP_KEYS = {
    "n_head", "n_group", "n_channel", "eps", "stride", "kernel_size",
    "dilation", "groups", "padding", "padding_actual",
    "silu", "silu_in", "silu_out", "silu_embed", "silu_time_embed",
    "silu1", "silu2", "gelu",
}

_RENAME = {
    "gamma": "g",
    "beta": "b",
    "alpha_cumulative_products": "alphas_cumprod",
    "diffusion": "unet",
    "downsampler": "downsampler",
}


def _to_tensor(node) -> np.ndarray | None:
    """Recognise burn's tensor-data records."""
    if not isinstance(node, dict):
        return None
    keys = set(node.keys())
    if "shape" not in keys:
        return None
    shape = node["shape"]
    if "value" in keys:
        return np.asarray(node["value"], np.float32).reshape(shape)
    if "bytes" in keys:
        raw = node["bytes"]
        if isinstance(raw, (bytes, bytearray)):
            dtype = {"F32": np.float32, "F64": np.float64}.get(
                str(node.get("dtype", "F32")), np.float32
            )
            return np.frombuffer(bytes(raw), dtype=dtype).astype(np.float32).reshape(shape)
        return np.asarray(raw, np.float32).reshape(shape)
    return None


def _transform(node: Any, key_hint: str = "") -> Any:
    # Param unwrap
    if isinstance(node, dict) and "param" in node and "id" in node:
        return _transform(node["param"], key_hint)

    t = _to_tensor(node)
    if t is not None:
        return t

    if isinstance(node, dict):
        out = {}
        for k, v in node.items():
            if k in _DROP_KEYS:
                continue
            nk = _RENAME.get(k, k)
            tv = _transform(v, k)
            if tv is None:
                continue
            if k == "weight":
                arr = np.asarray(tv)
                if arr.ndim == 4:  # burn Conv2d OIHW -> HWIO
                    tv = np.transpose(arr, (2, 3, 1, 0))
                nk = "w"
            elif k == "bias":
                nk = "b"
            out[nk] = tv
        # collapse {"w": ...} leftovers from Embedding-like records is not
        # needed — embeddings keep a {"w": ...} dict in our layout too.
        return out if out else None

    if isinstance(node, (list, tuple)):
        vals = [_transform(v, key_hint) for v in node]
        return [v for v in vals if v is not None]

    if isinstance(node, (int, float)):
        return node
    return None


def load_mpk(path: str) -> dict:
    """SDv1-4.mpk -> sdtpu param tree."""
    import msgpack

    with open(path, "rb") as f:
        raw = msgpack.unpack(f, raw=False, strict_map_key=False)
    # Burn wraps the record in {"item": ..., "metadata": ...} in some
    # versions; unwrap if present.
    if isinstance(raw, dict) and "item" in raw:
        raw = raw["item"]
    params = _transform(raw)
    # position_embedding arrives as a bare tensor (Param<Tensor>), token
    # embedding as {"w": ...}; normalise n_steps
    if isinstance(params.get("n_steps"), float):
        params["n_steps"] = int(params["n_steps"])
    params.setdefault("n_steps", 1000)
    return params
