"""Burn NamedMpk (`SDv1-4.mpk`) checkpoint reader AND writer.

The reference distributes weights as a Burn `NamedMpkFileRecorder::
<FullPrecisionSettings>` record (reference: src/bin/sample/main.rs:25-34,
README.md:14) and its convert binary emits one (src/bin/convert/
main.rs:32-37) — rmp-serde "named" msgpack where each Rust record struct
is a map keyed by field name. Because sdtpu's param tree deliberately
uses the same field names as the reference's module structs, reading an
.mpk is a structural transform:

- Param<Tensor> records unwrap ({"id": ..., "param": <tensor>})
- tensor payloads ({"shape": [...], "value"/"bytes": ...}) -> np.ndarray
- gamma/beta -> g/b, weight -> w (conv OIHW -> HWIO), bias -> b
- module hyperparams stored in records (n_head, eps, stride, ...) and
  stateless modules (SILU records) are dropped
- StableDiffusion root: alpha_cumulative_products -> alphas_cumprod,
  diffusion -> unet (stablediffusion/mod.rs:41-48)

The writer (save_mpk) is the exact inverse, so mpk round-trips are
byte-verified against our own writer (tests/test_io.py +
tests/fixtures/tiny.mpk); real Burn bytes have not been available to
test against — the reader is STRICT (unrecognized record shapes raise
rather than silently vanish) so any layout mismatch surfaces loudly.
"""

from __future__ import annotations

from typing import Any

import numpy as np

_DROP_KEYS = {
    "n_head", "n_group", "n_channel", "eps", "epsilon", "stride",
    "kernel_size", "dilation", "groups", "padding", "padding_actual",
    "silu", "silu_in", "silu_out", "silu_embed", "silu_time_embed",
    "silu1", "silu2", "gelu",
}

_RENAME = {
    "gamma": "g",
    "beta": "b",
    "alpha_cumulative_products": "alphas_cumprod",
    "diffusion": "unet",
}


class MpkFormatError(ValueError):
    """An .mpk subtree didn't match any known Burn record shape."""


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


def _transform(node: Any, path: str = "") -> Any:
    # Param unwrap
    if isinstance(node, dict) and "param" in node and "id" in node:
        return _transform(node["param"], path)

    t = _to_tensor(node)
    if t is not None:
        return t

    if isinstance(node, dict):
        out = {}
        for k, v in node.items():
            kpath = f"{path}/{k}"
            if k in _DROP_KEYS:
                continue
            nk = _RENAME.get(k, k)
            tv = _transform(v, kpath)
            if tv is None:
                # a record field we don't recognise: losing it silently
                # would corrupt the model — fail loudly instead
                raise MpkFormatError(
                    f"unrecognized .mpk record at {kpath!r} "
                    f"(type {type(v).__name__}"
                    + (f", keys {sorted(v)[:6]}" if isinstance(v, dict) else "")
                    + ")")
            if k == "weight":
                arr = np.asarray(tv)
                if arr.ndim == 4:  # burn Conv2d OIHW -> HWIO
                    tv = np.transpose(arr, (2, 3, 1, 0))
                nk = "w"
            elif k == "bias":
                nk = "b"
            out[nk] = tv
        return out if out else None

    if isinstance(node, (list, tuple)):
        vals = []
        for i, v in enumerate(node):
            tv = _transform(v, f"{path}[{i}]")
            if tv is None:
                raise MpkFormatError(f"unrecognized .mpk list entry at {path}[{i}]")
            vals.append(tv)
        return vals

    if isinstance(node, (int, float)):
        return node
    return None


def load_mpk(path: str) -> dict:
    """SDv1-4.mpk -> sdtpu param tree. Raises MpkFormatError on any
    subtree that doesn't match a known Burn record shape."""
    import msgpack

    with open(path, "rb") as f:
        raw = msgpack.unpack(f, raw=False, strict_map_key=False)
    # Burn wraps the record in {"item": ..., "metadata": ...} in some
    # versions; unwrap if present.
    if isinstance(raw, dict) and "item" in raw:
        raw = raw["item"]
    params = _transform(raw)
    if isinstance(params.get("n_steps"), float):
        params["n_steps"] = int(params["n_steps"])
    params.setdefault("n_steps", 1000)
    return params


# ------------------------------------------------------------ writer

_INV_RENAME = {v: k for k, v in _RENAME.items()}


def _tensor_record(arr: np.ndarray, mode: str):
    a = np.ascontiguousarray(np.asarray(arr, np.float32))
    if mode == "bytes":
        return {"shape": list(a.shape), "bytes": a.tobytes(), "dtype": "F32"}
    return {"shape": list(a.shape), "value": a.reshape(-1).tolist()}


def _param_record(arr: np.ndarray, pid: int, mode: str):
    """Burn Param<Tensor>: {"id": <ulid-ish string>, "param": <tensor>}."""
    return {"id": f"{pid:026d}", "param": _tensor_record(arr, mode)}


def _emit(node: Any, counter: list, mode: str) -> Any:
    if isinstance(node, dict):
        out = {}
        for k, v in node.items():
            nk = _INV_RENAME.get(k, k)
            if k == "w":
                arr = np.asarray(v)
                if arr.ndim == 4:  # HWIO -> burn Conv2d OIHW
                    arr = np.transpose(arr, (3, 2, 0, 1))
                counter[0] += 1
                out["weight"] = _param_record(arr, counter[0], mode)
            elif k == "b" and not isinstance(v, dict):
                counter[0] += 1
                out["bias"] = _param_record(np.asarray(v), counter[0], mode)
            elif k == "g" and not isinstance(v, dict):
                counter[0] += 1
                out["gamma"] = _param_record(np.asarray(v), counter[0], mode)
            else:
                out[nk] = _emit(v, counter, mode)
        # norm records: our "b" became "bias" above, but burn norms call
        # it "beta" — disambiguate by the sibling gamma
        if "gamma" in out and "bias" in out:
            out["beta"] = out.pop("bias")
        return out
    if isinstance(node, (list, tuple)):
        return [_emit(v, counter, mode) for v in node]
    if hasattr(node, "shape"):  # bare tensor (e.g. position_embedding)
        counter[0] += 1
        return _param_record(np.asarray(node), counter[0], mode)
    return node  # scalar hyperparam (n_steps)


def save_mpk(params: dict, path: str, mode: str = "bytes") -> None:
    """sdtpu param tree -> Burn NamedMpk record (the reference convert
    binary's output format, src/bin/convert/main.rs:32-37).

    mode: "bytes" (compact, TensorData-style) or "value" (burn 0.14
    DataSerialize-style nested float list). load_mpk reads both.
    """
    import msgpack

    counter = [0]
    item = _emit(params, counter, mode)
    record = {"item": item, "metadata": {"float": "f32", "int": "i64",
                                         "format": "sdtpu-namedmpk"}}
    with open(path, "wb") as f:
        f.write(msgpack.packb(record, use_bin_type=True))
