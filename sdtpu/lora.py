"""LoRA (low-rank adaptation) fine-tuning for the UNet.

Not in the reference (inference-only, SURVEY.md SS0). sdtpu implements
LoRA the JAX way: no module surgery, no hooks. The adapter is a second
pytree mirroring the UNet's attention linears; `apply_lora` produces the
effective params functionally (w_eff = w + a @ b * alpha/rank) and the
train step differentiates THROUGH that composition w.r.t. the adapter
only — the base tree is a constant argument, XLA constant-folds nothing
and the optimizer state covers just the adapter (MBs instead of the
6.9GB AdamW m/v of a full fine-tune, which is what makes large batches
fit a 16GB chip).

Adapter tree layout: nested dicts only; list positions in the params
tree become STRING indices ("3") so a sparse adapter (attention blocks
exist at some levels only) survives the '/'-flattened safetensors
round-trip without the digit-keys->list coercion io.native applies to
full checkpoints.
"""

from __future__ import annotations

import json
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.config import StableDiffusionConfig

# the standard LoRA recipe: adapt the attention projections (self- and
# cross-attention query/key/value/out — models/unet.py _init_cross_attn)
DEFAULT_TARGETS = ("query", "key", "value", "out")


def init_lora(key, params, rank: int = 8, targets=DEFAULT_TARGETS):
    """Build an adapter tree for every 2-D linear named in `targets`.

    a ~ N(0, 1/rank), b = 0 (the LoRA paper init: the adapter starts as
    an exact no-op and the product a@b has unit-ish scale per rank).
    """
    counter = [0]

    def rec(node, name):
        if isinstance(node, dict):
            w = node.get("w")
            if name in targets and w is not None and getattr(w, "ndim", 0) == 2:
                n_in, n_out = w.shape
                counter[0] += 1
                k = jax.random.fold_in(key, counter[0])
                return {
                    "a": (jax.random.normal(k, (n_in, rank), jnp.float32)
                          / np.sqrt(rank)),
                    "b": jnp.zeros((rank, n_out), jnp.float32),
                }
            sub = {k2: rec(v, k2) for k2, v in node.items()}
            sub = {k2: v for k2, v in sub.items() if v is not None}
            return sub or None
        if isinstance(node, (list, tuple)):
            sub = {str(i): rec(v, name) for i, v in enumerate(node)}
            sub = {k2: v for k2, v in sub.items() if v is not None}
            return sub or None
        return None

    lora = rec(params, "")
    if not lora:
        raise ValueError(f"no {targets} linears found to adapt")
    return lora


def apply_lora(params, lora, scale: float, dtype=None):
    """Effective params: targeted w -> w + (a @ b) * scale, computed in
    f32 and cast to `dtype` (default: keep w's dtype). Every non-target
    leaf is passed through by reference — no copies."""

    def rec(p, l):
        if l is None:
            return p
        if isinstance(p, dict):
            if "a" in l and "w" in p:
                delta = (l["a"] @ l["b"]) * scale
                w = p["w"].astype(jnp.float32) + delta
                new = dict(p)
                new["w"] = w.astype(dtype or p["w"].dtype)
                return new
            return {k: rec(v, l.get(k)) for k, v in p.items()}
        if isinstance(p, (list, tuple)):
            return type(p)(rec(v, l.get(str(i))) for i, v in enumerate(p))
        return p

    return rec(params, lora)


def lora_param_count(lora) -> int:
    return jax.tree_util.tree_reduce(
        lambda acc, leaf: acc + leaf.size, lora, 0)


def make_lora_train_step(cfg: StableDiffusionConfig, optimizer, scale: float,
                         compute_dtype=jnp.float32, remat: bool | str = False):
    """train_step(lora, opt_state, base_params, batch, key) ->
    (lora, opt_state, loss). base_params is a non-donated constant input;
    only the adapter gets gradients/updates. batch as in
    training.make_train_step."""
    import optax

    from sdtpu.training import diffusion_loss

    eff_dtype = compute_dtype if compute_dtype != jnp.float32 else None

    def loss_fn(lora, base, latents, context, t, noise, ctx_valid):
        p = apply_lora(base, lora, scale, dtype=eff_dtype)
        return diffusion_loss(p, cfg, latents, context, t, noise,
                              ctx_valid=ctx_valid,
                              compute_dtype=compute_dtype, remat=remat)

    def train_step(lora, opt_state, base, batch, key):
        latents, context = batch[0], batch[1]
        ctx_valid = batch[2] if len(batch) > 2 else None
        kt, kn = jax.random.split(key)
        b = latents.shape[0]
        t = jax.random.randint(kt, (b,), 0, cfg.n_train_steps)
        noise = jax.random.normal(kn, latents.shape, jnp.float32)
        loss, grads = jax.value_and_grad(loss_fn)(
            lora, base, latents, context, t, noise, ctx_valid)
        updates, opt_state = optimizer.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        return lora, opt_state, loss

    return train_step


# ----------------------------------------------------------------- io


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, f"{prefix}{k}/"))
        else:
            out[f"{prefix}{k}"] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    # deliberately NO digit-keys->list coercion (adapters are sparse)
    root: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return root


def save_lora(lora, path: str, rank: int, alpha: float,
              config_name: str = "") -> None:
    from safetensors.numpy import save_file

    meta = {"format": "sdtpu-lora", "rank": str(int(rank)),
            "alpha": str(float(alpha)), "config": config_name}
    save_file(_flatten(lora), path, metadata=meta)


def load_lora(path: str) -> Tuple[Any, float, Dict[str, str]]:
    """-> (adapter tree, scale = alpha/rank, metadata)."""
    from safetensors import safe_open
    from safetensors.numpy import load_file

    with safe_open(path, framework="numpy") as f:
        meta = dict(f.metadata() or {})
    if meta.get("format") != "sdtpu-lora":
        raise ValueError(f"{path}: not an sdtpu LoRA file "
                         f"(metadata {json.dumps(meta)[:120]})")
    lora = _unflatten(load_file(path))
    scale = float(meta["alpha"]) / float(meta["rank"])
    return lora, scale, meta
