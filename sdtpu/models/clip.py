"""CLIP text encoder (reference: src/model/clip/mod.rs).

Pure-function JAX port of the architecture: token + learned position
embeddings, n_layer pre-LN residual blocks (causal self-attention + MLP
with QuickGELU), final LayerNorm. Returns the full hidden-state sequence
[B, S, n_state] — no pooling, no text projection (clip/mod.rs:56-75).

Param tree keys mirror the reference npy dump layout
(clip/load.rs:68-91): token_embedding/weight, position_embedding,
blocks/{i}/{attn,attn_ln,mlp,mlp_ln}, layer_norm.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.config import CLIPConfig
from sdtpu.models import rng
from sdtpu.models.initializers import init_embedding, init_linear, init_norm
from sdtpu.ops import causal_mask, layer_norm, linear, qkv_attention, quick_gelu, gelu


def init_clip(key, cfg: CLIPConfig, dtype=jnp.float32):
    keys = rng.split(key, cfg.n_layer + 2)
    blocks = []
    for i in range(cfg.n_layer):
        ka, k1, k2, k3, k4, km1, km2 = rng.split(keys[i], 7)
        blocks.append(
            {
                "attn": {
                    "query": init_linear(k1, cfg.n_state, cfg.n_state, dtype=dtype),
                    "key": init_linear(k2, cfg.n_state, cfg.n_state, dtype=dtype),
                    "value": init_linear(k3, cfg.n_state, cfg.n_state, dtype=dtype),
                    "out": init_linear(k4, cfg.n_state, cfg.n_state, dtype=dtype),
                },
                "attn_ln": init_norm(cfg.n_state, dtype),
                "mlp": {
                    "fc1": init_linear(km1, cfg.n_state, 4 * cfg.n_state, dtype=dtype),
                    "fc2": init_linear(km2, 4 * cfg.n_state, cfg.n_state, dtype=dtype),
                },
                "mlp_ln": init_norm(cfg.n_state, dtype),
            }
        )
    return {
        "token_embedding": init_embedding(keys[-2], cfg.n_vocab, cfg.n_state, dtype),
        "position_embedding": rng.normal(
            keys[-1], (cfg.n_ctx, cfg.n_state), dtype, scale=0.01),
        "blocks": blocks,
        "layer_norm": init_norm(cfg.n_state, dtype),
    }


def _block_apply(p, x, mask, cfg: CLIPConfig):
    act = quick_gelu if cfg.quick_gelu else gelu
    h = layer_norm(x, p["attn_ln"]["g"], p["attn_ln"]["b"], cfg.layer_norm_eps)
    a = p["attn"]
    q, k, v = linear(a["query"], h), linear(a["key"], h), linear(a["value"], h)
    h = linear(a["out"], qkv_attention(q, k, v, mask, cfg.n_head))
    x = x + h
    h = layer_norm(x, p["mlp_ln"]["g"], p["mlp_ln"]["b"], cfg.layer_norm_eps)
    h = linear(p["mlp"]["fc2"], act(linear(p["mlp"]["fc1"], h)))
    return x + h


def clip_apply(params, tokens, cfg: CLIPConfig):
    """tokens: [B, S] int32 (S <= n_ctx) -> [B, S, n_state].

    With right-padded tokens, padded positions produce garbage hidden
    states but — thanks to the causal mask — never influence valid
    positions; the pipeline masks them out of cross-attention, exactly
    reproducing the reference's unpadded behaviour.
    """
    b, s = tokens.shape
    dtype = params["position_embedding"].dtype
    mask = causal_mask(s, jnp.float32)
    x = params["token_embedding"]["w"][tokens] + params["position_embedding"][None, :s]

    n_blocks = len(params["blocks"]) - cfg.skip_last_layers
    for p in params["blocks"][:n_blocks]:
        x = _block_apply(p, x, mask, cfg)

    ln = params["layer_norm"]
    return layer_norm(x, ln["g"], ln["b"], cfg.layer_norm_eps)
