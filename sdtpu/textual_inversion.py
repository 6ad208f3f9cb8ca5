"""Textual inversion: learn new token embeddings for a concept.

Not in the reference (inference-only). The second standard
personalization method next to LoRA (sdtpu/lora.py): instead of
adapting weights, it learns `n_vectors` NEW rows of the CLIP token
embedding table for a placeholder word (e.g. "<sks>") against a handful
of images, with the whole CLIP text encoder inside the training graph
(it is tiny next to the UNet) and gradients flowing ONLY to the new
rows. Everything is functional: the table is extended by concatenation
at trace time — no tokenizer or module mutation, and the base
checkpoint is untouched.

Prompt handling: the placeholder cannot go through BPE (it would
split); `splice_prompt_ids` splits the prompt on the placeholder string
and inserts the new ids (n_vocab .. n_vocab+n_vectors-1) between the
BPE-encoded segments, inside the usual SOT/EOT wrap.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.config import StableDiffusionConfig
from sdtpu.models.clip import clip_apply
from sdtpu.tokenizer import EOT_ID, SOT_ID

DEFAULT_PLACEHOLDER = "<sks>"


def splice_prompt_ids(tokenizer, prompt: str, placeholder: str,
                      n_vocab: int, n_vectors: int) -> List[int]:
    """SOT + (BPE segments with each placeholder occurrence expanded to
    the n_vectors new ids) + EOT."""
    new_ids = list(range(n_vocab, n_vocab + n_vectors))
    ids: List[int] = [SOT_ID]
    for i, part in enumerate(prompt.split(placeholder)):
        if i:
            ids.extend(new_ids)
        if part.strip():
            ids.extend(tokenizer.encode(part.strip()))
    ids.append(EOT_ID)
    return ids


def init_ti_embeddings(key, clip_params, n_vectors: int,
                       init_token_id: Optional[int] = None):
    """New rows [n_vectors, n_state] (f32). init_token_id: start from an
    existing token's embedding (the standard recipe — pick a word close
    to the concept); otherwise table-scale gaussian."""
    w = clip_params["token_embedding"]["w"]
    if init_token_id is not None:
        return jnp.tile(w[init_token_id].astype(jnp.float32)[None],
                        (n_vectors, 1))
    std = float(jnp.std(w.astype(jnp.float32)))
    return jax.random.normal(key, (n_vectors, w.shape[1]),
                             jnp.float32) * std


def extend_clip(clip_params, new_embeddings):
    """clip params with the token table extended by the new rows
    (functional; every other leaf passed by reference)."""
    te = clip_params["token_embedding"]
    w = jnp.concatenate(
        [te["w"], new_embeddings.astype(te["w"].dtype)], axis=0)
    return {**clip_params, "token_embedding": {**te, "w": w}}


def ti_context(sd, tokenizer, prompt: str, new_embeddings,
               placeholder: str = DEFAULT_PLACEHOLDER):
    """(context [1,S,D], valid [1,S]) for a prompt containing the
    placeholder — the TI analogue of StableDiffusion.context."""
    cfg = sd.config
    ids = splice_prompt_ids(tokenizer, prompt, placeholder,
                            cfg.clip.n_vocab, len(new_embeddings))
    n_ctx = cfg.clip.n_ctx
    if len(ids) > n_ctx:
        ids = ids[: n_ctx - 1] + [ids[-1]]
    n_valid = len(ids)
    if sd.pad_context:
        ids = ids + [0] * (n_ctx - len(ids))
    tokens = jnp.asarray(np.asarray(ids, np.int32)[None])
    clip_p = extend_clip(sd.params["clip"], new_embeddings)
    ctx = clip_apply(clip_p, tokens, cfg.clip)
    valid = jnp.arange(len(ids))[None, :] < n_valid
    return ctx.astype(sd.compute_dtype), valid


def generate_with_ti(sd, tokenizer, prompt: str, new_embeddings,
                     guidance_scale: float = 7.5, n_steps: int = 20,
                     n_images: int = 1, key=None, sampler: str = "ddim",
                     negative_prompt: str = "",
                     placeholder: str = DEFAULT_PLACEHOLDER,
                     karras_sigmas: bool = False) -> np.ndarray:
    """prompt-with-placeholder -> uint8 images (pipeline.generate with
    the TI context swapped in)."""
    ctx, valid = ti_context(sd, tokenizer, prompt, new_embeddings,
                            placeholder)
    unctx, unvalid = sd.context(tokenizer, negative_prompt)
    if n_images > 1:
        ctx = jnp.tile(ctx, (n_images, 1, 1))
        valid = jnp.tile(valid, (n_images, 1))
    latent = sd.sample_latent(
        ctx, unctx, guidance_scale, n_steps, key=key, sampler=sampler,
        ctx_valid=valid if sd.pad_context else None,
        uncond_valid=unvalid if sd.pad_context else None,
        karras_sigmas=karras_sigmas)
    return sd.latent_to_image(latent)


def make_ti_train_step(cfg: StableDiffusionConfig, optimizer,
                       compute_dtype=jnp.float32, remat: bool | str = False):
    """train_step(new_emb, opt_state, params, batch, key) ->
    (new_emb, opt_state, loss). params = the full frozen model tree
    ({"clip", "unet", ...}); batch = (latents, tokens [B,n_ctx] i32,
    ctx_valid [B,n_ctx] bool). Gradients flow through the CLIP encoder
    into ONLY the new embedding rows."""
    import optax

    from sdtpu.ops.dispatch import force_xla
    from sdtpu.training import diffusion_loss

    def loss_fn(new_emb, params, latents, tokens, ctx_valid, t, noise):
        with force_xla(allow_differentiable=True):
            clip_p = extend_clip(params["clip"], new_emb)
            ctx = clip_apply(clip_p, tokens, cfg.clip)
        return diffusion_loss(params["unet"], cfg, latents, ctx, t, noise,
                              ctx_valid=ctx_valid,
                              compute_dtype=compute_dtype, remat=remat)

    def train_step(new_emb, opt_state, params, batch, key):
        latents, tokens, ctx_valid = batch
        kt, kn = jax.random.split(key)
        b = latents.shape[0]
        t = jax.random.randint(kt, (b,), 0, cfg.n_train_steps)
        noise = jax.random.normal(kn, latents.shape, jnp.float32)
        loss, grads = jax.value_and_grad(loss_fn)(
            new_emb, params, latents, tokens, ctx_valid, t, noise)
        updates, opt_state = optimizer.update(grads, opt_state, new_emb)
        new_emb = optax.apply_updates(new_emb, updates)
        return new_emb, opt_state, loss

    return train_step


def prepare_ti_data(sd, tokenizer, data_dir: str,
                    placeholder: str = DEFAULT_PLACEHOLDER,
                    n_vectors: int = 1, batch: int = 4
                    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (latents [N,h,w,4], tokens [N,n_ctx] i32, valid [N,n_ctx] bool).

    Captions come from the usual sidecar files and MUST contain the
    placeholder; images without a caption get "a photo of <placeholder>".
    """
    from sdtpu.dataset import (center_crop_resize, list_examples,
                               load_image_u8)

    cfg = sd.config
    examples = list_examples(data_dir)
    size = cfg.image_size
    lat_list, tok_list, nv_list = [], [], []
    n_ctx = cfg.clip.n_ctx
    for start in range(0, len(examples), batch):
        chunk = examples[start:start + batch]
        imgs = np.stack([
            center_crop_resize(load_image_u8(p), size) for p, _ in chunk])
        x = imgs.astype(np.float32) / 127.5 - 1.0
        pad = batch - len(chunk)
        if pad:
            x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
        z = sd.encode_image(x)[: len(chunk)]
        lat_list.append(np.asarray(z.astype(jnp.float32))
                        * cfg.latent_scale)
        for _, caption in chunk:
            caption = caption or f"a photo of {placeholder}"
            if placeholder not in caption:
                raise ValueError(
                    f"caption {caption!r} does not contain the "
                    f"placeholder {placeholder!r}")
            ids = splice_prompt_ids(tokenizer, caption, placeholder,
                                    cfg.clip.n_vocab, n_vectors)
            ids = ids[: n_ctx - 1] + [ids[-1]] if len(ids) > n_ctx else ids
            nv_list.append(len(ids))
            tok_list.append(ids + [0] * (n_ctx - len(ids)))
    tokens = np.asarray(tok_list, np.int32)
    valid = np.arange(n_ctx)[None, :] < np.asarray(nv_list)[:, None]
    return np.concatenate(lat_list), tokens, valid


def save_ti(new_embeddings, path: str, placeholder: str,
            config_name: str = "") -> None:
    from safetensors.numpy import save_file

    save_file({"embeddings": np.asarray(new_embeddings, np.float32)}, path,
              metadata={"format": "sdtpu-ti", "placeholder": placeholder,
                        "config": config_name})


def load_ti(path: str) -> Tuple[np.ndarray, str, Dict[str, str]]:
    from safetensors import safe_open
    from safetensors.numpy import load_file

    with safe_open(path, framework="numpy") as f:
        meta = dict(f.metadata() or {})
    if meta.get("format") != "sdtpu-ti":
        raise ValueError(f"{path}: not an sdtpu textual-inversion file")
    return load_file(path)["embeddings"], meta["placeholder"], meta
