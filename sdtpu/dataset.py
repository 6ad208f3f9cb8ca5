"""Training data pipeline: image+caption folder -> latent/context cache
-> shuffled, host-prefetched device batches.

The reference has no training and therefore no data loader (SURVEY.md
SS2.3 - inference-only, single image per run). sdtpu's pipeline is shaped
for a TPU training loop:

- the expensive once-per-example work (VAE encode, CLIP encode) runs
  batched through the same jitted graphs the sampler uses and is cached
  to disk (`.npz`), so restarts and hyperparameter sweeps never re-pay
  it;
- the steady-state loop streams fixed-shape minibatches from host RAM
  with a prefetch thread that stages `jax.device_put` (optionally onto a
  dp-sharded mesh layout) ahead of the step, so the chip never waits on
  host IO;
- every batch has the same static shape (drop-last + wrap-around
  sampling), so the train step compiles exactly once.

Dataset layout on disk: a directory of `<stem>.png` (8-bit RGB) or
`<stem>.npy` ([H,W,3] uint8) images, each with an optional sidecar
`<stem>.txt` caption (missing caption -> empty prompt, which trains the
unconditional branch used by classifier-free guidance).
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Iterator, List, Optional, Tuple

import numpy as np

IMAGE_EXTS = (".png", ".npy")


def list_examples(data_dir: str) -> List[Tuple[str, str]]:
    """[(image_path, caption)] sorted by stem for determinism."""
    if not os.path.isdir(data_dir):
        raise FileNotFoundError(f"dataset directory not found: {data_dir}")
    out = []
    for name in sorted(os.listdir(data_dir)):
        stem, ext = os.path.splitext(name)
        if ext.lower() not in IMAGE_EXTS:
            continue
        path = os.path.join(data_dir, name)
        cap_path = os.path.join(data_dir, stem + ".txt")
        caption = ""
        if os.path.exists(cap_path):
            with open(cap_path, "r", encoding="utf-8") as f:
                caption = f.read().strip()
        out.append((path, caption))
    if not out:
        raise FileNotFoundError(
            f"no {'/'.join(IMAGE_EXTS)} images found in {data_dir}")
    return out


def load_image_u8(path: str) -> np.ndarray:
    """[H,W,3] uint8 from .png (own minimal reader) or .npy."""
    if path.endswith(".npy"):
        img = np.load(path)
        if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
            raise ValueError(f"{path}: expected [H,W,3] uint8, got "
                             f"{img.dtype} {img.shape}")
        return img
    from sdtpu.utils.image import decode_png_rgb8

    with open(path, "rb") as f:
        return decode_png_rgb8(f.read())


def center_crop_resize(img: np.ndarray, size: int) -> np.ndarray:
    """Center-crop to square then nearest-neighbor resize to [size,size,3].

    Nearest is deliberate: this is offline data prep, not a quality-
    critical path, and it keeps the loader dependency-free (no PIL in
    the image). Feed pre-resized images for best quality.
    """
    h, w, _ = img.shape
    side = min(h, w)
    y0, x0 = (h - side) // 2, (w - side) // 2
    img = img[y0:y0 + side, x0:x0 + side]
    if side != size:
        idx = (np.arange(size) * side // size).astype(np.int64)
        img = img[idx][:, idx]
    return img


def build_latent_cache(sd, tokenizer, data_dir: str, out_path: str,
                       batch: int = 8, flip: bool = False) -> str:
    """Encode every example once and write the cache npz.

    latents are stored ALREADY scaled into the sampler's latent space
    (z = encode(x) * latent_scale, pipeline.py img2img convention), so
    the train loop consumes them directly. contexts are the full padded
    [n_ctx, D] CLIP sequences with per-example valid lengths (the
    key-validity mask reproduces unpadded softmax exactly, pipeline.py
    context()).

    flip: also encode the horizontal mirror of every image (doubles the
    cache). Done at the PIXEL level on purpose — the VAE's asymmetric
    (0,1,0,1) padding means flipping a latent is NOT the latent of the
    flipped image, so flip augmentation cannot be applied post-encode.
    """
    import jax.numpy as jnp

    examples = list_examples(data_dir)
    size = sd.config.image_size
    lat_list, ctx_list, nv_list = [], [], []

    def encode_chunk(imgs):
        x = imgs.astype(np.float32) / 127.5 - 1.0  # u8 -> [-1, 1]
        # pad the tail chunk to the jitted batch shape, then slice
        pad = batch - len(imgs)
        if pad:
            x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
        z = sd.encode_image(x)[: len(imgs)]
        return np.asarray(z.astype(jnp.float32)) * sd.config.latent_scale

    for start in range(0, len(examples), batch):
        chunk = examples[start:start + batch]
        imgs = np.stack([
            center_crop_resize(load_image_u8(p), size) for p, _ in chunk])
        lat_list.append(encode_chunk(imgs))
        if flip:
            lat_list.append(encode_chunk(imgs[:, :, ::-1]))
        for _, caption in chunk:
            ctx, valid = sd.context(tokenizer, caption)
            ctx_list.append(np.asarray(ctx.astype(jnp.float32))[0])
            nv_list.append(int(np.asarray(valid).sum()))
        if flip:  # mirrored copies share their caption's context
            ctx_list.extend(ctx_list[-len(chunk):])
            nv_list.extend(nv_list[-len(chunk):])
    np.savez(
        out_path,
        latents=np.concatenate(lat_list),
        contexts=np.stack(ctx_list),
        n_valid=np.asarray(nv_list, np.int32),
        image_size=np.int32(size),
        config_name=np.bytes_(sd.config.name.encode()),
    )
    return out_path


def load_latent_cache(path: str):
    """-> (latents [N,h,w,4] f32, contexts [N,S,D] f32, n_valid [N] i32)."""
    with np.load(path) as z:
        return z["latents"], z["contexts"], z["n_valid"]


class LatentBatches:
    """Infinite shuffled minibatch stream with background device staging.

    Each epoch is a fresh permutation (seeded, reproducible); the last
    partial batch wraps into the next epoch so every batch has the same
    static shape. A daemon thread keeps `prefetch` batches already
    device_put (onto `sharding` when given - e.g. a dp batch sharding
    from parallel.sharding.batch_sharding) ahead of the consumer.
    """

    def __init__(self, latents, contexts, n_valid=None, batch_size: int = 4,
                 seed: int = 0, sharding=None, prefetch: int = 2,
                 device: bool = True):
        self.latents = np.ascontiguousarray(latents, np.float32)
        self.contexts = np.ascontiguousarray(contexts, np.float32)
        self.n_valid = (None if n_valid is None
                        else np.ascontiguousarray(n_valid, np.int32))
        self.batch_size = int(batch_size)
        self.sharding = sharding
        self.device = device
        self._rng = np.random.Generator(np.random.PCG64(seed))
        self._perm: np.ndarray = self._rng.permutation(len(self.latents))
        self._pos = 0
        self._q: queue.Queue = queue.Queue(maxsize=max(1, prefetch))
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------ internals

    def _next_indices(self) -> np.ndarray:
        take = []
        while len(take) < self.batch_size:
            if self._pos >= len(self._perm):
                self._perm = self._rng.permutation(len(self.latents))
                self._pos = 0
            need = self.batch_size - len(take)
            sel = self._perm[self._pos:self._pos + need]
            take.extend(sel.tolist())
            self._pos += len(sel)
        return np.asarray(take, np.int64)

    def _stage(self, idx: np.ndarray):
        lat = self.latents[idx]
        ctx = self.contexts[idx]
        nv = None if self.n_valid is None else self.n_valid[idx]
        if not self.device:
            return (lat, ctx) if nv is None else (lat, ctx, nv)
        import jax

        if callable(self.sharding):  # e.g. lambda a: shard_batch(a, mesh)
            put = self.sharding
        elif self.sharding is not None:
            put = lambda a: jax.device_put(a, self.sharding)  # noqa: E731
        else:
            put = jax.device_put
        valid = None
        if nv is not None:
            valid = put(np.arange(ctx.shape[1])[None, :] < nv[:, None])
        lat, ctx = put(lat), put(ctx)
        return (lat, ctx) if valid is None else (lat, ctx, valid)

    def _worker(self):
        while not self._stop.is_set():
            batch = self._stage(self._next_indices())
            while not self._stop.is_set():
                try:
                    self._q.put(batch, timeout=0.1)
                    break
                except queue.Full:
                    continue

    # ------------------------------------------------------------ iterator

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        if self._stop.is_set():
            raise StopIteration
        return self._q.get()

    def close(self) -> None:
        self._stop.set()
        # unblock a worker parked on a full queue
        try:
            self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5.0)
