"""sdtpu — a TPU-native Stable Diffusion inference/training framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the reference
Rust crate `stablediffusion` (Gadersd/stable-diffusion-burn): CLIP BPE
tokenizer + text encoder, SD v1 UNet epsilon-predictor, KL-VAE
encoder/decoder, DDIM sampler with classifier-free guidance, and the
reference's weight formats (npy dump tree, Burn NamedMpk record).

Unlike the reference — which eagerly dispatches each tensor op to libtorch
and host-syncs twice per sampler step (reference:
src/model/stablediffusion/mod.rs:124-140) — sdtpu compiles the entire
denoising loop into a single `jax.lax.scan` under `jit`, batches the
cond/uncond CFG pair into one UNet call (the optimization the reference left
commented out at src/model/stablediffusion/mod.rs:181-188), runs hot blocks
as Pallas TPU kernels, and scales across chips with `jax.sharding` meshes.
"""

__version__ = "0.1.0"

from sdtpu.config import (  # noqa: F401
    CLIPConfig,
    UNetConfig,
    AutoencoderConfig,
    StableDiffusionConfig,
    SD_V1_4,
    SD_V1_5,
    SD_V2_1,
)
