"""Model/pipeline configuration.

The reference hard-codes every SD v1.4 hyperparameter at module-init sites
(reference: src/model/unet/mod.rs:36-92, src/model/autoencoder/mod.rs:30-44,
src/model/stablediffusion/mod.rs:23-38). Here the architecture is described
by data-driven dataclass configs with presets, so SD v1.5 / v2.1 are config
changes rather than code changes.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    """CLIP text transformer (reference: src/model/clip/mod.rs:18-45;
    instantiated as CLIPConfig::new(49408, 768, 12, 77, 12) at
    src/model/stablediffusion/mod.rs:29)."""

    n_vocab: int = 49408
    n_state: int = 768
    n_head: int = 12
    n_ctx: int = 77
    n_layer: int = 12
    layer_norm_eps: float = 1e-5
    # QuickGELU (x * sigmoid(1.702 x)) for SD v1 CLIP (clip/mod.rs:217-227);
    # OpenCLIP ViT-H (SD v2) uses exact GELU.
    quick_gelu: bool = True
    # SD v2 uses the penultimate hidden layer of OpenCLIP ViT-H.
    # 0 = final layer output (v1 behaviour).
    skip_last_layers: int = 0


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """SD v1 UNet denoiser (reference: src/model/unet/mod.rs:35-93).

    The reference spells out 24 named block fields; here the down/up paths
    are derived from `channel_mult` + `n_res_blocks` the way the original
    LDM config does, which reproduces the reference's exact block list.
    """

    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 320
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    n_res_blocks: int = 2
    # Levels (by index) that get a SpatialTransformer after each ResBlock.
    # SD v1: all but the last level (8x8 has plain ResBlocks only).
    attention_levels: Tuple[int, ...] = (0, 1, 2)
    n_head: int = 8
    # SD v2 fixes head_dim=64 instead of n_head=8; when set, n_head is
    # derived per-level as channels // head_dim.
    head_dim: Optional[int] = None
    context_dim: int = 768
    time_embed_dim: int = 1280  # model_channels * 4
    max_period: int = 10000
    groupnorm_groups: int = 32
    groupnorm_eps: float = 1e-5
    ln_eps: float = 1e-5

    def heads_for(self, channels: int) -> int:
        if self.head_dim is not None:
            return channels // self.head_dim
        return self.n_head


@dataclasses.dataclass(frozen=True)
class AutoencoderConfig:
    """KL autoencoder f=8 (reference: src/model/autoencoder/mod.rs:29-45).

    encoder_channels / decoder_channels mirror the (in, out) pairs at
    autoencoder/mod.rs:31-34.
    """

    in_channels: int = 3
    latent_channels: int = 4
    encoder_channels: Tuple[Tuple[int, int], ...] = (
        (128, 128),
        (128, 256),
        (256, 512),
        (512, 512),
    )
    decoder_channels: Tuple[Tuple[int, int], ...] = (
        (512, 512),
        (512, 512),
        (512, 256),
        (256, 128),
    )
    groupnorm_groups: int = 32
    groupnorm_eps: float = 1e-6  # ldm VAE uses 1e-6 (stored in checkpoints)
    # encode_image keeps only the first 4 of 8 quant channels (means; no
    # sampling) — autoencoder/mod.rs:60-66.
    double_z: bool = True


@dataclasses.dataclass(frozen=True)
class StableDiffusionConfig:
    """Whole-pipeline config (reference: src/model/stablediffusion/mod.rs:19-48)."""

    clip: CLIPConfig = dataclasses.field(default_factory=CLIPConfig)
    unet: UNetConfig = dataclasses.field(default_factory=UNetConfig)
    vae: AutoencoderConfig = dataclasses.field(default_factory=AutoencoderConfig)
    n_train_steps: int = 1000  # alphas_cumprod table length (mod.rs:24)
    latent_scale: float = 0.18215  # mod.rs:71
    image_size: int = 512
    # epsilon (SD v1/v2-base) or v (SD v2.1-768) prediction target
    prediction_type: str = "epsilon"
    name: str = "sd-v1-4"

    @property
    def vae_factor(self) -> int:
        """Spatial down/up-scale factor: one stride-2 stage per VAE level
        except the last (f=8 for SD's 4-level VAE)."""
        return 2 ** (len(self.vae.decoder_channels) - 1)

    @property
    def latent_size(self) -> int:
        return self.image_size // self.vae_factor


SD_V1_4 = StableDiffusionConfig(name="sd-v1-4")

SD_V1_5 = StableDiffusionConfig(name="sd-v1-5")  # identical architecture

SD_V2_1 = StableDiffusionConfig(
    name="sd-v2-1",
    clip=CLIPConfig(
        n_vocab=49408,
        n_state=1024,
        n_head=16,
        n_ctx=77,
        n_layer=23,  # penultimate layer of the 24-layer ViT-H text tower
        quick_gelu=False,
    ),
    unet=UNetConfig(context_dim=1024, head_dim=64),
    image_size=768,
    prediction_type="v",
)

# Scaled-down architecture for CI / smoke tests (not a real model family;
# same topology as SD v1 with 2 levels instead of 4).
SD_TINY = StableDiffusionConfig(
    name="sd-tiny",
    clip=CLIPConfig(n_vocab=49408, n_state=32, n_head=4, n_ctx=77, n_layer=2),
    unet=UNetConfig(
        model_channels=16,
        channel_mult=(1, 2),
        attention_levels=(0,),
        n_head=4,
        context_dim=32,
        time_embed_dim=64,
        groupnorm_groups=4,
    ),
    vae=AutoencoderConfig(
        encoder_channels=((8, 8), (8, 16)),
        decoder_channels=((16, 16), (16, 8)),
        groupnorm_groups=4,
    ),
    image_size=32,
)

PRESETS = {
    "sd-v1-4": SD_V1_4,
    "sd-v1-5": SD_V1_5,
    "sd-v2-1": SD_V2_1,
    "sd-tiny": SD_TINY,
}


def config_to_dict(cfg: StableDiffusionConfig) -> dict:
    """JSON-serialisable dict (io/native.py embeds this in checkpoint
    metadata so non-preset architectures round-trip)."""
    return dataclasses.asdict(cfg)


def config_from_dict(d: dict) -> StableDiffusionConfig:
    """Inverse of config_to_dict. Unknown fields raise (a checkpoint from
    a newer sdtpu must not load silently mis-configured)."""
    u = dict(d["unet"])
    u["channel_mult"] = tuple(u["channel_mult"])
    u["attention_levels"] = tuple(u["attention_levels"])
    v = dict(d["vae"])
    v["encoder_channels"] = tuple(tuple(p) for p in v["encoder_channels"])
    v["decoder_channels"] = tuple(tuple(p) for p in v["decoder_channels"])
    rest = {k: val for k, val in d.items() if k not in ("clip", "unet", "vae")}
    return StableDiffusionConfig(
        clip=CLIPConfig(**d["clip"]),
        unet=UNetConfig(**u),
        vae=AutoencoderConfig(**v),
        **rest,
    )
