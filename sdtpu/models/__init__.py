from sdtpu.models import clip, unet, vae  # noqa: F401
