from sdtpu.diffusion.schedule import (  # noqa: F401
    offset_cosine_schedule_cumprod,
    scaled_linear_alphas_cumprod,
)
from sdtpu.diffusion.ddim import ddim_step, ddim_schedule  # noqa: F401
