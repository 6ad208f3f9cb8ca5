from sdtpu.io.npy_tree import load_stable_diffusion_dump, save_stable_diffusion_dump  # noqa: F401
from sdtpu.io.native import load_native, save_native  # noqa: F401
