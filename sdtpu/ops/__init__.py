from sdtpu.ops.activations import silu, quick_gelu, gelu, geglu  # noqa: F401
from sdtpu.ops.attention import qkv_attention, causal_mask  # noqa: F401
from sdtpu.ops.groupnorm import group_norm, layer_norm  # noqa: F401
from sdtpu.ops.conv import conv2d, linear, embedding  # noqa: F401
from sdtpu.ops.timestep import timestep_embedding  # noqa: F401
