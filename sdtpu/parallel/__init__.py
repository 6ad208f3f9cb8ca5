from sdtpu.parallel.mesh import make_mesh  # noqa: F401
from sdtpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    param_shardings,
    shard_batch,
    shard_params,
)
