from .mesh import create_mesh, local_mesh  # noqa: F401
from .sharding import (  # noqa: F401
    batch_sharding,
    replicated,
    shard_batch,
    shard_params,
)
