from .csr import (  # noqa: F401
    vertex_ranges,
    shard_edges,
    CSRShardData,
    CSRShardActor,
    create_shard_actors,
)
from .checkpoint import save_checkpoint, latest_checkpoint  # noqa: F401
