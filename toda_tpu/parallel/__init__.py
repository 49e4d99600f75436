from .mesh import (
    make_mesh,
    shard_batch,
    replicate,
    init_distributed,
    get_dist_info,
)

__all__ = ["make_mesh", "shard_batch", "replicate", "init_distributed", "get_dist_info"]
