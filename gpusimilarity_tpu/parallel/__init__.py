from .mesh import (  # noqa: F401
    SHARD_AXIS,
    auto_fold_factor,
    available_device_memory,
    device_count,
    make_mesh,
)
from .sharded import ShardedStore, build_search_fn, build_store  # noqa: F401
