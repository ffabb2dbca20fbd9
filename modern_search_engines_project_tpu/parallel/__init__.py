from modern_search_engines_project_tpu.parallel.multihost import (
    init_multihost,
    make_multihost_mesh,
)
from modern_search_engines_project_tpu.parallel.sharding import (
    ShardedDeviceIndex,
    ShardedEngineBackend,
    make_mesh,
)

__all__ = [
    "ShardedDeviceIndex",
    "ShardedEngineBackend",
    "make_mesh",
    "init_multihost",
    "make_multihost_mesh",
]
