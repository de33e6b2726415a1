from .mesh import (get_mesh, data_sharding, replicate, shard_batch)  # noqa: F401
