from .sharding import (  # noqa: F401
    make_mesh, replicated, ray_sharded, submap_sharded,
    sharded_map_step, shard_field_params,
)
