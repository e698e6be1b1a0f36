"""Device-mesh setup and sharding rules (pjit / NamedSharding)."""

from impersonator_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    make_data_mesh,
    shard_batch,
    replicate,
    data_sharding,
)
