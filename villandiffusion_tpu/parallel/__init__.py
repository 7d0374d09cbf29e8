from villandiffusion_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    replicate,
    data_sharding,
    replicated_sharding,
    fsdp_spec,
    fsdp_sharding,
)
