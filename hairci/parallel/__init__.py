from hairci.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    create_mesh,
    batch_sharding,
    replicated_sharding,
    model_sharding,
    shard_batch,
    local_mesh_size,
)
