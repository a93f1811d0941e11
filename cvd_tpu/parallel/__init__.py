from cvd_tpu.parallel.mesh import (
    batch_sharding,
    constrain,
    create_mesh,
    inference_mesh,
    replicate,
    shard_batch,
    shard_params,
)
