from cvd_tpu.parallel.mesh import (
    create_mesh,
    replicate,
    shard_batch,
    shard_params,
)
