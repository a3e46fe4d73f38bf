from tclight_tpu.parallel.mesh import (
    make_mesh,
    shard_params,
    replicate,
    data_sharding,
)
