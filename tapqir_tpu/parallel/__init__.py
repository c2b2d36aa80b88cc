"""Multi-chip scaling: mesh construction and sharded SVI steps."""

from tapqir_tpu.parallel.sharding import (  # noqa: F401
    data_partition,
    make_mesh,
    make_sharded_grads_fn,
    make_sharded_train_fn,
    shard_params_and_data,
)
