"""Parallelism: device mesh, shardings, pjit train-step factories."""
from .mesh import (
    data_sharding,
    fsdp_param_spec,
    is_main_process,
    local_batch_size,
    make_hybrid_mesh,
    make_mesh,
    replicated,
    shard_batch,
    shard_batch_per_host,
    shard_batch_views,
    shard_params,
)
from .train_step import (
    TrainState,
    full_ema_params,
    init_train_state,
    make_optimizer,
    make_train_step,
    merge_partitions,
    partition_frozen,
)
