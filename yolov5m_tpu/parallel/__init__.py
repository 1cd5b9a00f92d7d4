from yolov5m_tpu.parallel.dp import (
    initialize_multihost,
    local_batch_slice,
    make_mesh,
    make_dp_train_step,
    replicate_state,
    shard_batch,
)

__all__ = ["initialize_multihost", "local_batch_slice", "make_mesh",
           "make_dp_train_step", "replicate_state", "shard_batch"]
