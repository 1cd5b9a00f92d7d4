from yolov5m_tpu.parallel.dp import (
    initialize_multihost,
    local_batch_slice,
    make_mesh,
    make_dp_train_step,
    replicate_state,
    shard_batch,
)
from yolov5m_tpu.parallel.infer import make_dp_infer_fn
from yolov5m_tpu.parallel.pp import (
    make_dp_pp_mesh, make_pp_infer_fn, make_pp_mesh, make_pp_train_step)
from yolov5m_tpu.parallel.sp import (
    make_sp_infer_fn, make_sp_mesh, make_sp_train_step)
from yolov5m_tpu.parallel.tp import (
    make_tp_infer_fn, make_tp_mesh, make_tp_train_step, shard_state_tp,
    shard_variables_tp)

__all__ = ["initialize_multihost", "local_batch_slice", "make_mesh",
           "make_dp_train_step", "make_dp_infer_fn", "make_sp_infer_fn",
           "make_dp_pp_mesh", "make_pp_infer_fn", "make_pp_mesh",
           "make_pp_train_step",
           "make_sp_mesh", "make_sp_train_step", "make_tp_infer_fn",
           "make_tp_mesh", "make_tp_train_step", "replicate_state",
           "shard_batch", "shard_state_tp", "shard_variables_tp"]
