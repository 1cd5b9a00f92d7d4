from yolov5m_tpu.utils.checkpoint import (
    AsyncCheckpointer, latest_epoch, load_checkpoint, next_run_name,
    save_best, save_checkpoint)
from yolov5m_tpu.utils.logging import CSVLogger

__all__ = ["save_checkpoint", "save_best", "load_checkpoint", "latest_epoch",
           "next_run_name", "CSVLogger", "AsyncCheckpointer"]
