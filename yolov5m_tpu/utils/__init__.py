from yolov5m_tpu.utils.checkpoint import (
    save_checkpoint, load_checkpoint, latest_epoch, next_run_name)
from yolov5m_tpu.utils.logging import CSVLogger

__all__ = ["save_checkpoint", "load_checkpoint", "latest_epoch",
           "next_run_name", "CSVLogger"]
