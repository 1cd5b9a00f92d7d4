from yolov5m_tpu.models.yolo import YOLOv5, create_model, from_family
from yolov5m_tpu.models.blocks import CBL, Bottleneck, C3, SPPF
from yolov5m_tpu.models.fuse import fold_batchnorm
from yolov5m_tpu.models.quantize import quantize_int8

__all__ = ["YOLOv5", "create_model", "from_family", "CBL", "Bottleneck",
           "C3", "SPPF", "fold_batchnorm", "quantize_int8"]
