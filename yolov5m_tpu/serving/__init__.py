from yolov5m_tpu.serving.server import DetectionClient, DetectionServer

__all__ = ["DetectionClient", "DetectionServer"]
