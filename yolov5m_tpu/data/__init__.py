from yolov5m_tpu.data.dataset import DetectionDataset, BatchLoader
from yolov5m_tpu.data.loaders import get_loaders

__all__ = ["DetectionDataset", "BatchLoader", "get_loaders"]
