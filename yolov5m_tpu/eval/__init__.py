from yolov5m_tpu.eval.metrics import MeanAveragePrecision
from yolov5m_tpu.eval.evaluator import Evaluator

__all__ = ["MeanAveragePrecision", "Evaluator"]
