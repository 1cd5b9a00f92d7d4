from yolov5m_tpu.ops.pallas.nms_kernel import (
    MAX_K, greedy_suppress_pallas, pallas_available)

__all__ = ["MAX_K", "greedy_suppress_pallas", "pallas_available"]
