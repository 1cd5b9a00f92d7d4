from yolov5m_tpu.ops.pallas.nms_kernel import greedy_suppress_pallas, pallas_available

__all__ = ["greedy_suppress_pallas", "pallas_available"]
