from vxtpu.obs.log import get_logger
from vxtpu.obs.metrics import FrameTimer, MetricsSink

__all__ = ["get_logger", "FrameTimer", "MetricsSink"]
