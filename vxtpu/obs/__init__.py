from vxtpu.obs.log import get_logger
from vxtpu.obs.metrics import MetricsSink

__all__ = ["get_logger", "MetricsSink"]
