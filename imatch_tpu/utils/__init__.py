from imatch_tpu.utils.metrics import METRICS, Metrics, timer
from imatch_tpu.utils.profiler import profile_trace, start_trace, stop_trace

__all__ = [
    "METRICS",
    "Metrics",
    "timer",
    "profile_trace",
    "start_trace",
    "stop_trace",
]
