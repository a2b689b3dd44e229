"""Profiling and benchmark helpers."""

from .benchmarks import (
    compare_timings,
    measure_rtt,
    time_device_fn,
    welch_t_test,
)
from .profiling import trace

__all__ = [
    "compare_timings", "measure_rtt", "time_device_fn", "welch_t_test",
    "trace",
]
