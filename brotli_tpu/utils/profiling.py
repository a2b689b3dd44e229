"""jax.profiler integration: capture device traces around codec calls."""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/brotli_tpu_trace"):
    """Context manager: profile the enclosed device work.

    View with tensorboard/xprof pointed at `log_dir`."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
