"""Profiler hooks (SURVEY.md section 5: jax.profiler trace integration).

Usage::

    from simple_spectral_tpu.utils.profiling import device_trace
    with device_trace("/tmp/trace"):
        render_image(cfg)

The dump is a TensorBoard/XProf-compatible trace directory.  Also provides
``timed_call`` for quick wall-clock measurement of a single jitted call with
proper device synchronization.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def device_trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def timed_call(fn, *args, reps: int = 3, warmup: int = 1, **kw):
    """Returns (result, best_seconds) with block_until_ready around each rep."""
    import jax

    result = None
    for _ in range(max(warmup, 1)):
        result = fn(*args, **kw)
    jax.block_until_ready(result)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        result = fn(*args, **kw)
        jax.block_until_ready(result)
        best = min(best, time.time() - t0)
    return result, best
