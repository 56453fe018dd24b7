"""Profiling hooks: jax.profiler traces and wall-clock kernel timing.

The reference's only observability is elapsed-seconds logging stored in
``uns[..._params]["computation_time_seconds"]`` (SURVEY.md §5). Here the
same wall-clock timers exist (``timer`` / ``timed``) plus a proper
``jax.profiler`` trace context for TensorBoard-viewable device profiles.
"""

from __future__ import annotations

import contextlib
import functools
import time
from pathlib import Path
from typing import Optional, Union

from ..core.logging import get_logger

logger = get_logger("utils.profiling")


@contextlib.contextmanager
def profile_trace(log_dir: Union[str, Path] = "/tmp/spatialcore_tpu_trace",
                  create_perfetto_link: bool = False):
    """Capture a jax.profiler device trace for the enclosed block.

    View with TensorBoard (``tensorboard --logdir <log_dir>``) or the
    generated perfetto link.
    """
    import jax

    path = str(log_dir)
    Path(path).mkdir(parents=True, exist_ok=True)
    logger.info(f"profiler trace → {path}")
    jax.profiler.start_trace(path,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield path
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timer(label: str, sync: bool = True, store: Optional[dict] = None):
    """Wall-clock a block; blocks on device completion when ``sync``."""
    import jax

    t0 = time.time()
    yield
    if sync:
        try:
            jax.effects_barrier()
        except Exception:
            pass
    elapsed = time.time() - t0
    logger.info(f"[timer] {label}: {elapsed:.3f}s")
    if store is not None:
        store[label] = elapsed


def timed(fn=None, *, label: Optional[str] = None):
    """Decorator: log the wall-clock of each call (device-synced)."""
    def wrap(f):
        name = label or f.__qualname__

        @functools.wraps(f)
        def inner(*args, **kwargs):
            with timer(name):
                return f(*args, **kwargs)

        return inner

    return wrap(fn) if fn is not None else wrap
