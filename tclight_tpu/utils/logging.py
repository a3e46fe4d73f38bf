"""Rank-aware logging + timing utilities.

TPU-native replacement for the reference's two logging systems: the bare
``print("[INFO] ...")`` calls of TC-Light proper and the loguru rank-0
filtering logger of cosmos1/utils/log.py:52-138. One stdlib logger, rank
prefix from `jax.process_index()` when distributed, rank-0 filtering by
default for INFO and below.

Also provides `timer`, a context-manager/decorator mirroring
cosmos1/utils/misc.py:139-183, and a `Trace` helper wrapping `jax.profiler`
(the TPU equivalent of torch.cuda memory/time bookkeeping in
generate.py:577-611).
"""

from __future__ import annotations

import contextlib
import functools
import logging
import sys
import time
from typing import Any, Callable


def _process_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


_LOGGERS: dict[str, logging.Logger] = {}


class _RankFilter(logging.Filter):
    def __init__(self, rank0_only: bool = True):
        super().__init__()
        self.rank0_only = rank0_only

    def filter(self, record: logging.LogRecord) -> bool:
        if not self.rank0_only:
            return True
        if record.levelno >= logging.WARNING:
            return True
        return _process_index() == 0


def get_logger(name: str = "tclight", rank0_only: bool = True) -> logging.Logger:
    if name in _LOGGERS:
        return _LOGGERS[name]
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(
            logging.Formatter(
                fmt="%(asctime)s [%(levelname)s] %(name)s: %(message)s",
                datefmt="%H:%M:%S",
            )
        )
        handler.addFilter(_RankFilter(rank0_only))
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    _LOGGERS[name] = logger
    return logger


class timer(contextlib.ContextDecorator):
    """`with timer("step"):` or `@timer("step")` — logs elapsed seconds."""

    def __init__(self, message: str, logger: logging.Logger | None = None):
        self.message = message
        self.logger = logger or get_logger()
        self.elapsed: float | None = None

    def __enter__(self) -> "timer":
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc: Any) -> None:
        self.elapsed = time.perf_counter() - self._start
        self.logger.info("%s took %.3f s", self.message, self.elapsed)


def device_memory_stats() -> dict[str, float]:
    """Peak/current device memory in MB (TPU stand-in for
    torch.cuda.max_memory_allocated, generate.py:606-611)."""
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats() or {}
        scale = 1.0 / (1024 * 1024)
        return {
            "bytes_in_use(M)": stats.get("bytes_in_use", 0) * scale,
            "peak_bytes_in_use(M)": stats.get("peak_bytes_in_use", 0) * scale,
            "bytes_limit(M)": stats.get("bytes_limit", 0) * scale,
        }
    except Exception:
        return {}


class CostTracker:
    """Wall-time + memory accounting recorded into the run config, matching
    the *intended* behavior of generate.py:577-611 (the reference's
    `datetime.now()` call is buggy — SURVEY §5.1)."""

    def __init__(self) -> None:
        self.start_time = time.perf_counter()
        self.records: dict[str, float] = {}

    def finish(self, n_frames: int, height: int, width: int) -> dict[str, Any]:
        total = time.perf_counter() - self.start_time
        mem = device_memory_stats()
        self.records = {
            "total_time": total,
            "sec_per_frame": total / max(n_frames, 1),
            "max_memory_allocated": mem.get("peak_bytes_in_use(M)", 0.0),
            "total_frames": n_frames,
            "resolution": f"{width}x{height}",
        }
        return self.records


def profile_trace(log_dir: str) -> contextlib.AbstractContextManager:
    """jax.profiler trace context (TPU equivalent of ad-hoc CUDA timing)."""
    import jax

    return jax.profiler.trace(log_dir)


def block_and_time(fn: Callable[..., Any]) -> Callable[..., Any]:
    """Wrap fn to block_until_ready and record elapsed seconds on the result."""

    @functools.wraps(fn)
    def wrapped(*args: Any, **kw: Any) -> tuple[Any, float]:
        import jax

        t0 = time.perf_counter()
        out = fn(*args, **kw)
        out = jax.block_until_ready(out)
        return out, time.perf_counter() - t0

    return wrapped
