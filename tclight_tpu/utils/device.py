"""Device/runtime helpers (stands in for cosmos1/utils/device.py:22-69,
whose job — pin the process near its GPU — has no TPU equivalent; what the
tunneled-TPU runtime needs instead is transfer-path warmup).

The axon (tunneled TPU) backend pays a large one-time cost (55-600 s
measured) on the FIRST host->device array transfer of a process,
independent of size; subsequent transfers run at ~25-80 MB/s.

NOT WIRED INTO THE PIPELINE: firing the warmup from a background thread
was tried and reverted — the stalled transfer holds the client lock, so
jit compiles on the main thread block behind it (observed: bench wedged
>15 min before its first unet-init log). Kept as an opt-in utility for
processes that can afford a blocking warmup before any compilation."""

from __future__ import annotations

import threading
from typing import Optional

_warmed = False
_lock = threading.Lock()

_compute_platform_override: Optional[str] = None


def set_compute_platform(platform: Optional[str]) -> None:
    """Override the platform the compute-path gates (Pallas vs XLA
    lowering, tunnel-transfer strategies) assume they are running on.

    Needed when the process default backend differs from the devices a
    mesh actually targets — e.g. the driver's multichip dryrun runs a
    virtual-CPU mesh inside a process whose default backend is the
    tunneled TPU. `None` restores autodetection."""
    global _compute_platform_override
    _compute_platform_override = platform


def compute_platform() -> str:
    """Platform name the hot path should compile for ('tpu'/'cpu'/...)."""
    if _compute_platform_override is not None:
        return _compute_platform_override
    import jax

    return jax.default_backend()


def use_pallas() -> bool:
    """Whether to lower hot ops through the Pallas TPU kernels."""
    return compute_platform() == "tpu"


def warm_transfer_path(block: bool = True) -> None:
    """Idempotently trigger the first host->device transfer.

    block=True (default, the safe mode): the caller eats the stall up
    front, before any jit compiles exist to block behind it. block=False
    runs on a daemon thread — measured HARMFUL when compiles follow (see
    module docstring); only use it in transfer-only processes."""
    global _warmed
    with _lock:
        if _warmed:
            return
        _warmed = True

    def _fire():
        import time

        t0 = time.perf_counter()
        try:
            import numpy as np
            import jax
            import jax.numpy as jnp

            if not jax.devices():
                return
            arr = jnp.asarray(np.ones(65536, np.uint8))
            _ = np.asarray(arr[:1])  # real host fetch: block_until_ready
            # returns early on axon
            from tclight_tpu.utils.logging import get_logger

            get_logger().info(
                "transfer path warm (%.1fs)", time.perf_counter() - t0)
        except Exception as e:  # noqa: BLE001 — warmup must never break startup
            global _warmed
            with _lock:
                _warmed = False  # allow a retry after transient failures
            try:
                from tclight_tpu.utils.logging import get_logger

                get_logger().info("transfer warmup failed: %r", e)
            except Exception:  # noqa: BLE001
                pass

    if block:
        _fire()
    else:
        threading.Thread(
            target=_fire, name="tclight-transfer-warmup", daemon=True
        ).start()
