"""Device mesh + sharding utilities.

TPU-native replacement for the reference's entire distributed stack
(cosmos1/utils/distributed.py NCCL init/collectives/DDP :34-223 and the
NeMo/Megatron TP/SP/CP/FSDP recipes, SURVEY §2.8): on TPU there is no
backend management — we build a `jax.sharding.Mesh` over ('data', 'model')
axes, annotate shardings, and let XLA insert collectives over ICI.

Axis roles for TC-Light workloads:
- 'data': frame/chunk parallelism — the xy denoising chunks and the
  post-optimization batch are embarrassingly parallel across frames
  (the TPU analogue of scripts/relight.sh one-video-per-GPU dispatch,
  but *within* one video).
- 'model': tensor parallelism — Dense/Conv output channels sharded; only
  needed for models much larger than SD1.5 (e.g. the Pixtral-12B prompt
  upsampler).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_params", "replicate", "data_sharding", "init_distributed"]


def init_distributed(**kw) -> None:
    """Multi-host init (stands in for distributed.init NCCL setup at
    cosmos1/utils/distributed.py:34-63). No-op on a single host."""
    try:
        if jax.process_count() > 1 or kw:
            jax.distributed.initialize(**kw)
    except Exception:
        pass


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices=None,
) -> Mesh:
    """('data', 'model') mesh over the first n devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    devices = devices[:n]
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, axis: int = 0, ndim: int = 1) -> NamedSharding:
    spec = [None] * ndim
    spec[axis] = "data"
    return NamedSharding(mesh, P(*spec))


def _kernel_spec(path_leaf: str, shape: tuple, model_size: int) -> P:
    """Tensor-parallel rule: shard the output-feature (last) axis of Dense /
    Conv kernels when divisible; replicate everything else."""
    if model_size <= 1 or not shape:
        return P()
    if path_leaf in ("kernel", "embedding") and shape[-1] % model_size == 0 and shape[-1] >= model_size * 8:
        return P(*([None] * (len(shape) - 1) + ["model"]))
    return P()


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a parameter pytree on the mesh with TP sharding rules applied.
    Returns device arrays with NamedShardings."""
    model_size = mesh.shape["model"]

    def place(path, leaf):
        leaf_name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        spec = _kernel_spec(leaf_name, getattr(leaf, "shape", ()), model_size)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
