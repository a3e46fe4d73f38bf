"""TC-Light TPU: a TPU-native (JAX/XLA/Pallas) video relighting framework.

A ground-up reimplementation of the capabilities of Linketic/TC-Light
(one-shot temporally-consistent video relighting: IC-Light-conditioned SD1.5
denoising with VidToMe token merging, decayed multi-axis (xy+yt) noise fusion,
and two-stage test-time optimization), redesigned for TPU:

- All hot compute is jitted JAX/XLA; attention and flow-correlation use Pallas
  TPU kernels with XLA fallbacks.
- Dynamic-shape tricks of the reference (random chunk layouts, ratio-dependent
  merge counts) become precomputed static "plans" of index arrays.
- Scaling is expressed with `jax.sharding` meshes (frames sharded for the
  xy pass, width for the yt pass) instead of process dispatch / NCCL.
"""

__version__ = "0.1.0"
