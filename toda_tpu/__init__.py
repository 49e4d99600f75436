"""toda_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the TODA semi-supervised
domain-adaptation framework for LiDAR 3D object detection.

The reference (rasd3/TODA, an OpenPCDet fork) is CUDA/C++/torch; this package is a
from-scratch JAX design: static-shape padded tensors with validity masks everywhere,
jit-compiled train/eval steps, data parallelism via `jax.sharding.Mesh` + `shard_map`,
and Pallas kernels for the hot ops (voxelization, rotated NMS, sparse conv).
"""

__version__ = "0.1.0"
