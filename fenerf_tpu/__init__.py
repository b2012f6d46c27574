"""fenerf_tpu — a TPU-native JAX rebuild of FENeRF (CVPR 2022).

A 3D-aware, locally-editable portrait GAN: a pi-GAN-style NeRF generator with
two decoupled latent codes (geometry -> semantics + density; appearance ->
texture) that jointly renders aligned RGB and semantic segmentation from a
shared 3D volume, trained adversarially with two discriminators on monocular
image+mask pairs.

Reference behavior: MrTornado24/FENeRF (PyTorch/CUDA). This package is a
ground-up JAX/XLA/Pallas re-design for TPU: pure key-threaded functions,
static-shape render paths, per-stage jit specialization, shard_map data
parallelism, and a fused Pallas point-MLP kernel on the hot path.
"""

__version__ = "0.1.0"
