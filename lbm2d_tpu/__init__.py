"""lbm2d_tpu: TPU-native D2Q9 MRT-LES lattice-Boltzmann dataset generator.

From-scratch JAX/XLA/Pallas re-design of the ms-112-scott/01-lbm-2d
reference (single-GPU Taichi). Layers mirror SURVEY.md: core/ (functional
solver + engine), ops/ (fused Pallas kernels, device resize/render),
parallel/ (vmap case batching, shard_map spatial decomposition), pipeline/
(batch CLI, crash-safe resume, multi-worker coordination), io/ (HDF5/video/
state stores), tools/ (mask + config generators), post/ + analysis/
(Zarr conversion, benchmarks, physics validation).
"""

__version__ = "0.5.0"
