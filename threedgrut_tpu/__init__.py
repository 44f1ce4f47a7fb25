"""threedgrut_tpu — a TPU-native differentiable Gaussian-particle rendering and
training framework (JAX / XLA / Pallas), with the capabilities of NVIDIA
3DGRT + 3DGUT re-designed for TPU hardware."""

__version__ = "0.1.0"
