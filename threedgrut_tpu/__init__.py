"""threedgrut_tpu — a TPU-native differentiable Gaussian-particle rendering and
training framework (JAX / XLA / Pallas), with the capabilities of NVIDIA
3DGRT + 3DGUT re-designed for TPU hardware."""

import jax as _jax

# Rendering parity requires f32 matmul semantics: on TPU, XLA's default
# matmul precision truncates inputs to bf16, which visibly corrupts
# transmittance prefix sums, ray transforms, and SH evaluation (measured 4%
# image error vs CPU). All heavy compute lives in Pallas kernels that set
# their own precision, so this costs little.
_jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"
