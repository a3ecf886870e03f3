"""TPU-native semantic surfel SLAM engine (SuMa++-class capabilities).

A brand-new JAX/XLA/Pallas re-design of the LiDAR SLAM pipeline pioneered by
SuMa++ (reference: PRBonn/semantic_suma): spherical range-image projection,
frame-to-model projective ICP, semantic surfel mapping with dynamic-object
removal, loop closure and pose-graph optimization — built for TPU hardware
(MXU reductions, sort-based rasterization, whole-pipeline jit, sharded maps).
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry correctness requires true f32 matmuls: TPU MXU matmuls default to
# bfloat16 inputs, which silently destroys the ICP normal equations and 4x4
# pose compositions (the reference runs everything in GL f32; SURVEY §7
# hard-part (d)). "float32" = full-f32-effective (bf16x3 passes) on MXU;
# explicitly-bf16 model code (the segmenter) is unaffected.
_jax.config.update("jax_default_matmul_precision", "float32")

from .config import SumaConfig, config_from_xml  # noqa: F401
