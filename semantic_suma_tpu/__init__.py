"""TPU-native semantic surfel SLAM engine (SuMa++-class capabilities).

A brand-new JAX/XLA/Pallas re-design of the LiDAR SLAM pipeline pioneered by
SuMa++ (reference: PRBonn/semantic_suma): spherical range-image projection,
frame-to-model projective ICP, semantic surfel mapping with dynamic-object
removal, loop closure and pose-graph optimization — built for TPU hardware
(MXU reductions, sort-based rasterization, whole-pipeline jit, sharded maps).
"""

__version__ = "0.1.0"

from .config import SumaConfig, config_from_xml  # noqa: F401
