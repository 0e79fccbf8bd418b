"""densemonoslam_tpu — a TPU-native dense collaborative monocular/RGB-D SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
robotvisionmu/DenseMonoSLAM (ElasticFusion-style surfel SLAM + monocular depth
prediction + hybrid sparse tracking + NID keyframing + collaborative multi-map
sessions).  The reference system splits its hot path across GLSL transform
feedback, CUDA kernels, and CPU Eigen/CHOLMOD; here everything is dense-array
functional state transformed by jitted steps:

- the surfel map is a fixed-capacity SoA tensor (``mapping.surfel_map``), not a
  GL VBO ping-pong pair;
- the tracking Gauss-Newton normal equations are built by a single MXU matmul
  (``ops.reductions``), not a warp-shuffle tree reduction;
- map prediction is a scatter-min z-buffer rasteriser (``ops.splat``), not a
  point-sprite render pass;
- the deformation-graph solve is an on-device dense/CG Gauss-Newton
  (``mapping.deformation``), not CHOLMOD on the host;
- collaborative multi-camera sessions shard cameras and surfel blocks over a
  ``jax.sharding.Mesh`` (``parallel``), not LCM UDP multicast into one GPU.
"""

import jax as _jax

# SLAM is a geometry pipeline, not a neural net: poses chain multiplicatively
# and the GN normal equations difference near-equal quantities, so the TPU
# default of bf16 MXU passes for f32 matmuls (~8 mantissa bits, ~4e-3
# relative) injects millimetre-level noise into every vertex transform and
# Gram reduction — measured 59 mm ATE on-chip vs 0.7 mm on CPU for the same
# code.  Force true-f32 matmuls package-wide (the 6-pass bf16 emulation);
# every geometry matmul here is skinny (K<=32 Gram factors, 3x3/4x4 poses),
# so the 6x FLOP cost is noise next to the bandwidth-bound image passes.
# Model code that genuinely wants bf16 (DepthNet convs) can request
# precision='default' per-op.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent XLA compilation cache: several pipeline programs (compaction at
# multi-million-row capacity, bundle adjustment, loop closures) cost 5-15 s
# EACH to compile and first run mid-sequence — the cache makes that a
# once-per-machine cost instead of a live-pipeline stall.  DMS_JAX_CACHE=0
# opts out.
from densemonoslam_tpu.utils import jax_cache as _jax_cache

_jax_cache.enable()

from densemonoslam_tpu.config import (
    CameraIntrinsics,
    EngineConfig,
    FrameResolution,
)

__version__ = "0.1.0"

__all__ = [
    "CameraIntrinsics",
    "EngineConfig",
    "FrameResolution",
    "__version__",
]
