"""compv-tpu: a TPU-native computer-vision / SLAM framework.

Brand-new JAX/XLA/Pallas implementation with the capability surface of the
reference CPU/SIMD library tidehc/compv (image pipeline, FAST/ORB features,
matching, geometry/calibration, CCL/Hough/HOG/MSER, ML utilities) plus the
distributed SLAM layer (windowed BA, pose graph, multi-chip sharding) the
reference lacks.
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry/linalg correctness requires true-f32 matmuls; JAX's default TPU
# matmul precision is bf16-grade. Hot kernels that want MXU bf16 throughput
# opt in explicitly by casting inputs to bfloat16 (exact for {0,1} bit planes
# and uint8 pixel data), so this global costs nothing where it matters.
_jax.config.update("jax_default_matmul_precision", "highest")

from .core import (  # noqa: F401
    Image, PixelFormat, Points, Descriptors, Matches,
    FastConfig, FastType, OrbConfig, CannyConfig, MatchConfig, RansacConfig,
    HoughConfig, HogConfig, BAConfig, Interp, BorderMode,
)
from . import ops  # noqa: F401


def __getattr__(name):
    # lazy subpackage access: compv_tpu.ml, .io, .viz, .slam, ... import on
    # first touch (keeps bare `import compv_tpu` light for TPU startup)
    import importlib
    if name in ("features", "geometry", "matchers", "slam", "parallel",
                "ml", "io", "viz", "kernels", "runtime", "core"):
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(name)
