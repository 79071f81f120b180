"""Typed configuration dataclasses.

Replaces the reference's untyped integer-id caps get/set system
(base/include/compv/base/compv_caps.h:15-33 and the per-algorithm id enums in
base/include/compv/base/compv_features.h:47-121) with frozen dataclasses whose
fields are hashable static jit arguments. Defaults mirror the reference's
hard-coded defaults where they exist.
"""
from __future__ import annotations

import dataclasses
import enum


class FastType(enum.Enum):
    FAST9 = 9
    FAST12 = 12


class Interp(enum.Enum):
    NEAREST = "nearest"
    BILINEAR = "bilinear"
    BICUBIC = "bicubic"


class BorderMode(enum.Enum):
    ZERO = "zero"          # COMPV_BORDER_TYPE_ZERO
    REPLICATE = "replicate"  # COMPV_BORDER_TYPE_REPLICATE
    IGNORE = "ignore"      # COMPV_BORDER_TYPE_IGNORE (leave input rows)


@dataclasses.dataclass(frozen=True)
class FastConfig:
    """FAST corner detector config.

    Defaults per reference: threshold 20, NMS on, max 2000 features
    (compv_core_feature_fast_dete.cxx:72-76).
    """

    threshold: int = 20
    fast_type: FastType = FastType.FAST9
    nonmax_suppression: bool = True
    max_features: int = 2000


@dataclasses.dataclass(frozen=True)
class OrbConfig:
    """ORB detector+descriptor config.

    Defaults per reference: 8 pyramid levels, scale factor 0.83, FAST
    threshold 20 with NMS, patch diameter 31, 256-bit BRIEF
    (compv_core_feature_orb_dete.cxx:35-44).
    """

    levels: int = 8
    scale_factor: float = 0.83
    fast: FastConfig = dataclasses.field(default_factory=FastConfig)
    max_features: int = 2000
    patch_diameter: int = 31
    blur_kernel_size: int = 5
    blur_sigma: float = 2.0
    brief_bits: int = 256
    brief_seed: int = 0x5EED  # pattern seed (used by the "gaussian" pattern)
    # "learned" = the ORB learned pair table (reference data; ties the
    # gaussian pattern on the quality A/B in tests/test_descriptor_quality
    # and buys reference/OpenCV bit-comparability);
    # "gaussian" = seeded random pairs (classic BRIEF)
    brief_pattern: str = "learned"


@dataclasses.dataclass(frozen=True)
class CannyConfig:
    """Canny defaults per reference: kernel size 3, thresholds as fractions of
    mean when `threshold_type` is 'percent' (canny_dete.cxx)."""

    low: float = 59.0
    high: float = 119.0
    kernel_size: int = 3
    hysteresis_iters: int = 32  # fixpoint dilate iterations


@dataclasses.dataclass(frozen=True)
class MatchConfig:
    knn: int = 2
    max_distance: int = 256
    cross_check: bool = False


@dataclasses.dataclass(frozen=True)
class RansacConfig:
    """RANSAC per reference CompVMathStatsRansac (stats_ransac.cxx:21-296):
    confidence p=0.995, adaptive trial count, min inlier fraction."""

    max_iters: int = 2000
    batch: int = 256           # hypotheses scored per device step (redesign:
    # the reference runs hypotheses serially per thread; we batch them)
    confidence: float = 0.995
    threshold: float = 9.0     # squared-error inlier threshold
    min_inlier_frac: float = 0.25


@dataclasses.dataclass(frozen=True)
class HoughConfig:
    rho: float = 1.0
    theta_steps: int = 180
    threshold: int = 100
    max_lines: int = 128


@dataclasses.dataclass(frozen=True)
class HogConfig:
    """S-HOG defaults per reference (hog_std.cxx): 8x8 cells, 16x16 blocks,
    stride 8, 9 unsigned bins, L2-Hys norm."""

    cell_size: int = 8
    block_size: int = 16
    block_stride: int = 8
    nbins: int = 9
    norm: str = "l2hys"   # none|l1|l1sqrt|l2|l2hys
    signed_gradient: bool = False


@dataclasses.dataclass(frozen=True)
class BAConfig:
    """Windowed bundle-adjustment config (beyond-reference subsystem)."""

    max_iters: int = 20
    damping_init: float = 1e-3
    damping_up: float = 10.0
    damping_down: float = 0.1
    huber_delta: float = 2.0
