"""Core array/pytree types for compv-tpu.

Design notes (vs reference tidehc/compv):
  * The reference's single tensor type ``CompVMat`` (base/include/compv/base/
    compv_mat.h:21-573) is a strided, SIMD-aligned, multi-plane matrix. On TPU
    the equivalent is simply ``jnp.ndarray`` — XLA owns layout/tiling — plus a
    light ``Image`` pytree carrying pixel-format metadata for multi-plane
    formats (YUV420p etc.).
  * The reference's variable-length outputs (``CompVInterestPointVector``,
    ``CompVDMatchVector``, base/include/compv/base/compv_common.h:609-675) are
    re-designed as *fixed-capacity padded buffers + a live count* so every
    shape is static under jit. Padding entries carry strength=-inf / dist=max
    so reductions and top-k remain correct without branching.
"""
from __future__ import annotations

import dataclasses
import enum
from typing import Tuple

import jax
import jax.numpy as jnp


class PixelFormat(enum.Enum):
    """Pixel formats supported by the image pipeline.

    Mirrors the capability set of the reference's COMPV_SUBTYPE pixel formats
    (base/include/compv/base/compv_common.h) without the packed-stride
    machinery: planes are separate dense arrays.
    """

    GRAY8 = "gray8"          # (H, W) uint8
    RGB24 = "rgb24"          # (H, W, 3) uint8
    BGR24 = "bgr24"          # (H, W, 3) uint8
    RGBA32 = "rgba32"        # (H, W, 4) uint8
    YUV444P = "yuv444p"      # 3 planes (H, W)
    YUV420P = "yuv420p"      # Y (H, W), U/V (H/2, W/2)
    NV12 = "nv12"            # Y (H, W), interleaved UV (H/2, W/2, 2)
    HSV = "hsv"              # (H, W, 3) uint8


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Image:
    """A multi-plane image pytree.

    ``planes`` is a tuple of jnp arrays; ``fmt`` is static metadata. For
    packed formats there is exactly one plane of shape (H, W, C); for planar
    formats one array per plane. Replaces CompVMat's PIXELS mode.
    """

    planes: Tuple[jax.Array, ...]
    fmt: PixelFormat = dataclasses.field(metadata=dict(static=True))

    @property
    def height(self) -> int:
        return self.planes[0].shape[0]

    @property
    def width(self) -> int:
        return self.planes[0].shape[1]

    @classmethod
    def from_array(cls, arr: jax.Array, fmt: PixelFormat) -> "Image":
        return cls(planes=(arr,), fmt=fmt)

    def plane(self, i: int = 0) -> jax.Array:
        return self.planes[i]

    def crop(self, x: int, y: int, w: int, h: int) -> "Image":
        """Zero-copy view crop (reference CompVMat::bind(roi) / crop,
        compv_mat.h — XLA slices are views until materialized). Subsampled
        chroma planes crop at their own resolution."""
        out = []
        for p in self.planes:
            sy = self.planes[0].shape[0] // p.shape[0]
            sx = self.planes[0].shape[1] // p.shape[1]
            out.append(p[y // sy:(y + h) // sy, x // sx:(x + w) // sx])
        return Image(planes=tuple(out), fmt=self.fmt)


def _field(**kw):
    return dataclasses.field(**kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Points:
    """Fixed-capacity padded interest-point set.

    TPU-native replacement for ``CompVInterestPoint`` vectors
    (compv_common.h:609-640): capacity is a static shape, ``count`` is the
    number of live entries, invalid slots have ``strength == -inf``.

    Fields:
      xy:       (N, 2) float32 — x, y in level-0 pixel coordinates.
      strength: (N,)  float32 — detector response; -inf for padding.
      angle:    (N,)  float32 — orientation in radians (ORB); 0 if unset.
      level:    (N,)  int32   — pyramid level the point was detected at.
      size:     (N,)  float32 — patch diameter in level-0 pixels.
      count:    ()    int32   — number of valid points.
    """

    xy: jax.Array
    strength: jax.Array
    angle: jax.Array
    level: jax.Array
    size: jax.Array
    count: jax.Array

    @property
    def capacity(self) -> int:
        return self.xy.shape[0]

    @property
    def valid(self) -> jax.Array:
        """(N,) bool mask of live entries."""
        n = self.capacity
        return jnp.arange(n, dtype=jnp.int32) < self.count

    @classmethod
    def empty(cls, capacity: int) -> "Points":
        return cls(
            xy=jnp.zeros((capacity, 2), jnp.float32),
            strength=jnp.full((capacity,), -jnp.inf, jnp.float32),
            angle=jnp.zeros((capacity,), jnp.float32),
            level=jnp.zeros((capacity,), jnp.int32),
            size=jnp.full((capacity,), 7.0, jnp.float32),
            count=jnp.zeros((), jnp.int32),
        )

    def top_k(self, k: int) -> "Points":
        """Keep the k strongest points (replaces CompVInterestPoint::selectBest
        nth_element partial sort, compv_common.h:609-675) via lax.top_k."""
        strength, idx = jax.lax.top_k(self.strength, k)
        return Points(
            xy=self.xy[idx],
            strength=strength,
            angle=self.angle[idx],
            level=self.level[idx],
            size=self.size[idx],
            count=jnp.minimum(self.count, k).astype(jnp.int32),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Descriptors:
    """Packed binary descriptors: (N, W) uint32 where W*32 = bits (8 for
    BRIEF-256). Replaces the reference's N x 32-byte descriptor CompVMat
    (compv_core_feature_orb_desc.cxx:354-359)."""

    bits: jax.Array      # (N, words) uint32
    count: jax.Array     # () int32

    @property
    def capacity(self) -> int:
        return self.bits.shape[0]

    @property
    def valid(self) -> jax.Array:
        return jnp.arange(self.capacity, dtype=jnp.int32) < self.count

    @classmethod
    def empty(cls, capacity: int, bits: int = 256) -> "Descriptors":
        return cls(
            bits=jnp.zeros((capacity, bits // 32), jnp.uint32),
            count=jnp.zeros((), jnp.int32),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Matches:
    """KNN match result, fixed capacity over query index.

    Replaces ``CompVDMatch{queryIdx, trainIdx, imageIdx, distance}``
    (compv_common.h:652-675). Row i corresponds to query i; k columns hold
    the k nearest train indices/distances (distance = 2**30 for padding).
    """

    train_idx: jax.Array   # (Q, k) int32
    distance: jax.Array    # (Q, k) int32  (hamming) or float32
    query_valid: jax.Array  # (Q,) bool

    @property
    def k(self) -> int:
        return self.train_idx.shape[1]


# Python int, NOT jnp.int32(...): a module-level device scalar gets captured
# into every jit closure as a committed device constant, which on the axon
# remote-TPU runtime degrades all subsequent dispatches in the process
# (measured: 0.03ms ops become 23ms after one program embedding it runs).
PAD_DISTANCE = 2 ** 30


def concat_points(a: Points, b: Points) -> Points:
    """Concatenate two padded point sets into one of capacity |a|+|b|.

    Live entries of ``b`` are compacted after live entries of ``a`` by sorting
    on a validity key (stable), keeping everything static-shaped.
    """
    cap = a.capacity + b.capacity
    xy = jnp.concatenate([a.xy, b.xy])
    strength = jnp.concatenate([a.strength, b.strength])
    angle = jnp.concatenate([a.angle, b.angle])
    level = jnp.concatenate([a.level, b.level])
    size = jnp.concatenate([a.size, b.size])
    valid = jnp.concatenate([a.valid, b.valid])
    # Stable partition: valid entries first.
    order = jnp.argsort(~valid, stable=True)
    return Points(
        xy=xy[order], strength=strength[order], angle=angle[order],
        level=level[order], size=size[order],
        count=(a.count + b.count).astype(jnp.int32),
    )
