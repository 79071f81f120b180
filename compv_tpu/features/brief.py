"""Rotated BRIEF-256 binary descriptors.

Re-design of the reference's ORB descriptor (core/features/orb/
compv_core_feature_orb_desc.cxx:100-560 + Brief256_31 SSE41/AVX2/NEON asm,
~2.6k LoC): per point, 256 pixel-pair comparisons inside a 31x31 patch,
pattern rotated by the point's orientation, bits packed into uint32[8].

The reference embeds OpenCV's learned 256-pair table; we instead generate a
deterministic Gaussian-sampled pattern (classic BRIEF, Calonder et al.) from
a fixed seed — same descriptor family and matching behavior, but our
descriptors are not bit-compatible with the reference's (its MD5 oracle
depends on its table; parity is checked statistically in tests instead).

TPU formulation: rotation is a (256, 2) @ (2, 2) matmul batched over points;
sampling is one vectorized gather; comparison+packing is a VPU pass. No
per-point loops.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import Descriptors, Points


@functools.lru_cache(maxsize=None)
def brief_pattern(bits: int = 256, patch_diameter: int = 31,
                  seed: int = 0x5EED):
    """(bits, 2) int32 offsets for A and B sample points, Gaussian-sampled
    (sigma = patch/5, the classic BRIEF G-II sampling) and clipped to the
    patch. Deterministic in `seed`."""
    rng = np.random.default_rng(seed)
    radius = patch_diameter // 2
    sigma = patch_diameter / 5.0
    a = np.clip(np.round(rng.normal(0, sigma, (bits, 2))), -radius, radius)
    b = np.clip(np.round(rng.normal(0, sigma, (bits, 2))), -radius, radius)
    # avoid degenerate identical pairs
    same = np.all(a == b, axis=1)
    b[same] = np.clip(b[same] + 1, -radius, radius)
    # host numpy out of the cache (jnp arrays from lru_cache leak tracers
    # when first materialized under jit)
    return a.astype(np.float32), b.astype(np.float32)


def _pack_bits(cmp: jax.Array) -> jax.Array:
    """(N, 256) bool -> (N, 8) uint32, little-endian bit order within word."""
    n, bits = cmp.shape
    words = bits // 32
    c = cmp.reshape(n, words, 32).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(c << shifts[None, None, :], axis=-1, dtype=jnp.uint32)


def describe(img: jax.Array, points: Points, patch_diameter: int = 31,
             bits: int = 256, seed: int = 0x5EED,
             xy=None) -> Descriptors:
    """Compute rotated BRIEF descriptors at `points` on (blurred) `img`.

    ``xy`` optionally overrides the sampling coordinates (e.g. level-local
    coords while points.xy stores level-0 coords). Points whose rotated
    pattern would leave the image are still sampled with clamped coordinates
    (the reference instead erases near-border points before describing —
    callers replicating that should pre-filter, see orb.py).
    """
    coords = points.xy if xy is None else xy
    pa_np, pb_np = brief_pattern(bits, patch_diameter, seed)
    pa, pb = jnp.asarray(pa_np), jnp.asarray(pb_np)
    cos = jnp.cos(points.angle)
    sin = jnp.sin(points.angle)
    # rotation per point: (N, 2, 2) applied to (bits, 2) pattern -> (N, bits, 2)
    rot = jnp.stack([jnp.stack([cos, -sin], -1),
                     jnp.stack([sin, cos], -1)], -2)  # (N, 2, 2)
    # offsets' = R(theta) @ p — steer the pattern TO the keypoint
    # orientation (round 1 contracted p^T R = R(-theta) p, i.e. counter-
    # rotation: instead of canceling in-plane rotation it DOUBLED it, and
    # matching collapsed beyond ~10 deg; caught by the round-2 descriptor
    # quality harness, tests/test_descriptor_quality.py)
    ra = jnp.einsum("bk,njk->nbj", pa, rot)
    rb = jnp.einsum("bk,njk->nbj", pb, rot)
    h, w = img.shape

    def sample(offsets):
        x = jnp.round(coords[:, None, 0] + offsets[..., 0]).astype(jnp.int32)
        y = jnp.round(coords[:, None, 1] + offsets[..., 1]).astype(jnp.int32)
        x = jnp.clip(x, 0, w - 1)
        y = jnp.clip(y, 0, h - 1)
        return img[y, x].astype(jnp.int32)   # vectorized gather (N, bits)

    bits_cmp = sample(ra) < sample(rb)
    packed = _pack_bits(bits_cmp)
    # zero descriptors of padding slots for determinism
    packed = jnp.where(points.valid[:, None], packed, 0)
    return Descriptors(bits=packed, count=points.count)
