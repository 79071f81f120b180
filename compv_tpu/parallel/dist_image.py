"""Row-sharded image ops over a device mesh with halo exchange.

The reference's universal parallel pattern is `dispatchDividingAcrossY`
(base/parallel/compv_threaddisp.cxx:115-144): slice image rows across
threads, with overlap-pad for convolutions (canny_dete.cxx:177-190).
The multi-chip TPU analogue: shard rows across the mesh's `data` axis with
`shard_map`, exchange boundary rows with `ppermute` over ICI (the halo
exchange), and run the local kernel on the halo'd shard — the same pattern
context-parallel attention uses for sequence halos.

Single-chip callers never need this (XLA fuses whole-image programs); it
exists for images too large for one chip's HBM or for pipelined multi-chip
throughput. Tests run it on the 8-device virtual CPU mesh and assert
bit-equality with the single-chip program, seams included.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def _exchange_halo(local: jax.Array, halo: int, axis_name: str) -> jax.Array:
    """Prepend/append `halo` rows from the previous/next shard (zeros at the
    true image top/bottom) -> (rows + 2*halo, W)."""
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    top = local[:halo]
    bottom = local[-halo:]
    from_next = jax.lax.ppermute(
        top, axis_name, [(i, (i - 1) % n) for i in range(n)])
    from_prev = jax.lax.ppermute(
        bottom, axis_name, [(i, (i + 1) % n) for i in range(n)])
    # zero the wrap-around ends (border = ZERO semantics)
    from_prev = jnp.where(idx == 0, jnp.zeros_like(from_prev), from_prev)
    from_next = jnp.where(idx == n - 1, jnp.zeros_like(from_next), from_next)
    return jnp.concatenate([from_prev, local, from_next], axis=0)


def sharded_image_op(img: jax.Array, mesh: Mesh,
                     local_fn: Callable[[jax.Array, jax.Array], jax.Array],
                     halo: int, axis: str = "data") -> jax.Array:
    """Apply `local_fn(block_with_halo, global_row0)` to a row-sharded image.

    `block_with_halo` is (rows_per_shard + 2*halo, W); `global_row0` is the
    global row index of its first row (negative on the first shard, whose
    top halo is zero padding). The returned block's halo rows are discarded
    and shard interiors are stitched to the full (H, W) result. H must be a
    multiple of the axis size (pad first).
    """
    h, w = img.shape
    n = mesh.shape[axis]
    assert h % n == 0, f"pad rows to a multiple of {n}"
    rows = h // n

    def local(block):
        withhalo = _exchange_halo(block, halo, axis)
        row0 = jax.lax.axis_index(axis) * rows - halo
        out = local_fn(withhalo, row0)
        return out[halo:withhalo.shape[0] - halo]

    fn = shard_map(local, mesh=mesh, in_specs=P(axis, None),
                   out_specs=P(axis, None))
    return fn(img)


def gradients_sharded(img: jax.Array, mesh: Mesh, kind: str = "sobel",
                      axis: str = "data") -> Tuple[jax.Array, jax.Array]:
    """Row-sharded Sobel/Scharr/Prewitt gradients (the reference's
    overlap-pad convolution slicing, canny_dete.cxx:123-220, across chips).
    """
    from ..ops import convolve
    deriv, smooth = {"sobel": convolve.SOBEL3, "scharr": convolve.SCHARR3,
                     "prewitt": convolve.PREWITT3}[kind]
    dx = jnp.asarray(deriv)
    sm = jnp.asarray(smooth)

    gx = sharded_image_op(
        img, mesh, lambda b, _: convolve.conv_separable(b, dx, sm), halo=1,
        axis=axis)
    gy = sharded_image_op(
        img, mesh, lambda b, _: convolve.conv_separable(b, sm, dx), halo=1,
        axis=axis)
    return gx, gy


def gaussian_blur_sharded(img: jax.Array, mesh: Mesh, size: int = 5,
                          sigma: float = 2.0, axis: str = "data"
                          ) -> jax.Array:
    """Row-sharded Gaussian blur (float32 result)."""
    from ..ops import convolve
    k = jnp.asarray(convolve.gaussian_kernel1d(size, sigma))
    return sharded_image_op(
        img, mesh, lambda b, _: convolve.conv_separable(b, k, k),
        halo=size // 2, axis=axis)


def fast_strengths_sharded(img: jax.Array, mesh: Mesh, threshold: int = 20,
                           n: int = 9, nms: bool = True,
                           axis: str = "data") -> jax.Array:
    """Row-sharded FAST strengths+NMS, bit-equal to the single-chip program.

    halo = 4 (circle radius 3 + NMS 1). The 3-px interior frame must be
    masked in GLOBAL coordinates before NMS: each shard re-masks using its
    global row offset so seam rows behave exactly like interior rows and
    true image borders behave like the single-chip border."""
    from ..features import fast as fast_mod
    h = img.shape[0]

    def local(block, row0):
        s = fast_mod.fast_strengths(block, threshold, n)
        gy = row0 + jnp.arange(block.shape[0])
        s = jnp.where(((gy >= 3) & (gy < h - 3))[:, None], s, 0)
        if nms:
            s = fast_mod.fast_nms(s)
        return s

    return sharded_image_op(img, mesh, local, halo=4, axis=axis)
