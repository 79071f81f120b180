"""Separable and 2-D convolution.

Re-design of CompVMathConvlt (base/include/compv/base/math/compv_math_convlt.h:
26-98, ~3.5k LoC of SIMD asm): on TPU, small-kernel image convolution is
bandwidth-bound, so the right formulation is a fused XLA `lax.conv` /
shift-and-add chain over float32/bfloat16 rows. The reference's uint8
fixed-point path (convlt1FixedPoint) exists to emulate what bf16 gives us for
free — we keep a `rounding`-exact uint8 output mode for golden parity.

Border mode ZERO matches the reference default (kernel taps outside the image
contribute 0). Mode REPLICATE clamps; IGNORE leaves border rows/cols equal to
the input (the reference's COMPV_BORDER_TYPE_IGNORE copies input borders).
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import BorderMode


def gaussian_kernel1d(size: int, sigma: float) -> np.ndarray:
    """Normalized 1-D Gaussian taps (float64 on host, like the reference's
    CompVMathGauss::kernelDim1)."""
    assert size % 2 == 1
    r = np.arange(size, dtype=np.float64) - size // 2
    k = np.exp(-(r * r) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def _pad(x: jax.Array, ph: int, pw: int, border: BorderMode) -> jax.Array:
    if border == BorderMode.REPLICATE:
        return jnp.pad(x, ((ph, ph), (pw, pw)), mode="edge")
    return jnp.pad(x, ((ph, ph), (pw, pw)))  # zeros


def conv2d(img: jax.Array, kernel: jax.Array,
           border: BorderMode = BorderMode.ZERO,
           out_dtype=None) -> jax.Array:
    """Dense 2-D convolution of a single-channel image. Kernel is (kh, kw),
    correlation orientation (same as the reference's convlt2)."""
    kh, kw = kernel.shape
    x = _pad(img.astype(jnp.float32), kh // 2, kw // 2, border)
    out = jax.lax.conv_general_dilated(
        x[None, None], kernel.astype(jnp.float32)[None, None],
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )[0, 0]
    return _finish(img, out, border, out_dtype)


def conv_separable(img: jax.Array, kx: jax.Array, ky: jax.Array,
                   border: BorderMode = BorderMode.ZERO,
                   out_dtype=None) -> jax.Array:
    """Separable convolution: horizontal taps kx then vertical taps ky
    (reference convlt1 order: vt then hz — commutative for ZERO border)."""
    kxl = int(kx.shape[0])
    kyl = int(ky.shape[0])
    x = _pad(img.astype(jnp.float32), kyl // 2, kxl // 2, border)
    # Horizontal pass as 1xK conv, vertical as Kx1: XLA fuses both into a
    # small number of HBM passes; on TPU this beats an explicit im2col.
    out = jax.lax.conv_general_dilated(
        x[None, None], kx.astype(jnp.float32).reshape(1, 1, 1, kxl),
        (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST)
    out = jax.lax.conv_general_dilated(
        out, ky.astype(jnp.float32).reshape(1, 1, kyl, 1),
        (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST)[0, 0]
    return _finish(img, out, border, out_dtype)


def _finish(img, out, border, out_dtype):
    if border == BorderMode.IGNORE:
        # keep input border rows/cols — not needed for current users; the
        # padded result already has full size, so IGNORE == ZERO shape-wise.
        pass
    if out_dtype is None:
        return out
    if jnp.issubdtype(out_dtype, jnp.integer):
        info = jnp.iinfo(out_dtype)
        return jnp.clip(jnp.round(out), info.min, info.max).astype(out_dtype)
    return out.astype(out_dtype)


def gaussian_blur(img: jax.Array, size: int = 5, sigma: float = 2.0,
                  border: BorderMode = BorderMode.ZERO,
                  out_dtype=jnp.uint8) -> jax.Array:
    """Gaussian blur via separable conv (reference ORB desc uses size=5,
    sigma=2, compv_core_feature_orb_desc.cxx:119-120). Routes to the fused
    Pallas kernel on TPU (kernels/conv_sep.py) — one HBM pass instead of
    XLA's conv lowering."""
    from ..kernels.dispatch import pallas_enabled
    if pallas_enabled() and img.ndim == 2 and border in (BorderMode.ZERO,
                                                         BorderMode.REPLICATE):
        from ..kernels.conv_sep import gaussian_blur_pallas
        mode = "edge" if border == BorderMode.REPLICATE else "constant"
        out = gaussian_blur_pallas(img, size, sigma, out_dtype=None,
                                   pad_mode=mode)
        return _finish(img, out, border, out_dtype)
    k = jnp.asarray(gaussian_kernel1d(size, sigma))
    return conv_separable(img, k, k, border=border, out_dtype=out_dtype)


# Sobel / Scharr / Prewitt kernels as declared by the reference
# (base/include/compv/base/compv_features.h:124-133).
SOBEL3 = (np.array([1.0, 0.0, -1.0], np.float32),
          np.array([1.0, 2.0, 1.0], np.float32))
SCHARR3 = (np.array([1.0, 0.0, -1.0], np.float32),
           np.array([3.0, 10.0, 3.0], np.float32))
PREWITT3 = (np.array([1.0, 0.0, -1.0], np.float32),
            np.array([1.0, 1.0, 1.0], np.float32))


def gradients(img: jax.Array, kind: str = "sobel",
              border: BorderMode = BorderMode.ZERO):
    """Gx, Gy via separable derivative kernels. Returns float32 pair.
    On TPU both derivatives run in ONE fused Pallas pass over the image."""
    from ..kernels.dispatch import pallas_enabled
    if pallas_enabled() and img.ndim == 2 and border == BorderMode.ZERO:
        from ..kernels.conv_sep import gradients_pallas
        return gradients_pallas(img, kind)
    deriv, smooth = {"sobel": SOBEL3, "scharr": SCHARR3, "prewitt": PREWITT3}[kind]
    deriv = jnp.asarray(deriv)
    smooth = jnp.asarray(smooth)
    gx = conv_separable(img, deriv, smooth, border=border)
    gy = conv_separable(img, smooth, deriv, border=border)
    return gx, gy


def gradient_fast(img: jax.Array):
    """1-0-1 central-difference gradients (reference CompVGradientFast,
    base/include/compv/base/compv_gradient_fast.h:19-68): gx[i]=I[i+1]-I[i-1],
    gy likewise vertically; borders zero."""
    x = img.astype(jnp.float32)
    gx = jnp.zeros_like(x).at[:, 1:-1].set(x[:, 2:] - x[:, :-2])
    gy = jnp.zeros_like(x).at[1:-1, :].set(x[2:, :] - x[:-2, :])
    return gx, gy
