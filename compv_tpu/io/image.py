"""Image file IO.

PGM/PPM read/write are self-contained (the reference test corpus is raw
gray/YUV — compv_tests reads .yuv blobs; PGM is the portable equivalent with
a header). JPEG/PNG/BMP decode routes through PIL when present (the
reference dlopens libjpeg, compv_image_decoder.cxx:14-34 — same idea:
decode on host, compute on device).
"""
from __future__ import annotations

import os
from typing import Tuple

import numpy as np


def read_pgm(path: str) -> np.ndarray:
    """Binary PGM (P5) -> (H, W) uint8 / uint16."""
    with open(path, "rb") as f:
        data = f.read()
    # header: magic, width, height, maxval — whitespace/comment separated
    tokens, i = [], 0
    while len(tokens) < 4:
        while i < len(data) and data[i:i + 1].isspace():
            i += 1
        if data[i:i + 1] == b"#":
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(data) and not data[j:j + 1].isspace():
            j += 1
        tokens.append(data[i:j])
        i = j
    magic, w, h, maxval = tokens[0], int(tokens[1]), int(tokens[2]), int(tokens[3])
    if magic != b"P5":
        raise ValueError(f"not a binary PGM: {magic!r}")
    i += 1  # single whitespace after maxval
    dt = np.uint8 if maxval < 256 else np.dtype(">u2")
    img = np.frombuffer(data, dt, count=h * w, offset=i).reshape(h, w)
    return img.astype(np.uint16) if maxval >= 256 else img.copy()


def write_pgm(path: str, img: np.ndarray) -> None:
    img = np.asarray(img)
    assert img.ndim == 2 and img.dtype == np.uint8
    with open(path, "wb") as f:
        f.write(f"P5\n{img.shape[1]} {img.shape[0]}\n255\n".encode())
        f.write(img.tobytes())


def read_ppm(path: str) -> np.ndarray:
    """Binary PPM (P6) -> (H, W, 3) uint8."""
    with open(path, "rb") as f:
        data = f.read()
    tokens, i = [], 0
    while len(tokens) < 4:
        while i < len(data) and data[i:i + 1].isspace():
            i += 1
        if data[i:i + 1] == b"#":
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(data) and not data[j:j + 1].isspace():
            j += 1
        tokens.append(data[i:j])
        i = j
    magic, w, h = tokens[0], int(tokens[1]), int(tokens[2])
    if magic != b"P6":
        raise ValueError(f"not a binary PPM: {magic!r}")
    i += 1
    return np.frombuffer(data, np.uint8, count=h * w * 3,
                         offset=i).reshape(h, w, 3).copy()


def write_ppm(path: str, img: np.ndarray) -> None:
    img = np.asarray(img)
    assert img.ndim == 3 and img.shape[2] == 3 and img.dtype == np.uint8
    with open(path, "wb") as f:
        f.write(f"P6\n{img.shape[1]} {img.shape[0]}\n255\n".encode())
        f.write(img.tobytes())


def read_yuv420(path: str, width: int, height: int,
                frame: int = 0) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One frame of a raw I420 file -> (Y (H,W), U, V (H/2,W/2)) uint8
    (the reference test corpus format, e.g. equirectangular_1282x720.yuv)."""
    ysz = width * height
    csz = (width // 2) * (height // 2)
    fsz = ysz + 2 * csz
    with open(path, "rb") as f:
        f.seek(frame * fsz)
        buf = np.frombuffer(f.read(fsz), np.uint8)
    y = buf[:ysz].reshape(height, width)
    u = buf[ysz:ysz + csz].reshape(height // 2, width // 2)
    v = buf[ysz + csz:].reshape(height // 2, width // 2)
    return y.copy(), u.copy(), v.copy()


def imread(path: str, gray: bool = False) -> np.ndarray:
    """Decode any supported image file (PGM/PPM natively; JPEG/PNG/BMP/...
    via PIL, the libjpeg analogue)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".pgm":
        img = read_pgm(path)
        return img if not gray or img.ndim == 2 else img
    if ext == ".ppm":
        img = read_ppm(path)
    else:
        try:
            from PIL import Image as PILImage
        except ImportError as e:  # pragma: no cover
            raise RuntimeError(f"PIL unavailable for {ext} decode") from e
        img = np.asarray(PILImage.open(path))
    if gray and img.ndim == 3:
        from ..ops.color import rgb_to_gray
        import jax.numpy as jnp
        return np.asarray(rgb_to_gray(jnp.asarray(img[..., :3])))
    return img


def imwrite(path: str, img: np.ndarray) -> None:
    ext = os.path.splitext(path)[1].lower()
    img = np.asarray(img)
    if ext == ".pgm":
        write_pgm(path, img)
    elif ext == ".ppm":
        write_ppm(path, img)
    else:
        from PIL import Image as PILImage
        PILImage.fromarray(img).save(path)
