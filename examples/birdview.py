"""Bird's-eye-view demo: perspective warp of a road scene to top-down.

Analogue of the reference's samples/birdview (CompVImage::warpInverse with
a road-plane homography), all compute on TPU via the remap-based warp.

Usage:
  python examples/birdview.py [input.png [out.png]]
With no arguments a synthetic straight-road scene is generated; the
homography maps the road trapezoid to a rectangle (lane lines become
parallel verticals in the output — printed as a check).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from compv_tpu.io import image as image_io
from compv_tpu.ops import remap


def synthetic_road(seed=0, h=360, w=480):
    rng = np.random.default_rng(seed)
    img = np.full((h, w), 70, np.float64)
    horizon = h // 3
    yy, xx = np.mgrid[0:h, 0:w]
    img[:horizon] = 150  # sky
    # two lane lines converging to the vanishing point (w/2, horizon)
    for lane_x in (w * 0.25, w * 0.75):
        t = (yy - horizon) / (h - horizon)  # 0 at horizon, 1 at bottom
        lx = w / 2 + (lane_x - w / 2) * t
        on = (yy >= horizon) & (np.abs(xx - lx) < 1.5 + 2.5 * t)
        img[on] = 230
    img += rng.normal(0, 4, (h, w))
    return np.clip(img, 0, 255).astype(np.uint8), horizon


def road_homography(h, w, horizon):
    """H mapping OUTPUT (top-down) pixels -> INPUT (perspective) pixels:
    the output rectangle's corners come from the road trapezoid."""
    # road trapezoid in the input: bottom edge full width, top edge narrow
    y0, y1 = horizon + 10, h - 1
    t = (y0 - horizon) / (h - horizon)
    src = np.float32([[w / 2 + (0.25 * w - w / 2) * t, y0],
                      [w / 2 + (0.75 * w - w / 2) * t, y0],
                      [0.75 * w, y1], [0.25 * w, y1]])
    dst = np.float32([[0.25 * w, 0], [0.75 * w, 0],
                      [0.75 * w, h - 1], [0.25 * w, h - 1]])
    # DLT from 4 exact correspondences (dst -> src)
    a = []
    for (xd, yd), (xs, ys) in zip(dst, src):
        a.append([xd, yd, 1, 0, 0, 0, -xs * xd, -xs * yd, -xs])
        a.append([0, 0, 0, xd, yd, 1, -ys * xd, -ys * yd, -ys])
    _, _, vt = np.linalg.svd(np.asarray(a, np.float64))
    return (vt[-1] / vt[-1, -1]).reshape(3, 3).astype(np.float32)


def main(argv):
    if len(argv) > 1:
        img = image_io.imread(argv[1], gray=True)
        h, w = img.shape
        horizon = h // 3
    else:
        img, horizon = synthetic_road()
        h, w = img.shape
    out_path = argv[2] if len(argv) > 2 else "birdview.png"
    h_mat = road_homography(h, w, horizon)
    top = np.asarray(remap.warp_perspective_inverse(
        jnp.asarray(img), jnp.asarray(h_mat), h, w))
    image_io.imwrite(out_path, top)
    # check: lane lines are now vertical — bright-column positions match
    # between an upper and a lower band
    def lanes(row_band):
        cols = top[row_band].mean(0)
        return set(np.flatnonzero(cols > cols.mean() + 30) // 20)
    print(f"lane columns upper={sorted(lanes(slice(20, 60)))} "
          f"lower={sorted(lanes(slice(h - 60, h - 20)))}")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(sys.argv)
