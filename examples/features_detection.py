"""Corner detection demo: FAST corners rendered over the input.

Analogue of the reference's samples/features_detection (main.cxx: load ->
grayscale -> FAST dete -> draw interest points), all compute on TPU.

Usage:
  python examples/features_detection.py [input.png [out.png]]
With no arguments a synthetic textured image is generated.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from compv_tpu import FastConfig
from compv_tpu.features.fast import fast_detect
from compv_tpu.io import image as image_io
from compv_tpu import viz


def synthetic(seed=0):
    rng = np.random.default_rng(seed)
    h, w = 360, 480
    yy, xx = np.mgrid[0:h, 0:w]
    img = 96 + 80.0 * ((xx // 24 + yy // 24) % 2)
    img += rng.normal(0, 6, (h, w))
    return np.clip(img, 0, 255).astype(np.uint8)


def main(argv):
    img = (image_io.imread(argv[1], gray=True) if len(argv) > 1
           else synthetic())
    out_path = argv[2] if len(argv) > 2 else "corners.png"
    cfg = FastConfig(threshold=20, max_features=2000)
    pts = fast_detect(jnp.asarray(img), cfg)
    n = int(pts.count)
    print(f"FAST9 thr={cfg.threshold} nms: {n} corners")
    canvas = viz.draw_points(img, np.asarray(pts.xy)[:n])
    image_io.imwrite(out_path, canvas)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(sys.argv)
