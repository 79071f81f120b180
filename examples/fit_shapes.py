"""Robust model fitting demo: RANSAC line and parabola on noisy points.

Analogue of the reference's samples/fit_line and samples/fit_parabola
(CompVMathStatsFit::line / parabola inside the generic RANSAC engine),
all compute on TPU with batched-hypothesis RANSAC.

Usage:
  python examples/fit_shapes.py [out.png]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from compv_tpu.geometry import statsfit
from compv_tpu.io import image as image_io
from compv_tpu import viz


def main(argv):
    out_path = argv[1] if len(argv) > 1 else "fit_shapes.png"
    rng = np.random.default_rng(0)

    # line y = 0.6 x + 40 with 30% outliers
    xs = rng.uniform(0, 480, 200)
    ys = 0.6 * xs + 40 + rng.normal(0, 2.0, 200)
    out = rng.random(200) < 0.3
    ys[out] = rng.uniform(0, 360, out.sum())
    pts = jnp.asarray(np.stack([xs, ys], 1), jnp.float32)
    res = statsfit.fit_line_ransac(jax.random.PRNGKey(0), pts)
    a, b, c = (float(v) for v in res.model)
    slope, icept = -a / b, -c / b
    print(f"line: slope={slope:.3f} (gt 0.600) intercept={icept:.1f} "
          f"(gt 40.0) inliers={int(res.num_inliers)}/200")
    assert abs(slope - 0.6) < 0.05

    # parabola y = 0.004 (x-240)^2 + 60 with outliers
    xs2 = rng.uniform(0, 480, 200)
    ys2 = 0.004 * (xs2 - 240) ** 2 + 60 + rng.normal(0, 2.0, 200)
    out2 = rng.random(200) < 0.3
    ys2[out2] = rng.uniform(0, 360, out2.sum())
    pts2 = jnp.asarray(np.stack([xs2, ys2], 1), jnp.float32)
    res2 = statsfit.fit_parabola_ransac(jax.random.PRNGKey(1), pts2)
    pa, pb, pc = (float(v) for v in res2.model)
    print(f"parabola: a={pa:.5f} (gt 0.00400) "
          f"inliers={int(res2.num_inliers)}/200")
    assert abs(pa - 0.004) < 0.001

    canvas = np.full((360, 480, 3), 255, np.uint8)
    canvas = viz.draw_points(canvas, np.stack([xs, ys], 1),
                             color=(40, 90, 220))
    canvas = viz.draw_points(canvas, np.stack([xs2, ys2], 1),
                             color=(220, 120, 40))
    gx = np.arange(0, 480, 4, dtype=np.float64)
    line_pts = np.stack([gx, slope * gx + icept], 1)
    par_pts = np.stack([gx, pa * gx * gx + pb * gx + pc], 1)
    canvas = viz.draw_points(canvas, line_pts, color=(0, 0, 0), radius=1)
    canvas = viz.draw_points(canvas, par_pts, color=(0, 0, 0), radius=1)
    image_io.imwrite(out_path, canvas)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(sys.argv)
