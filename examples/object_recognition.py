"""Object recognition: ORB match + homography + rendered overlay.

Port of the reference's flagship sample (samples/object_recognition/
main.cxx: camera frame -> grayscale -> ORB dete/desc -> brute-force KNN2 ->
Lowe ratio -> homography -> perspective-project the pattern outline -> draw)
running the whole compute path on TPU with host-side rendering.

Usage:
  python examples/object_recognition.py [pattern.png scene.png [out.png]]
With no arguments a synthetic pattern/scene pair is generated.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from compv_tpu import OrbConfig, RansacConfig
from compv_tpu.features.orb import orb_detect_describe
from compv_tpu.geometry import homography, transform
from compv_tpu.io import image as image_io
from compv_tpu.matchers import bruteforce
from compv_tpu import viz


def synthetic_pair(seed=0):
    rng = np.random.default_rng(seed)
    pattern = np.clip(rng.normal(128, 60, (160, 200)), 0, 255).astype(np.uint8)
    scene = np.clip(rng.normal(90, 20, (360, 480)), 0, 255).astype(np.uint8)
    # paste a shifted copy of the pattern into the scene
    scene[100:260, 140:340] = pattern
    return pattern, scene


def main(argv):
    if len(argv) >= 3:
        pattern = image_io.imread(argv[1], gray=True)
        scene = image_io.imread(argv[2], gray=True)
        out_path = argv[3] if len(argv) > 3 else "matches.png"
    else:
        pattern, scene = synthetic_pair()
        out_path = argv[1] if len(argv) > 1 else "matches.png"

    cfg = OrbConfig(levels=8, max_features=1000)
    p1, d1 = orb_detect_describe(jnp.asarray(pattern), cfg)
    p2, d2 = orb_detect_describe(jnp.asarray(scene), cfg)
    m = bruteforce.match(d1, d2, knn=2)
    good = bruteforce.lowe_ratio_mask(m, 0.75)
    n_good = int(jnp.sum(good))
    print(f"pattern kps={int(p1.count)} scene kps={int(p2.count)} "
          f"good matches={n_good}")

    if n_good >= 8:  # the reference requires >= 8 (main.cxx:158)
        src = p1.xy
        dst = p2.xy[m.train_idx[:, 0]]
        res = homography.find_homography(
            jax.random.PRNGKey(0), src, dst, valid_mask=good,
            config=RansacConfig(threshold=9.0, max_iters=512, batch=128))
        print(f"homography inliers={int(res.num_inliers)}")
        h_img, w_img = pattern.shape
        corners = jnp.asarray([[0, 0], [w_img - 1, 0],
                               [w_img - 1, h_img - 1], [0, h_img - 1]],
                              jnp.float32)
        proj = transform.perspective2d(corners, res.h)
        c = np.asarray(proj)
        segs = [(c[i][0], c[i][1], c[(i + 1) % 4][0], c[(i + 1) % 4][1])
                for i in range(4)]
        scene_draw = viz.draw_lines(scene, segs, thickness=2)
    else:
        scene_draw = viz.to_rgb(scene)

    canvas = viz.draw_matches(pattern, np.asarray(p1.xy), scene_draw,
                              np.asarray(p2.xy),
                              np.asarray(m.train_idx[:, 0]),
                              mask=np.asarray(good))
    image_io.imwrite(out_path, canvas)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(sys.argv)
