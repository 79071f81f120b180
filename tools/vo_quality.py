"""VO-at-scale QUALITY run (round-4 verdict item 6): a long synthetic HD
sequence through the full image-level pipeline at the benchmark
configuration (8-level / 2000-feature ORB, 16k-landmark map, 1024 obs),
reporting accuracy AND speed for the SAME configuration:

  * ATE RMSE (absolute and % of path length) after the final global BA
  * tracked-frame fraction, relocalization attempts
  * landmark track-length statistics (mean / median / max frames per
    landmark, from the observation log)
  * median wall-clock track() ms/frame (host loop over the axon tunnel —
    the on-chip fused-step number is bench_all's vo_track_hd_2k_16k row)

Usage: python tools/vo_quality.py [n_frames] (default 300; rendering the
synthetic HD sequence takes a few CPU-minutes). Reference anchor: the
object-recognition frame loop at samples/object_recognition/main.cxx:
229-280, generalized to SLAM scale.
"""
import collections
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    from compv_tpu.core.config import BAConfig, OrbConfig, RansacConfig
    from compv_tpu.io import datasets
    from compv_tpu.slam import camera, vo

    h, w = 720, 1280
    t0 = time.time()
    frames, gt_pos, gt_pose, (fx, fy, cx, cy) = \
        datasets.render_trajectory_sequence(
            n_frames=n, h=h, w=w, n_landmarks=12000, seed=0,
            fx=700.0, speed=0.055,
            turn=(n // 3, n // 3 + 40, 1.2),
            occlusion=(3 * n // 4, 3 * n // 4 + 12, 0.35))
    print(f"rendered {n} frames {w}x{h} in {time.time() - t0:.0f}s")

    cfg = vo.VOConfig(
        max_landmarks=16384, max_obs_per_frame=1024, min_track_inliers=12,
        min_tri_angle=0.008,
        ransac=RansacConfig(max_iters=512, batch=128, threshold=9.0),
        essential=RansacConfig(max_iters=1024, batch=256, threshold=2e-5),
        ba=BAConfig(max_iters=6),
        orb=OrbConfig(levels=8, max_features=2000))
    odo = vo.VisualOdometry(camera.Intrinsics.make(fx, fy, cx, cy), cfg)
    assert odo.initialize(frames[0], frames[2])

    fails, reloc_attempts, reloc_ok = [], 0, 0
    times = []
    for f in range(3, n):
        t1 = time.time()
        ok = odo.track(frames[f])
        times.append(time.time() - t1)
        if not ok:
            fails.append(f)
            reloc_attempts += 1
            if odo.relocalize(frames[f]):
                reloc_ok += 1
        if f % 8 == 0:
            odo.refine()
        if f % 50 == 0:
            print(f"  frame {f}: tracked {f - 2 - len(fails)}/{f - 2}, "
                  f"median track {np.median(times) * 1e3:.1f} ms")

    # final global BA
    odo.config = dataclasses.replace(odo.config, ba=BAConfig(max_iters=40))
    odo.refine(window=len(odo.trajectory))

    est = odo.positions()
    gt_used = [gt_pos[0], gt_pos[2]] + [
        gt_pos[f] for f in range(3, n) if f not in set(fails)]
    gt_used = np.stack(gt_used)[: len(est)]
    path = np.linalg.norm(np.diff(gt_pos, axis=0), axis=1).sum()
    ate = vo.ate_rmse(est, gt_used)

    lm_frames = collections.defaultdict(set)
    for fidx, lm, _ in odo._obs:
        lm_frames[lm].add(fidx)
    tl = np.array([len(v) for v in lm_frames.values()], np.float64)

    tracked = (n - 3) - len(fails)
    print("\n=== VO quality @ HD / 8-level 2000-feature ORB / 16k map ===")
    print(f"frames: {n}  tracked: {tracked}/{n - 3} "
          f"({100.0 * tracked / (n - 3):.1f}%)  "
          f"reloc attempts/ok: {reloc_attempts}/{reloc_ok}")
    print(f"ATE RMSE: {ate:.4f} (path {path:.2f} -> "
          f"{100.0 * ate / path:.2f}% of path)")
    print(f"track length (frames/landmark): mean {tl.mean():.1f}  "
          f"median {np.median(tl):.0f}  max {tl.max():.0f}  "
          f"landmarks observed: {len(tl)}")
    print(f"track() wall ms/frame: median {np.median(times) * 1e3:.1f}  "
          f"p90 {np.percentile(times, 90) * 1e3:.1f} "
          f"(host loop incl. tunnel; on-chip fused step: see bench_all "
          f"vo_track_hd_2k_16k)")


if __name__ == "__main__":
    main()
