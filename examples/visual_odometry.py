"""Monocular visual odometry demo with trajectory rendering + checkpointing.

Runs the full image-level VO pipeline (ORB frontend -> map matching -> PnP,
slam/vo.py) over either a TUM-format sequence directory or a synthetic
landmark scene, reports scale-aligned ATE RMSE, renders a top-down
trajectory image, and snapshots resumable state.

Usage:
  python examples/visual_odometry.py                       # synthetic
  python examples/visual_odometry.py <tum_seq_dir> [n]     # TUM rgb sequence
  COMPV_TPU_LIVE=1 python examples/visual_odometry.py ...  # browser live view
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from compv_tpu.io import checkpoint, datasets, image as image_io
from compv_tpu.slam import camera, vo
from compv_tpu import viz


def run_synthetic(n_frames=10, windowed=True):
    from compv_tpu.core.config import OrbConfig
    frames, gt, (fx, fy, cx, cy) = datasets.synthetic_sequence(
        n_frames=n_frames, n_landmarks=500)
    intr = camera.Intrinsics.make(fx, fy, cx, cy)
    # small-scene config: VOConfig's defaults are reference scale (16k
    # landmarks, 8-level/2000-feature ORB) for the real-TPU bench; the
    # 320x240 synthetic demo (and the CPU box it is smoke-run on) wants
    # the tests' small shapes
    odo = vo.VisualOdometry(intr, vo.VOConfig(
        max_landmarks=4096, max_obs_per_frame=512,
        orb=OrbConfig(levels=4, max_features=512), min_track_inliers=10))
    ok = odo.initialize(frames[0], frames[1])
    print("init:", ok)
    if windowed:
        # whole window tracked + BA-refined in ONE device program
        oks = odo.track_batch(np.stack(frames[2:]), refine=True)
        print(f"windowed track+BA: {oks.sum()}/{len(oks)} frames tracked")
    else:
        for f in range(2, len(frames)):
            tracked = odo.track(frames[f])
            refined = tracked and f % 3 == 0 and odo.refine()
            print(f"frame {f}: tracked={tracked} refined={bool(refined)}")
    est = odo.positions()
    n = min(len(est), len(gt))
    err = vo.ate_rmse(est[:n], gt[:n])
    print(f"frames tracked: {len(est)}/{len(frames)}  ATE RMSE "
          f"(scale-aligned): {err:.4f} m")
    canvas = viz.draw_trajectory(est, gt=gt[:n])
    image_io.imwrite("trajectory.png", canvas)
    checkpoint.save_vo("vo_state.npz", odo)
    print("wrote trajectory.png, vo_state.npz")
    return err


def _maybe_viewer():
    """Browser live view (viz/live.py MJPEG window) when COMPV_TPU_LIVE=1 —
    the reference sample's windowed rendering loop analogue
    (samples/object_recognition/main.cxx drawImage/drawMatches)."""
    if os.environ.get("COMPV_TPU_LIVE"):
        return viz.LiveViewer(backend="mjpeg")
    return None



def _track_sequence(odo, imgs, viewer=None, refine_every=8):
    """Shared tracking loop for the dataset drivers: init on the first two
    frames, track-or-relocalize each later frame, windowed BA every
    `refine_every`, then one global BA. Returns tracked frame indices."""
    import dataclasses
    from compv_tpu.core.config import BAConfig
    ok = odo.initialize(imgs[0], imgs[1])
    print("init:", ok)
    tracked_frames = [0, 1]
    for f in range(2, len(imgs)):
        if odo.track(imgs[f]) or odo.relocalize(imgs[f]):
            tracked_frames.append(f)
        if f % refine_every == 0:
            odo.refine()          # windowed bundle adjustment
        if viewer is not None:
            viewer.show(imgs[f], trajectory=np.asarray(odo.positions()),
                        text=f"frame {f}")
    # final global bundle adjustment over the full trajectory
    odo.config = dataclasses.replace(odo.config, ba=BAConfig(max_iters=40))
    odo.refine(window=len(odo.trajectory))
    return tracked_frames


def run_tum(seq_dir, n_frames=50, config=None):
    ts, paths = datasets.load_tum_rgb_list(seq_dir)
    gt_ts, gt_pos = datasets.load_tum_trajectory(
        os.path.join(seq_dir, "groundtruth.txt"))
    pairs = datasets.associate(ts[:n_frames], gt_ts)
    # per-sequence intrinsics from calib.txt ('fx fy cx cy') when present,
    # else the TUM fr1 defaults
    calib_path = os.path.join(seq_dir, "calib.txt")
    if os.path.exists(calib_path):
        with open(calib_path) as f:
            fx, fy, cx, cy = [float(v) for v in f.read().split()[:4]]
    else:
        fx, fy, cx, cy = 517.3, 516.5, 318.6, 255.3   # TUM fr1
    intr = camera.Intrinsics.make(fx, fy, cx, cy)
    odo = vo.VisualOdometry(intr, config) if config else \
        vo.VisualOdometry(intr)
    imgs = [image_io.imread(paths[i], gray=True) for i, _ in pairs]
    tracked_frames = _track_sequence(odo, imgs, _maybe_viewer())
    est = odo.positions()
    # align gt to the frames that actually tracked (a failed frame adds no
    # pose, so positional indexing would shift every later comparison)
    gt_rows = [j for _, j in pairs]
    gt = gt_pos[[gt_rows[f] for f in tracked_frames]][:len(est)]
    err = vo.ate_rmse(est, gt)
    print(f"TUM ATE RMSE (scale-aligned, {len(est)} frames): {err:.4f} m")
    image_io.imwrite("trajectory.png", viz.draw_trajectory(est, gt=gt))
    return err


def run_kitti(seq_dir, n_frames=50, config=None, poses_path=None):
    """KITTI odometry sequence: image_0/ grayscale PNGs + calib.txt;
    ground-truth poses from `poses_path` (or <seq_dir>/poses.txt) when
    present — without them the run reports tracked fraction only."""
    paths = datasets.kitti_frame_paths(seq_dir)[:n_frames]
    fx, fy, cx, cy = datasets.load_kitti_calib(seq_dir)
    intr = camera.Intrinsics.make(fx, fy, cx, cy)
    odo = vo.VisualOdometry(intr, config) if config else \
        vo.VisualOdometry(intr)
    imgs = [image_io.imread(p, gray=True) for p in paths]
    tracked_frames = _track_sequence(odo, imgs, _maybe_viewer())
    est = odo.positions()
    print(f"tracked {len(tracked_frames)}/{len(imgs)} frames")
    poses_path = poses_path or os.path.join(seq_dir, "poses.txt")
    if os.path.exists(poses_path):
        gt_pos = datasets.load_kitti_poses(poses_path)
        gt = gt_pos[tracked_frames][:len(est)]
        err = vo.ate_rmse(est, gt)
        print(f"KITTI ATE RMSE (scale-aligned, {len(est)} frames): "
              f"{err:.4f} m")
        image_io.imwrite("trajectory.png", viz.draw_trajectory(est, gt=gt))
        return err
    image_io.imwrite("trajectory.png", viz.draw_trajectory(est))
    return None


if __name__ == "__main__":
    if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]):
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 50
        # KITTI sequences have image_0/; TUM sequences have rgb.txt
        if os.path.isdir(os.path.join(sys.argv[1], "image_0")):
            run_kitti(sys.argv[1], n)
        else:
            run_tum(sys.argv[1], n)
    else:
        run_synthetic()
