"""North-star validation: LONG image-level VO at realistic difficulty
(round-1 VERDICT item 1; reference anchor: the full per-frame loop
samples/object_recognition/main.cxx:229-280 generalized to SLAM).

The sequences come from io/datasets.render_trajectory_sequence: a textured
box room rendered by ray casting (coherent surfaces, multi-scale texture),
with a 69-degree rotation-heavy stretch, a 35%-of-view textureless
occluder, per-frame exposure jitter, and landmark churn. The full
image-level pipeline runs per frame: ORB -> guided map matching -> RANSAC
PnP (+retries) -> essential-matrix fallback -> parallax-gated triangulation
-> windowed BA, then one global bundle adjustment.

Accuracy context: at 224x160 / fx=180 with integer-quantized corners the
obs noise floor is ~0.5 px; the post-BA ATE bound reflects that geometry
(higher-resolution runs scale accordingly).
"""
import dataclasses

import numpy as np
import jax.numpy as jnp

from compv_tpu.core.config import BAConfig, OrbConfig, RansacConfig
from compv_tpu.io import datasets
from compv_tpu.slam import camera, vo


def _cfg(**kw):
    base = dict(
        max_landmarks=4096, max_obs_per_frame=384, min_track_inliers=12,
        min_tri_angle=0.008,
        ransac=RansacConfig(max_iters=512, batch=128, threshold=9.0),
        essential=RansacConfig(max_iters=1024, batch=256, threshold=2e-5),
        ba=BAConfig(max_iters=6),
        orb=OrbConfig(levels=3, max_features=384))
    base.update(kw)
    return vo.VOConfig(**base)


def _track_all(odo, frames, refine_every=8):
    fails = []
    for f in range(3, len(frames)):
        if not odo.track(frames[f]):
            fails.append(f)
        if f % refine_every == 0:
            odo.refine()
    return fails


def _ate_pct(odo, gt_pos, n_frames, fails):
    est = odo.positions()
    gt_used = [gt_pos[0], gt_pos[2]] + [
        gt_pos[f] for f in range(3, n_frames) if f not in set(fails)]
    gt_used = np.stack(gt_used)[: len(est)]
    path = np.linalg.norm(np.diff(gt_pos, axis=0), axis=1).sum()
    return 100.0 * vo.ate_rmse(est, gt_used) / path


class TestVOLong:
    def test_120_frames_turn_and_occlusion(self):
        """120 frames with a 69-deg turn and a 35% occluder: tracked
        fraction >= 95% and post-global-BA ATE bounded."""
        n = 120
        frames, gt_pos, gt_pose, (fx, fy, cx, cy) = \
            datasets.render_trajectory_sequence(
                n_frames=n, h=160, w=224, seed=0, turn=(45, 75, 1.2),
                occlusion=(90, 100, 0.35))
        odo = vo.VisualOdometry(camera.Intrinsics.make(fx, fy, cx, cy),
                                _cfg())
        assert odo.initialize(frames[0], frames[2])
        fails = _track_all(odo, frames)
        tracked = (n - 3) - len(fails)
        assert tracked >= 0.95 * (n - 3), (tracked, fails[:20])
        # final global bundle adjustment over the whole trajectory
        odo.config = dataclasses.replace(odo.config,
                                         ba=BAConfig(max_iters=40))
        assert odo.refine(window=len(odo.trajectory))
        ate = _ate_pct(odo, gt_pos, n, fails)
        assert np.isfinite(ate) and ate <= 8.0, ate
        # map grew substantially (landmark churn happened); the exact count
        # varies ~10% with XLA thread partitioning (fp reduction order
        # shifts RANSAC inlier boundaries), so the bound is loose
        assert int(odo.map.count) > 600

    def test_landmark_capacity_exhaustion(self):
        """Tiny map capacity: the max_landmarks exhaustion path is actually
        hit and tracking continues (no crash, no silent divergence)."""
        n = 50
        frames, gt_pos, gt_pose, (fx, fy, cx, cy) = \
            datasets.render_trajectory_sequence(
                n_frames=n, h=160, w=224, seed=3, turn=(0, 0, 0.0))
        odo = vo.VisualOdometry(camera.Intrinsics.make(fx, fy, cx, cy),
                                _cfg(max_landmarks=384))
        assert odo.initialize(frames[0], frames[2])
        fails = _track_all(odo, frames)
        assert int(odo.map.count) == 384          # exhaustion reached
        tracked = (n - 3) - len(fails)
        assert tracked >= 0.6 * (n - 3), (tracked, fails)

    def test_relocalize_after_kidnap(self):
        """Kidnapped-camera recovery: after tracking far from the start,
        a frame from the already-visited start region relocalizes against
        the keyframe HISTORY (not the current keyframe), lands near the
        earlier pose estimate in the same gauge, and tracking resumes."""
        n = 48
        frames, gt_pos, gt_pose, (fx, fy, cx, cy) = \
            datasets.render_trajectory_sequence(
                n_frames=n, h=160, w=224, seed=5, turn=(0, 0, 0.0))
        odo = vo.VisualOdometry(camera.Intrinsics.make(fx, fy, cx, cy),
                                _cfg())
        assert odo.initialize(frames[0], frames[2])
        fails = _track_all(odo, frames)
        assert odo._hist_n >= 2, "needs a keyframe history to retrieve from"
        # the revisited view: frame 4 (tracked near the start of the run)
        revisit = 4
        assert revisit not in fails
        # trajectory index of that frame: [f0, f2, f3, f4, ...] minus fails
        tracked_frames = [0, 2] + [f for f in range(3, n)
                                   if f not in set(fails)]
        old_idx = tracked_frames.index(revisit)
        old_center = odo.positions()[old_idx]
        assert odo.relocalize(frames[revisit], min_matches=20,
                              min_inliers=12), "relocalization failed"
        new_center = odo.positions()[-1]
        # same map gauge -> direct comparison; scene depth is ~1 (median
        # normalized at init), so 0.2 is a tight bound
        err = float(np.linalg.norm(new_center - old_center))
        assert err < 0.2, err
        # tracking resumes from the relocalized keyframe
        assert odo.track(frames[revisit + 1])

    def test_closed_loop_detect_and_close(self):
        """Full circle back to the start: the loop is detected from
        descriptors alone, the loop pose is estimated by PnP against the
        historic keyframe's landmarks, and the pose-graph refinement
        reduces the end-point drift — fully automatic (close_loop())."""
        n = 100
        frames, gt_pos, gt_pose, (fx, fy, cx, cy) = \
            datasets.render_trajectory_sequence(
                n_frames=n, h=160, w=224, seed=2, closed_loop=True)
        odo = vo.VisualOdometry(camera.Intrinsics.make(fx, fy, cx, cy),
                                _cfg())
        assert odo.initialize(frames[0], frames[2])
        fails = _track_all(odo, frames)
        tracked = (n - 3) - len(fails)
        assert tracked >= 0.9 * (n - 3), (tracked, fails[:20])
        # ground truth: start and end coincide (closed circle)
        est = odo.positions()
        # gauge-align scale once for drift measurement
        gt_used = [gt_pos[0], gt_pos[2]] + [
            gt_pos[f] for f in range(3, n) if f not in set(fails)]
        gt_used = np.stack(gt_used)[: len(est)]
        path_est = np.linalg.norm(np.diff(est, axis=0), axis=1).sum()
        drift_before = np.linalg.norm(est[-1] - est[0]) / max(path_est,
                                                             1e-9)
        closed = odo.close_loop(min_matches=30, exclude_recent=30,
                                min_inliers=12)
        assert closed, "loop was not detected/closed"
        est2 = odo.positions()
        drift_after = np.linalg.norm(est2[-1] - est2[0]) / max(path_est,
                                                               1e-9)
        assert drift_after <= drift_before + 1e-6, (drift_before,
                                                    drift_after)
