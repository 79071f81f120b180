"""End-to-end VO test on a synthetic 3D scene with distinctive random
descriptors (correspondence-level API) — verifies init -> track -> trajectory
ATE without needing dataset files."""
import numpy as np
import jax.numpy as jnp
import pytest

from compv_tpu.core.config import OrbConfig
from compv_tpu.slam import camera, vo

# round-3: VOConfig defaults moved to reference scale (16k landmarks,
# 8-level/2000-feature ORB); tests keep the old small shapes for CPU speed
_SMALL = dict(max_landmarks=4096, max_obs_per_frame=512,
              orb=OrbConfig(levels=4, max_features=512))


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(0)
    n_pts = 600
    pts = rng.uniform([-4, -3, 4], [4, 3, 14], (n_pts, 3)).astype(np.float32)
    desc = rng.integers(0, 2 ** 32, (n_pts, 8), dtype=np.uint64).astype(np.uint32)
    intr = camera.Intrinsics.make(500.0, 500.0, 320.0, 240.0)
    # smooth forward + sideways trajectory, 8 frames
    frames = []
    gt = []
    for f in range(8):
        wt = np.array([0.0, 0.012 * f, 0.0,
                       -0.25 * f, 0.01 * f, 0.05 * f], np.float32)
        uv = np.array(camera.project_batch(jnp.asarray(wt), intr,
                                           jnp.asarray(pts)))
        uv += rng.normal(0, 0.3, uv.shape)
        depth = np.array([camera.point_depth(jnp.asarray(wt), jnp.asarray(p))
                          for p in pts[:1]])  # cheap check only first
        vis = ((uv[:, 0] > 0) & (uv[:, 0] < 640)
               & (uv[:, 1] > 0) & (uv[:, 1] < 480))
        frames.append((uv[vis].astype(np.float32), desc[vis]))
        gt.append(wt)
    return intr, frames, np.stack(gt)


class TestVO:
    def test_full_trajectory(self, scene):
        intr, frames, gt = scene
        odo = vo.VisualOdometry(intr, vo.VOConfig(**_SMALL))
        # init from matched correspondences between frames 0 and 1: use the
        # shared descriptor identity to build the pairs (simulating matching)
        uv0, d0 = frames[0]
        uv1, d1 = frames[1]
        # exact-descriptor intersection
        key0 = d0[:, 0].astype(np.int64)
        key1 = d1[:, 0].astype(np.int64)
        common, i0, i1 = np.intersect1d(key0, key1, return_indices=True)
        ok = odo.initialize_pair(uv0[i0], uv1[i1], d1[i1])
        assert ok
        for f in range(2, 8):
            uv, d = frames[f]
            assert odo.track_correspondences(uv, d), f"frame {f} lost"
        est = odo.positions()
        # ground-truth camera centers
        gt_pos = []
        for wt in gt:
            inv = np.array(camera.se3_inverse(jnp.asarray(wt)))
            gt_pos.append(inv[3:])
        gt_pos = np.stack(gt_pos)
        err = vo.ate_rmse(est, gt_pos)
        # monocular scale-aligned ATE on a 2m trajectory: expect cm-level
        assert err < 0.05, f"ATE {err}"

    def test_ate_alignment_invariance(self):
        rng = np.random.default_rng(1)
        gt = rng.normal(size=(20, 3))
        q = np.linalg.qr(rng.normal(size=(3, 3)))[0]
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1  # proper rotation
        est = 2.5 * gt @ q + 7.0
        assert vo.ate_rmse(est, gt) < 1e-5

    def test_refine_reduces_cost(self, scene):
        """Windowed BA refine() must not worsen the trajectory and must
        leave finite state."""
        intr, frames, gt = scene
        odo = vo.VisualOdometry(intr, vo.VOConfig(**_SMALL))
        uv0, d0 = frames[0]
        uv1, d1 = frames[1]
        key0 = d0[:, 0].astype(np.int64)
        key1 = d1[:, 0].astype(np.int64)
        _, i0, i1 = np.intersect1d(key0, key1, return_indices=True)
        assert odo.initialize_pair(uv0[i0], uv1[i1], d1[i1])
        for f in range(2, 6):
            uv, d = frames[f]
            assert odo.track_correspondences(uv, d)
        est_before = odo.positions()
        assert odo.refine(window=4)
        est_after = odo.positions()
        assert np.isfinite(est_after).all()
        gt_pos = []
        for wt in gt[:len(est_after)]:
            inv = np.array(camera.se3_inverse(jnp.asarray(wt)))
            gt_pos.append(inv[3:])
        gt_pos = np.stack(gt_pos)
        err_b = vo.ate_rmse(est_before, gt_pos)
        err_a = vo.ate_rmse(est_after, gt_pos)
        assert err_a <= err_b * 1.5, (err_b, err_a)  # no catastrophic change

    def test_posegraph_corrects_loop(self, scene):
        """A loop-closure edge pulls accumulated drift back: perturb the
        trajectory tail, add a loop edge equal to the TRUE relative pose,
        optimize, drift shrinks."""
        intr, frames, gt = scene
        odo = vo.VisualOdometry(intr, vo.VOConfig(**_SMALL))
        gt_poses = [np.asarray(w, np.float32) for w in gt]
        odo.trajectory = [p.copy() for p in gt_poses]
        odo.trajectory[-1][3:] += np.asarray([0.15, -0.1, 0.08])  # drift
        from compv_tpu.slam.camera import se3_relative
        z = np.asarray(se3_relative(jnp.asarray(gt_poses[0]),
                                    jnp.asarray(gt_poses[-1])))
        drift_before = np.linalg.norm(odo.trajectory[-1] - gt_poses[-1])
        assert odo.optimize_posegraph(
            loop_edges=[(0, len(gt_poses) - 1, z, 10.0)])
        drift_after = np.linalg.norm(odo.trajectory[-1] - gt_poses[-1])
        assert drift_after < drift_before * 0.5, (drift_before, drift_after)

    def test_detect_loop_finds_revisit(self):
        rng = np.random.default_rng(5)
        intr = camera.Intrinsics.make(100.0, 100.0, 64.0, 48.0)
        odo = vo.VisualOdometry(intr, vo.VOConfig(**_SMALL))
        bits_a = jnp.asarray(rng.integers(0, 2 ** 32, (512, 8),
                                          dtype=np.uint64).astype(np.uint32))
        bits_b = jnp.asarray(rng.integers(0, 2 ** 32, (512, 8),
                                          dtype=np.uint64).astype(np.uint32))
        uv = np.zeros((512, 2), np.float32)
        lm = np.full((512,), -1, np.int32)
        odo._remember_keyframe(0, bits_a, uv, lm, 512, np.zeros(6, np.float32))
        odo._remember_keyframe(5, bits_b, uv, lm, 512, np.zeros(6, np.float32))
        # current keyframe re-observes frame 0's descriptors
        odo._last_kf = (np.zeros(6, np.float32), np.zeros((512, 2)),
                        bits_a, 512, 30)
        hit = odo.detect_loop(min_matches=100, exclude_recent=10)
        assert hit is not None and hit[0] == 0


class TestTrackWindow:
    def test_window_tracks_like_sequential(self):
        """lax.scan windowed tracker: same scene tracks successfully with
        comparable ATE to the per-frame host loop."""
        from compv_tpu.io import datasets
        from compv_tpu.core.config import RansacConfig, OrbConfig, BAConfig
        frames, gt, _, (fx, fy, cx, cy) = \
            datasets.render_trajectory_sequence(
                n_frames=7, h=160, w=224, seed=0, turn=(0, 0, 0.0))
        intr = camera.Intrinsics.make(fx, fy, cx, cy)
        cfg = vo.VOConfig(
            max_landmarks=1024, max_obs_per_frame=256,
            min_track_inliers=10, min_tri_angle=0.008,
            ransac=RansacConfig(max_iters=256, batch=64, threshold=9.0),
            essential=RansacConfig(max_iters=512, batch=128, threshold=2e-5),
            ba=BAConfig(max_iters=4),
            orb=OrbConfig(levels=2, max_features=256))
        odo = vo.VisualOdometry(intr, cfg)
        assert odo.initialize(frames[0], frames[1])
        oks = odo.track_batch(np.stack(frames[2:]))
        assert oks.sum() >= 4, oks
        est = odo.positions()
        n = len(est)
        err = vo.ate_rmse(est, gt[:n])
        assert np.isfinite(err) and err < 0.25, err

    def test_window_refine_improves_or_holds(self):
        """Windowed BA over the scan-logged observations must not blow up
        the trajectory and should keep/improve ATE."""
        from compv_tpu.io import datasets
        from compv_tpu.core.config import RansacConfig, OrbConfig, BAConfig
        frames, gt, _, (fx, fy, cx, cy) = \
            datasets.render_trajectory_sequence(
                n_frames=7, h=160, w=224, seed=0, turn=(0, 0, 0.0))
        intr = camera.Intrinsics.make(fx, fy, cx, cy)
        cfg = vo.VOConfig(
            max_landmarks=1024, max_obs_per_frame=256,
            min_track_inliers=10, min_tri_angle=0.008,
            ransac=RansacConfig(max_iters=256, batch=64, threshold=9.0),
            essential=RansacConfig(max_iters=512, batch=128, threshold=2e-5),
            ba=BAConfig(max_iters=4),
            orb=OrbConfig(levels=2, max_features=256))
        odo = vo.VisualOdometry(intr, cfg)
        assert odo.initialize(frames[0], frames[1])
        oks = odo.track_batch(np.stack(frames[2:]), refine=True)
        assert oks.sum() >= 4
        est = odo.positions()
        err = vo.ate_rmse(est, gt[:len(est)])
        assert np.isfinite(err) and err < 0.25, err
