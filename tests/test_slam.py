"""SLAM layer tests: SE3, projection, triangulation, BA, pose graph."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from compv_tpu.slam import ba, camera, posegraph
from compv_tpu.core.config import BAConfig


def _rand_pose(rng, scale_rot=0.3, scale_t=1.0):
    return np.concatenate([rng.normal(0, scale_rot, 3),
                           rng.normal(0, scale_t, 3)]).astype(np.float32)


class TestSE3:
    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(0)
        for _ in range(5):
            w = rng.normal(0, 1.0, 3).astype(np.float32)
            r = camera.so3_exp(jnp.asarray(w))
            w2 = camera.so3_log(r)
            np.testing.assert_allclose(np.asarray(w2), w, atol=1e-4)

    def test_rotation_orthonormal(self):
        w = jnp.asarray([0.1, -0.5, 0.3])
        r = np.asarray(camera.so3_exp(w))
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
        assert abs(np.linalg.det(r) - 1) < 1e-5

    def test_compose_inverse(self):
        rng = np.random.default_rng(1)
        a = jnp.asarray(_rand_pose(rng))
        b = jnp.asarray(_rand_pose(rng))
        ab = camera.se3_compose(a, b)
        back = camera.se3_compose(camera.se3_inverse(a), ab)
        np.testing.assert_allclose(np.asarray(back), np.asarray(b), atol=1e-4)

    def test_identity_projection(self):
        intr = camera.Intrinsics.make(500, 500, 320, 240)
        uv = camera.project(jnp.zeros(6), intr, jnp.asarray([0.0, 0.0, 2.0]))
        np.testing.assert_allclose(np.asarray(uv), [320, 240], atol=1e-5)

    def test_distortion_moves_off_center(self):
        intr0 = camera.Intrinsics.make(500, 500, 320, 240)
        intr1 = camera.Intrinsics.make(500, 500, 320, 240, k1=0.1)
        x = jnp.asarray([0.5, 0.2, 2.0])
        uv0 = camera.project(jnp.zeros(6), intr0, x)
        uv1 = camera.project(jnp.zeros(6), intr1, x)
        assert float(jnp.abs(uv1 - uv0).max()) > 0.5


class TestTriangulation:
    def test_two_view_exact(self):
        intr = camera.Intrinsics.make(500, 500, 320, 240)
        rng = np.random.default_rng(2)
        pts = rng.uniform([-2, -2, 4], [2, 2, 8], (50, 3)).astype(np.float32)
        wt1 = jnp.zeros(6)
        wt2 = jnp.asarray([0.0, 0.05, 0.0, -0.5, 0.0, 0.02], jnp.float32)
        uv1 = camera.project_batch(wt1, intr, jnp.asarray(pts))
        uv2 = camera.project_batch(wt2, intr, jnp.asarray(pts))
        rec = camera.triangulate_batch(wt1, wt2, intr, uv1, uv2)
        np.testing.assert_allclose(np.asarray(rec), pts, atol=5e-2)


def _make_ba_problem(rng, P=4, L=60, noise=1.0, pose_err=0.05, point_err=0.2):
    intr = camera.Intrinsics.make(500, 500, 320, 240)
    pts = rng.uniform([-3, -3, 5], [3, 3, 10], (L, 3)).astype(np.float32)
    poses = np.stack([np.concatenate([rng.normal(0, 0.03, 3),
                                      [p * 0.4, 0, 0]]).astype(np.float32)
                      for p in range(P)])
    obs_pose, obs_point, obs_uv = [], [], []
    for p in range(P):
        uv = np.asarray(camera.project_batch(jnp.asarray(poses[p]), intr,
                                             jnp.asarray(pts)))
        for l in range(L):
            obs_pose.append(p)
            obs_point.append(l)
            obs_uv.append(uv[l] + rng.normal(0, noise, 2))
    O = len(obs_pose)
    poses_init = poses + np.concatenate(
        [np.zeros((1, 6)), rng.normal(0, pose_err, (P - 1, 6))]).astype(np.float32)
    pts_init = (pts + rng.normal(0, point_err, (L, 3))).astype(np.float32)
    prob = ba.BAProblem(
        poses=jnp.asarray(poses_init),
        points=jnp.asarray(pts_init),
        obs_pose=jnp.asarray(obs_pose, jnp.int32),
        obs_point=jnp.asarray(obs_point, jnp.int32),
        obs_uv=jnp.asarray(np.asarray(obs_uv), jnp.float32),
        obs_valid=jnp.ones((O,), bool),
        fixed_poses=jnp.asarray([True] + [False] * (P - 1)),
    )
    return prob, intr, poses, pts


class TestBA:
    def test_cost_decreases(self):
        rng = np.random.default_rng(3)
        prob, intr, gt_poses, gt_pts = _make_ba_problem(rng)
        poses, points, stats = ba.bundle_adjust(prob, intr,
                                                BAConfig(max_iters=15))
        assert float(stats.final_cost) < 0.2 * float(stats.initial_cost)

    def test_recovers_poses(self):
        rng = np.random.default_rng(4)
        prob, intr, gt_poses, gt_pts = _make_ba_problem(rng, noise=0.2)
        poses, points, stats = ba.bundle_adjust(prob, intr,
                                                BAConfig(max_iters=25))
        err = np.abs(np.asarray(poses) - gt_poses)
        init_err = np.abs(np.asarray(prob.poses) - gt_poses)
        assert err[1:].mean() < 0.3 * init_err[1:].mean()

    def test_fixed_pose_unchanged(self):
        rng = np.random.default_rng(5)
        prob, intr, *_ = _make_ba_problem(rng)
        poses, _, _ = ba.bundle_adjust(prob, intr, BAConfig(max_iters=10))
        np.testing.assert_allclose(np.asarray(poses)[0],
                                   np.asarray(prob.poses)[0], atol=1e-6)

    def test_invalid_obs_ignored(self):
        rng = np.random.default_rng(6)
        prob, intr, *_ = _make_ba_problem(rng, noise=0.2)
        # corrupt half the observations but mark them invalid
        uv = np.array(prob.obs_uv)  # writable copy
        n = uv.shape[0]
        uv[: n // 2] += 500.0
        valid = np.ones(n, bool)
        valid[: n // 2] = False
        prob2 = prob._replace(obs_uv=jnp.asarray(uv), obs_valid=jnp.asarray(valid))
        _, _, stats = ba.bundle_adjust(prob2, intr, BAConfig(max_iters=10))
        assert float(stats.final_cost) < float(stats.initial_cost)


class TestPoseGraph:
    def test_loop_closure_corrects_drift(self):
        """Chain of noisy odometry + exact loop closure: optimization must
        reduce the gap at the loop."""
        rng = np.random.default_rng(7)
        N = 8
        gt = np.zeros((N, 6), np.float32)
        gt[:, 3] = np.arange(N)  # straight line along x
        # odometry edges with drifty measurements
        ei, ej, ez, ew = [], [], [], []
        poses_init = [gt[0]]
        for i in range(N - 1):
            z = np.asarray(camera.se3_relative(jnp.asarray(gt[i]),
                                               jnp.asarray(gt[i + 1])))
            z_noisy = z + rng.normal(0, 0.05, 6).astype(np.float32)
            ei.append(i); ej.append(i + 1); ez.append(z_noisy); ew.append(1.0)
            poses_init.append(np.asarray(camera.se3_compose(
                jnp.asarray(poses_init[-1]), jnp.asarray(z_noisy))))
        # loop closure 0 -> N-1 with exact measurement, high weight
        z_loop = np.asarray(camera.se3_relative(jnp.asarray(gt[0]),
                                                jnp.asarray(gt[N - 1])))
        ei.append(0); ej.append(N - 1); ez.append(z_loop); ew.append(10.0)
        g = posegraph.PoseGraph(
            poses=jnp.asarray(np.stack(poses_init)),
            edge_i=jnp.asarray(ei, jnp.int32),
            edge_j=jnp.asarray(ej, jnp.int32),
            edge_z=jnp.asarray(np.stack(ez)),
            edge_w=jnp.asarray(ew, jnp.float32),
            edge_valid=jnp.ones((len(ei),), bool),
            fixed=jnp.asarray([True] + [False] * (N - 1)),
        )
        opt, cost = posegraph.optimize(g, iters=15)
        end_err_before = np.linalg.norm(poses_init[-1][3:] - gt[-1][3:])
        end_err_after = np.linalg.norm(np.asarray(opt)[-1][3:] - gt[-1][3:])
        assert end_err_after < 0.5 * end_err_before

    def test_thousand_poses_sparse_solve(self):
        """KITTI-scale graph: 1,000 poses + loop closures optimize in
        seconds via the sparse block CG (the round-1 dense jacfwd built a
        6000x6000 Hessian here). Converges and removes most of the drift."""
        import time
        rng = np.random.default_rng(11)
        N = 1000
        # ground truth: circle of radius R in the xz plane, yaw follows
        th = np.linspace(0, 2 * np.pi, N, endpoint=False).astype(np.float32)
        R = 50.0
        gt = np.zeros((N, 6), np.float32)
        gt[:, 1] = th                       # rotation about y
        gt[:, 3] = R * np.sin(th)
        gt[:, 5] = R * (1 - np.cos(th))
        gt_j = jnp.asarray(gt)
        z_odo = jax.vmap(camera.se3_relative)(gt_j[:-1], gt_j[1:])
        noise = rng.normal(0, [1e-3] * 3 + [5e-3] * 3,
                           (N - 1, 6)).astype(np.float32)
        z_noisy = jnp.asarray(np.asarray(z_odo) + noise)
        _, poses_init = jax.lax.scan(
            lambda c, z: (camera.se3_compose(c, z), camera.se3_compose(c, z)),
            gt_j[0], z_noisy)
        poses_init = jnp.concatenate([gt_j[:1], poses_init], axis=0)
        # loop closures: every 100th pose re-observes its ground truth
        # relative to pose 0 (place recognition hits), plus closing edge
        lc_j = np.arange(100, N, 100)
        ei = np.concatenate([np.arange(N - 1), np.zeros_like(lc_j)])
        ej = np.concatenate([np.arange(1, N), lc_j])
        z_lc = jax.vmap(lambda j: camera.se3_relative(gt_j[0], gt_j[j])
                        )(jnp.asarray(lc_j))
        ez = jnp.concatenate([z_noisy, z_lc], axis=0)
        ew = np.concatenate([np.ones(N - 1), 10.0 * np.ones(len(lc_j))])
        g = posegraph.PoseGraph(
            poses=poses_init,
            edge_i=jnp.asarray(ei, jnp.int32),
            edge_j=jnp.asarray(ej, jnp.int32),
            edge_z=ez,
            edge_w=jnp.asarray(ew, jnp.float32),
            edge_valid=jnp.ones((len(ei),), bool),
            fixed=jnp.asarray([True] + [False] * (N - 1)))
        c0 = float(posegraph.graph_cost(poses_init, g))
        t0 = time.perf_counter()
        opt, cost = posegraph.optimize(g, iters=25, cg_iters=128)
        opt = np.asarray(jax.block_until_ready(opt))
        dt = time.perf_counter() - t0
        assert float(cost) < 0.1 * c0, (float(cost), c0)
        err_before = np.linalg.norm(
            np.asarray(poses_init)[:, 3:] - gt[:, 3:], axis=1)
        err_after = np.linalg.norm(opt[:, 3:] - gt[:, 3:], axis=1)
        # anchors pin every 100th pose; between anchors residual rotational
        # noise remains (gauge-consistent), so the MEAN is the right metric
        assert err_after.mean() < 0.5 * err_before.mean(), (
            err_after.mean(), err_before.mean())
        assert dt < 120.0, f"sparse solve took {dt:.1f}s"
