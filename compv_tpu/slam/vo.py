"""Monocular visual odometry: two-view initialization, PnP tracking,
landmark triangulation, windowed BA (BASELINE config 4).

Beyond-reference subsystem assembled from the framework's parts:
  frontend  — ORB detect+describe (features/orb.py) or injected
              correspondences (descriptor-level API, for datasets/tests)
  matching  — hamming popcount-GEMM vs the map's descriptors
  geometry  — essential init (geometry/essential.py), PnP tracking
              (slam/pnp.py), linear triangulation (slam/camera.py)
  backend   — windowed Schur-BA (slam/ba.py)

The map is a fixed-capacity landmark table (positions + 256-bit descriptors
+ validity) so every device step is static-shaped; the host loop only
schedules which jitted step runs next (initialize / track / refine).
"""
from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import BAConfig, OrbConfig, RansacConfig
from ..core.types import Descriptors
from ..features.orb import orb_detect_describe
from ..geometry import essential
from ..matchers import bruteforce
from . import ba, pnp
from .camera import Intrinsics, se3_inverse, triangulate_batch


@dataclasses.dataclass(frozen=True)
class VOConfig:
    max_landmarks: int = 4096
    max_obs_per_frame: int = 512
    window: int = 5                     # BA window (keyframes)
    match_ratio: float = 0.8
    min_track_inliers: int = 12
    ransac: RansacConfig = RansacConfig(max_iters=1024, batch=128,
                                        threshold=9.0)
    essential: RansacConfig = RansacConfig(max_iters=2048, batch=256,
                                           threshold=2e-5)
    ba: BAConfig = BAConfig(max_iters=8)
    orb: OrbConfig = OrbConfig(levels=4, max_features=512)


class VOMap(NamedTuple):
    points: jax.Array      # (L, 3)
    desc: jax.Array        # (L, 8) uint32
    valid: jax.Array       # (L,) bool
    count: jax.Array       # () int32


class VisualOdometry:
    """Host-side orchestrator over jitted kernels. Not itself jittable (the
    map grows and keyframe scheduling is data-dependent); every numeric step
    inside is."""

    def __init__(self, intr: Intrinsics, config: VOConfig = VOConfig(),
                 seed: int = 0):
        self.intr = intr
        self.config = config
        self.key = jax.random.PRNGKey(seed)
        self.trajectory: List[np.ndarray] = []     # world->cam poses (6,)
        self.map: Optional[VOMap] = None
        self._initialized = False

    # ------------------------------------------------------------- helpers
    def _split(self):
        self.key, k = jax.random.split(self.key)
        return k

    def _empty_map(self) -> VOMap:
        L = self.config.max_landmarks
        return VOMap(points=jnp.zeros((L, 3), jnp.float32),
                     desc=jnp.zeros((L, 8), jnp.uint32),
                     valid=jnp.zeros((L,), bool),
                     count=jnp.asarray(0, jnp.int32))

    def _add_landmarks(self, pts3d: np.ndarray, desc: np.ndarray):
        """Host-side map insertion (append into the fixed-capacity table)."""
        m = self.map if self.map is not None else self._empty_map()
        count = int(m.count)
        space = self.config.max_landmarks - count
        n = min(pts3d.shape[0], space)
        if n <= 0:
            return
        points = np.array(m.points)
        descs = np.array(m.desc)
        valid = np.array(m.valid)
        points[count:count + n] = pts3d[:n]
        descs[count:count + n] = desc[:n]
        valid[count:count + n] = True
        self.map = VOMap(points=jnp.asarray(points), desc=jnp.asarray(descs),
                         valid=jnp.asarray(valid),
                         count=jnp.asarray(count + n, jnp.int32))

    def _pad_rows(self, arr: np.ndarray, cap: int) -> Tuple[np.ndarray,
                                                            np.ndarray]:
        """(N, d) -> ((cap, d), (cap,) bool valid). Truncates N > cap.
        Fixed capacities keep every jitted step single-compile across frames
        (varying N would recompile per frame)."""
        n = min(arr.shape[0], cap)
        out = np.zeros((cap,) + arr.shape[1:], arr.dtype)
        out[:n] = arr[:n]
        valid = np.zeros((cap,), bool)
        valid[:n] = True
        return out, valid

    # ----------------------------------------------- correspondence-level
    def initialize_pair(self, uv1: np.ndarray, uv2: np.ndarray,
                        desc2: np.ndarray) -> bool:
        """Two-view init from matched pixel correspondences (N, 2) + the
        second view's descriptors (N, 8). Returns success."""
        cap = self.config.max_obs_per_frame
        uv1, vmask = self._pad_rows(np.asarray(uv1, np.float32), cap)
        uv2, _ = self._pad_rows(np.asarray(uv2, np.float32), cap)
        desc2, _ = self._pad_rows(np.asarray(desc2), cap)
        valid = jnp.asarray(vmask)
        res = essential.find_essential(
            self._split(), jnp.asarray(uv1),
            jnp.asarray(uv2), self.intr, valid_mask=valid,
            config=self.config.essential)
        if int(res.num_inliers) < 16:
            return False
        x1 = essential._normalize_pixels(jnp.asarray(uv1), self.intr)
        x2 = essential._normalize_pixels(jnp.asarray(uv2), self.intr)
        r, t = essential.decompose_essential(res.e, x1, x2,
                                             res.inlier_mask & valid)
        from .camera import so3_log
        wt2 = jnp.concatenate([so3_log(r), t])     # unit-scale translation
        wt1 = jnp.zeros(6)
        tri = triangulate_batch(wt1, wt2, self.intr,
                                jnp.asarray(uv1), jnp.asarray(uv2))
        mask = np.array(res.inlier_mask) & vmask
        pts = np.array(tri)
        good = mask & (pts[:, 2] > 0.05) & (pts[:, 2] < 1e3)
        if good.sum() < 16:
            return False
        # normalize scale: median depth -> 1 (monocular gauge)
        scale = np.median(pts[good, 2])
        pts = pts / scale
        wt2 = np.array(wt2)
        wt2[3:] = wt2[3:] / scale
        self.trajectory = [np.zeros(6, np.float32), wt2.astype(np.float32)]
        self.map = self._empty_map()
        self._add_landmarks(pts[good], np.asarray(desc2)[good])
        self._initialized = True
        return True

    def track_correspondences(self, uv: np.ndarray, desc: np.ndarray) -> bool:
        """Track one frame given its keypoint pixels (N, 2) + descriptors
        (N, 8): match vs the map, PnP, append pose. Returns success."""
        assert self._initialized
        cap = self.config.max_obs_per_frame
        n = min(desc.shape[0], cap)
        desc_p, _ = self._pad_rows(np.asarray(desc), cap)
        uv_p, _ = self._pad_rows(np.asarray(uv, np.float32), cap)
        q = Descriptors(bits=jnp.asarray(desc_p),
                        count=jnp.asarray(n, jnp.int32))
        tr = Descriptors(bits=self.map.desc, count=self.map.count)
        m = bruteforce.match(q, tr, knn=2)
        good = np.array(bruteforce.lowe_ratio_mask(m, self.config.match_ratio))
        ti = np.array(m.train_idx)[:, 0]
        if good.sum() < self.config.min_track_inliers:
            return False
        # keep static shapes: full padded arrays + validity mask into PnP
        pts3d = np.array(self.map.points)[ti]      # (cap, 3)
        res = pnp.solve_pnp(self._split(), jnp.asarray(pts3d),
                            jnp.asarray(uv_p), self.intr,
                            valid_mask=jnp.asarray(good),
                            config=self.config.ransac)
        if int(res.num_inliers) < self.config.min_track_inliers:
            return False
        self.trajectory.append(np.array(res.pose, np.float32))
        return True

    # ------------------------------------------------------- image-level
    def initialize(self, img1, img2) -> bool:
        p1, d1 = orb_detect_describe(jnp.asarray(img1), self.config.orb)
        p2, d2 = orb_detect_describe(jnp.asarray(img2), self.config.orb)
        m = bruteforce.match(d1, d2, knn=2)
        good = np.array(bruteforce.lowe_ratio_mask(m, self.config.match_ratio))
        n1 = int(p1.count)
        good[n1:] = False
        if good.sum() < 32:
            return False
        ti = np.array(m.train_idx)[:, 0]
        uv1 = np.array(p1.xy)[good]
        uv2 = np.array(p2.xy)[ti[good]]
        desc2 = np.array(d2.bits)[ti[good]]
        return self.initialize_pair(uv1, uv2, desc2)

    def track(self, img) -> bool:
        p, d = orb_detect_describe(jnp.asarray(img), self.config.orb)
        n = int(p.count)
        return self.track_correspondences(np.array(p.xy)[:n],
                                          np.array(d.bits)[:n])

    # ------------------------------------------------------------ metrics
    def positions(self) -> np.ndarray:
        """(F, 3) camera centers in world frame: c = -Rᵀ t."""
        out = []
        for wt in self.trajectory:
            inv = np.array(se3_inverse(jnp.asarray(wt)))
            out.append(inv[3:])
        return np.stack(out)


def ate_rmse(est_positions: np.ndarray, gt_positions: np.ndarray) -> float:
    """Absolute trajectory error after similarity (Umeyama) alignment — the
    BASELINE.json trajectory metric for TUM/KITTI."""
    est = est_positions - est_positions.mean(0)
    gt = gt_positions - gt_positions.mean(0)
    # scale + rotation via Umeyama
    cov = gt.T @ est / est.shape[0]
    u, s, vt = np.linalg.svd(cov)
    d = np.sign(np.linalg.det(u @ vt))
    D = np.diag([1.0, 1.0, d])
    r = u @ D @ vt
    var_est = (est ** 2).sum() / est.shape[0]
    scale = np.trace(np.diag(s) @ D) / max(var_est, 1e-12)
    aligned = scale * est @ r.T
    return float(np.sqrt(((aligned - gt) ** 2).sum(axis=1).mean()))
