"""Dataset loaders for trajectory evaluation (BASELINE north star:
TUM fr1 / KITTI 00 ATE RMSE).

The reference ships no dataset tooling (its tests read raw .yuv blobs from a
side repo). These loaders parse the standard public formats from a local
directory; nothing is downloaded.
"""
from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np


def load_tum_trajectory(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """TUM groundtruth.txt: '# comments' then 'ts tx ty tz qx qy qz qw'.
    Returns (timestamps (N,), positions (N, 3))."""
    ts, pos = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            ts.append(float(parts[0]))
            pos.append([float(v) for v in parts[1:4]])
    return np.asarray(ts), np.asarray(pos, np.float64)


def load_tum_rgb_list(seq_dir: str) -> Tuple[np.ndarray, List[str]]:
    """TUM rgb.txt -> (timestamps, absolute frame paths)."""
    ts, paths = [], []
    with open(os.path.join(seq_dir, "rgb.txt")) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            t, rel = line.split()[:2]
            ts.append(float(t))
            paths.append(os.path.join(seq_dir, rel))
    return np.asarray(ts), paths


def associate(ts_a: np.ndarray, ts_b: np.ndarray, max_dt: float = 0.02
              ) -> List[Tuple[int, int]]:
    """Greedy nearest-timestamp association (the TUM associate.py rule)."""
    out = []
    j = 0
    for i, t in enumerate(ts_a):
        while j + 1 < len(ts_b) and abs(ts_b[j + 1] - t) <= abs(ts_b[j] - t):
            j += 1
        if abs(ts_b[j] - t) <= max_dt:
            out.append((i, j))
    return out


def load_kitti_poses(path: str) -> np.ndarray:
    """KITTI odometry poses file: each line 12 floats (3x4 [R|t]).
    Returns (N, 3) camera positions."""
    rows = np.loadtxt(path).reshape(-1, 3, 4)
    return rows[:, :, 3]


def kitti_frame_paths(seq_dir: str, cam: int = 0) -> List[str]:
    d = os.path.join(seq_dir, f"image_{cam}")
    return [os.path.join(d, n) for n in sorted(os.listdir(d))
            if n.endswith(".png")]


def synthetic_sequence(n_frames: int = 10, h: int = 240, w: int = 320,
                       n_landmarks: int = 400, seed: int = 0,
                       fx: float = 260.0):
    """Synthetic textured-landmark sequence with ground truth — the
    dataset-free path for VO tests/benchmarks. Returns
    (frames [n](H,W) u8, gt_positions (n,3), intrinsics tuple)."""
    rng = np.random.default_rng(seed)
    pts = rng.uniform([-4, -3, 6], [4, 3, 16], (n_landmarks, 3))
    cx, cy = w / 2, h / 2
    # unique 11x11 high-contrast random patch per landmark: BRIEF needs
    # distinctive local texture, repetitive markers alias under ratio test
    r = 5
    patches = rng.integers(0, 2, (n_landmarks, 2 * r + 1, 2 * r + 1)) * 200 + 28
    frames, gt = [], []
    base = np.clip(rng.normal(110, 12, (h, w)), 0, 255).astype(np.uint8)
    for f in range(n_frames):
        t = np.asarray([0.06 * f, 0.005 * f, 0.02 * f])
        gt.append(-t)  # camera center for identity rotation: c = -t
        img = base.copy()
        rel = pts - (-t)
        uv = np.stack([fx * rel[:, 0] / rel[:, 2] + cx,
                       fx * rel[:, 1] / rel[:, 2] + cy], 1)
        ok = ((uv[:, 0] > r + 1) & (uv[:, 0] < w - r - 1)
              & (uv[:, 1] > r + 1) & (uv[:, 1] < h - r - 1))
        for k in np.flatnonzero(ok):
            x, y = int(uv[k, 0]), int(uv[k, 1])
            img[y - r:y + r + 1, x - r:x + r + 1] = patches[k]
        frames.append(img)
    return frames, np.asarray(gt), (fx, fx, cx, cy)
