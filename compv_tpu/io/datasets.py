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


def load_kitti_calib(seq_dir: str, cam: int = 0
                     ) -> Tuple[float, float, float, float]:
    """(fx, fy, cx, cy) from the sequence's calib.txt: the `P<cam>:` row
    holds the 3x4 projection matrix row-major (fx at [0,0], cx at [0,2],
    fy at [1,1], cy at [1,2])."""
    with open(os.path.join(seq_dir, "calib.txt")) as f:
        for line in f:
            if line.startswith(f"P{cam}:"):
                v = [float(x) for x in line.split()[1:]]
                return v[0], v[5], v[2], v[6]
    raise ValueError(f"no P{cam} row in {seq_dir}/calib.txt")


def _yaw_rotation(theta: float) -> np.ndarray:
    """World->cam rotation for a camera yawed by theta about world Y
    (x right, y down, z forward)."""
    c, s = np.cos(theta), np.sin(theta)
    return np.asarray([[c, 0.0, -s], [0.0, 1.0, 0.0], [s, 0.0, c]])


def render_trajectory_sequence(
        n_frames: int = 120, h: int = 160, w: int = 224,
        n_landmarks: int = 3000, seed: int = 0, fx: float = 180.0,
        speed: float = 0.055, turn: Tuple[int, int, float] = (45, 75, 1.2),
        occlusion: Tuple[int, int, float] = (0, 0, 0.0),
        exposure_jitter: float = 0.06,
        closed_loop: bool = False):
    """Render a LONG synthetic monocular sequence at realistic difficulty
    (VERDICT round-1 item 1): full SE(3) camera motion with a
    rotation-heavy segment, z-ordered patch splatting (real occlusion
    between landmarks), optional foreground occluder, per-frame exposure
    jitter, and landmark churn (the camera traverses a corridor of
    texture; old points leave the FOV for good). Stands in for TUM/KITTI,
    which ship no data in this image (loaders above run unchanged when
    data exists).

    turn = (f0, f1, radians): the camera yaws by `radians` between those
    frames while advancing slowly (rotation-heavy stretch).
    occlusion = (f0, f1, fraction): a textureless foreground panel covers
    `fraction` of the view in [f0, f1).
    closed_loop=True bends the trajectory around a full circle back to
    the start (for loop-closure tests).

    Returns (frames [n](h,w) u8, gt_positions (n,3), gt_poses (n,6),
    (fx, fy, cx, cy)).
    """
    rng = np.random.default_rng(seed)
    cx, cy = w / 2, h / 2
    # heading profile -> positions
    dtheta = np.zeros(n_frames)
    f0, f1, rad = turn
    if f1 > f0:
        dtheta[f0:f1] = rad / (f1 - f0)
    if closed_loop:
        dtheta[:] = 2 * np.pi / n_frames
    theta = np.cumsum(dtheta)
    spd = np.full(n_frames, speed)
    if f1 > f0 and not closed_loop:
        spd[f0:f1] = speed * 0.35          # slow down through the turn
    heading = np.stack([np.sin(theta), np.zeros(n_frames),
                        np.cos(theta)], 1)
    centers = np.cumsum(spd[:, None] * heading, axis=0)
    centers -= centers[0]
    # ---- world: a textured BOX ROOM around the whole trajectory -------
    # Scene geometry matters for descriptor realism: isolated floating
    # markers decorrelate BRIEF (most samples hit background with
    # different parallax than the keypoint). Coherent SURFACES — every
    # neighborhood moves together — are what real images look like, so
    # the room is 6 textured planes rendered by per-pixel ray casting.
    lo = centers.min(0) - np.asarray([3.0, 1.6, 3.0])
    hi = centers.max(0) + np.asarray([3.0, 1.6, 3.0])
    ts = 512
    scale_px = 48.0                        # texture pixels per world unit

    def make_texture():
        # multi-scale (1/f-like) blob texture: the coarse layer gives every
        # 31 px window a definite intensity centroid (stable ORB moment
        # orientation — single-scale texture made atan2(m01,m10) noise-
        # dominated, p90 orientation error 75 deg), the fine layer gives
        # FAST corners and BRIEF bits
        def layer(cell, amp):
            c = rng.integers(0, 2, (ts // cell + 1, ts // cell + 1))
            return np.kron(c, np.ones((cell, cell)))[:ts, :ts] * amp
        t = 40 + layer(3, 110) + layer(24, 70)
        t += rng.normal(0, 3, (ts, ts))
        return np.clip(t, 0, 255)

    # planes: (axis, value, texture); axis 0=x walls, 1=y floor/ceiling,
    # 2=z walls
    planes = [(0, lo[0]), (0, hi[0]), (1, lo[1]), (1, hi[1]),
              (2, lo[2]), (2, hi[2])]
    textures = [make_texture() for _ in planes]
    ys_g, xs_g = np.mgrid[0:h, 0:w]
    d_cam = np.stack([(xs_g - cx) / fx, (ys_g - cy) / fx,
                      np.ones((h, w))], -1)       # (h, w, 3)
    frames, gt_pos, gt_pose = [], [], []
    of0, of1, ofrac = occlusion
    for f in range(n_frames):
        rot = _yaw_rotation(theta[f])
        c = centers[f]
        t = -rot @ c
        gt_pos.append(c)
        # minimal so3 log for yaw-only rotation: omega = (0, -theta, 0)
        # with our [[c,0,-s],[0,1,0],[s,0,c]] convention
        gt_pose.append(np.asarray([0.0, -theta[f], 0.0, *t], np.float32))
        d_w = d_cam @ rot                  # R^T applied to each ray
        best_t = np.full((h, w), np.inf)
        img_f = np.full((h, w), 96.0)
        for (axis, val), tex in zip(planes, textures):
            da = d_w[:, :, axis]
            with np.errstate(divide="ignore", invalid="ignore"):
                tt = np.where(np.abs(da) > 1e-9, (val - c[axis]) / da, -1.0)
            hitp = c[None, None, :] + tt[:, :, None] * d_w
            oax = [a for a in range(3) if a != axis]
            inb = ((tt > 0.05)
                   & (hitp[:, :, oax[0]] >= lo[oax[0]] - 1e-6)
                   & (hitp[:, :, oax[0]] <= hi[oax[0]] + 1e-6)
                   & (hitp[:, :, oax[1]] >= lo[oax[1]] - 1e-6)
                   & (hitp[:, :, oax[1]] <= hi[oax[1]] + 1e-6)
                   & (tt < best_t))
            u = (hitp[:, :, oax[0]] - lo[oax[0]]) * scale_px
            v = (hitp[:, :, oax[1]] - lo[oax[1]]) * scale_px
            iu = np.clip(u, 0, ts - 2)
            iv = np.clip(v, 0, ts - 2)
            u0 = iu.astype(int)
            v0 = iv.astype(int)
            au = iu - u0
            av = iv - v0
            samp = ((1 - au) * (1 - av) * tex[v0, u0]
                    + au * (1 - av) * tex[v0, u0 + 1]
                    + (1 - au) * av * tex[v0 + 1, u0]
                    + au * av * tex[v0 + 1, u0 + 1])
            img_f = np.where(inb, samp, img_f)
            best_t = np.where(inb, tt, best_t)
        gain = 1.0 + exposure_jitter * np.sin(0.7 * f)
        img = np.clip(img_f * gain + rng.normal(0, 1.5, (h, w)),
                      0, 255).astype(np.uint8)
        if of0 <= f < of1 and ofrac > 0:
            ow = int(w * ofrac)
            x0 = (w - ow) // 2
            img[:, x0:x0 + ow] = 96   # textureless panel
        frames.append(img)
    return (frames, np.asarray(gt_pos), np.stack(gt_pose),
            (fx, fx, cx, cy))


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
