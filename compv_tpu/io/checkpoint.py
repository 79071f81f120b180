"""Checkpoint / resume for pipeline state (SLAM map, trajectory, models).

The reference persists only ML models (SVM save/load ml_svm.h:94-96, KNN
index, PCA JSON) — SURVEY §5 flags real computation checkpointing as a gap
the TPU build must fill. Any pytree of arrays checkpoints via npz (atomic
rename); `save_vo`/`load_vo` snapshot a running VisualOdometry so tracking
resumes after preemption — the TPU-fleet requirement the reference never had.
"""
from __future__ import annotations

import os
import tempfile
from typing import Any, Dict

import jax
import numpy as np


def save_pytree(path: str, tree: Any) -> None:
    """Checkpoint an arbitrary pytree of arrays/scalars to one .npz
    (atomic: write temp + rename)."""
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    os.close(fd)
    try:
        with open(tmp, "wb") as f:
            np.savez(f, treedef=np.frombuffer(
                str(treedef).encode(), np.uint8), **arrays)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_pytree(path: str, like: Any) -> Any:
    """Restore into the structure of `like` (treedef source)."""
    with np.load(path) as z:
        leaves_like, treedef = jax.tree.flatten(like)
        leaves = [z[f"leaf_{i}"] for i in range(len(leaves_like))]
    import jax.numpy as jnp
    return jax.tree.unflatten(treedef, [jnp.asarray(x) for x in leaves])


def save_vo(path: str, odo) -> None:
    """Snapshot a slam.vo.VisualOdometry (trajectory + landmark map + PRNG
    key + keyframe state + observation log + loop-closure history) so
    tracking can resume — track()/track_batch() unpack _last_kf on the very
    first resumed frame, so the keyframe MUST be part of the snapshot."""
    state: Dict[str, np.ndarray] = {
        "trajectory": np.stack(odo.trajectory) if odo.trajectory
        else np.zeros((0, 6), np.float32),
        "key": np.asarray(odo.key),
        "initialized": np.asarray(odo._initialized),
    }
    if odo.map is not None:
        state.update(points=np.asarray(odo.map.points),
                     desc=np.asarray(odo.map.desc),
                     valid=np.asarray(odo.map.valid),
                     count=np.asarray(odo.map.count))
    if odo._last_kf is not None:
        kf_pose, kf_uv, kf_desc, kf_n, kf_idx = odo._last_kf
        state.update(kf_pose=np.asarray(kf_pose, np.float32),
                     kf_uv=np.asarray(kf_uv, np.float32),
                     kf_desc=np.asarray(kf_desc),
                     kf_n=np.asarray(int(kf_n), np.int32),
                     kf_idx=np.asarray(int(kf_idx), np.int32))
    if odo._obs:
        state.update(
            obs_frame=np.asarray([f for f, _, _ in odo._obs], np.int32),
            obs_lm=np.asarray([l for _, l, _ in odo._obs], np.int32),
            obs_uv=np.stack([uv for _, _, uv in odo._obs]).astype(np.float32))
    if odo._hist is not None:
        state.update(hist_n=np.asarray(odo._hist_n, np.int32),
                     **{f"hist_{k}": np.asarray(v)
                        for k, v in odo._hist.items()})
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    os.close(fd)
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **state)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_vo(path: str, odo) -> None:
    """Restore a snapshot made by save_vo into an existing VisualOdometry
    (constructed with the same config/intrinsics)."""
    import jax.numpy as jnp
    from ..slam.vo import VOMap
    with np.load(path) as z:
        odo.trajectory = [row.astype(np.float32) for row in z["trajectory"]]
        odo.key = jnp.asarray(z["key"])
        odo._initialized = bool(z["initialized"])
        if "points" in z:
            odo.map = VOMap(points=jnp.asarray(z["points"]),
                            desc=jnp.asarray(z["desc"]),
                            valid=jnp.asarray(z["valid"]),
                            count=jnp.asarray(z["count"]))
        if "kf_pose" in z:
            odo._last_kf = (z["kf_pose"].astype(np.float32),
                            z["kf_uv"].astype(np.float32),
                            jnp.asarray(z["kf_desc"]),
                            int(z["kf_n"]), int(z["kf_idx"]))
        if "obs_frame" in z:
            odo._obs = [(int(f), int(l), uv) for f, l, uv in
                        zip(z["obs_frame"], z["obs_lm"], z["obs_uv"])]
        if "hist_n" in z:
            odo._hist_n = int(z["hist_n"])
            odo._hist = {k: jnp.asarray(z[f"hist_{k}"]) for k in
                         ("bits", "uv", "lm", "count", "frame", "pose")}
