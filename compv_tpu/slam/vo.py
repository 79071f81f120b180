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
import functools
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
from .camera import Intrinsics, point_depth, se3_inverse, triangulate_batch


@dataclasses.dataclass(frozen=True)
class VOConfig:
    # capacities at demonstrated reference scale (round-2 VERDICT item 3:
    # the object-recognition loop runs 2,000 features at HD,
    # samples/object_recognition/main.cxx:229-280; bench_all.py times the
    # fused _track_step at exactly these shapes on the real chip —
    # BENCH_DETAIL "vo_track_hd_2k_16k"). Tests/examples that only need
    # tracking mechanics pass smaller configs for CPU speed.
    max_landmarks: int = 16384
    max_obs_per_frame: int = 1024
    window: int = 5                     # BA window (keyframes)
    match_ratio: float = 0.8
    min_track_inliers: int = 12
    # triangulation parallax gate: a candidate is inserted only when the
    # rays from the two camera centers subtend > this angle at the point
    # (pure rotation gives huge pixel flow but ZERO baseline; ungated
    # insertion poisons the map with depth garbage during turns)
    min_tri_angle: float = 0.02         # rad (~1.1 deg)
    # keyframe promotion: promote when enough NEW landmarks triangulated
    # (baseline reached), or re-anchor when keyframe matches collapse
    min_new_landmarks: int = 8
    reanchor_matches: int = 30
    # motion-prior gate: reject map matches whose landmark, projected with
    # the PREVIOUS pose, lands further than this from the keypoint (a
    # projection search window — the standard guided-matching purity fix;
    # falls back to ungated matches if the gate starves the set)
    match_gate_px: float = 40.0
    # inside the projection window, also accept matches by ABSOLUTE
    # descriptor distance (the global Lowe ratio kills re-observations of
    # landmarks with similar siblings, capping track length ~3 frames;
    # longer tracks are what make drift observable to bundle adjustment)
    match_abs_dist: int = 72
    # duplicate suppression: skip inserting a candidate whose keypoint
    # falls within this radius of ANY projected existing landmark — the
    # matcher should carry that feature instead; duplicate ids fragment
    # feature tracks (median length 2) and starve BA of drift stiffness
    dup_radius_px: float = 6.0
    # landmark-centric re-observation window (BA obs recall; see
    # _track_step): each projected landmark claims the closest-descriptor
    # keypoint within this radius of its projection
    reobs_radius_px: float = 6.0
    ransac: RansacConfig = RansacConfig(max_iters=1024, batch=128,
                                        threshold=9.0)
    essential: RansacConfig = RansacConfig(max_iters=2048, batch=256,
                                           threshold=2e-5)
    ba: BAConfig = BAConfig(max_iters=8)
    orb: OrbConfig = OrbConfig(levels=8, max_features=2000)


def _dedup_matches(good, ti, dist, n_landmarks: int):
    """Keep only the best-distance query per landmark: multiple queries
    matching one landmark are wrong by construction (a landmark appears
    once per frame) and poison RANSAC's inlier ratio."""
    big = jnp.int32(1 << 20)
    d = jnp.where(good, dist, big)
    best = jax.ops.segment_min(d, ti, num_segments=n_landmarks)
    # tie-break by query index: first query with the best distance wins
    q = jnp.arange(ti.shape[0], dtype=jnp.int32)
    qkey = jnp.where(d == best[ti], q, big)
    first = jax.ops.segment_min(qkey, ti, num_segments=n_landmarks)
    return good & (q == first[ti])


def _parallax_angle(tri: jax.Array, pose1, pose2) -> jax.Array:
    """(N,) angle subtended at each triangulated point by the two camera
    centers — the baseline/parallax gate. Rotation-invariant (pixel flow
    is NOT: pure rotation gives large flow with zero baseline)."""
    c1 = se3_inverse(pose1)[3:]
    c2 = se3_inverse(pose2)[3:]
    a1 = tri - c1
    a2 = tri - c2
    cosang = (jnp.sum(a1 * a2, axis=1)
              / (jnp.linalg.norm(a1, axis=1)
                 * jnp.linalg.norm(a2, axis=1) + 1e-12))
    return jnp.arccos(jnp.clip(cosang, -1.0, 1.0))


@functools.partial(jax.jit, static_argnames=("config",))
def _track_step(img, map_points, map_desc, map_count,
                kf_pose, kf_uv, kf_desc, kf_count, prev_pose, key, intr,
                config: "VOConfig"):
    """The WHOLE per-frame compute as one compiled program: ORB frontend ->
    map matching -> RANSAC PnP -> keyframe matching + triangulation for map
    extension. One program = one host round trip per frame — each
    device->host transfer costs tens of ms over the remote-TPU tunnel, and
    the reference's per-frame loop (samples/object_recognition/main.cxx:229)
    maps exactly onto this fused step."""
    p, d = orb_detect_describe(img, config.orb)
    tr = Descriptors(bits=map_desc, count=map_count)
    m = bruteforce.match(d, tr, knn=2)
    good = bruteforce.lowe_ratio_mask(m, config.match_ratio)
    ti = m.train_idx[:, 0]
    good = _dedup_matches(good, ti, m.distance[:, 0], map_points.shape[0])
    # guided-matching purity gate against the previous pose (see VOConfig)
    from .camera import project
    pred = jax.vmap(lambda pt: project(prev_pose, intr, pt))(map_points[ti])
    near = jnp.linalg.norm(pred - p.xy, axis=1) < config.match_gate_px
    gated = good & near
    good = jnp.where(jnp.sum(gated) >= config.min_track_inliers,
                     gated, good)
    res = pnp.solve_pnp(key, map_points[ti], p.xy, intr,
                        valid_mask=good, config=config.ransac)
    # BA observation set — LANDMARK-CENTRIC re-observation: every live
    # in-view landmark searches the keypoints inside a small window around
    # its projection (solved pose) and claims the closest descriptor under
    # an absolute threshold. The keypoint-centric ratio test caps track
    # length at ~2-4 frames (siblings/duplicates steal the KNN-1 slot);
    # long tracks are what make drift observable to bundle adjustment.
    # PnP keeps the pure ratio-test set (purity over recall).
    q_valid = jnp.arange(p.xy.shape[0]) < p.count
    # extension candidates: match vs the last keyframe, triangulate.
    # kf_count masks the zero-padded keyframe rows (a padded zero
    # descriptor must never win a match and triangulate uv=(0,0) garbage)
    kf = Descriptors(bits=kf_desc, count=kf_count)
    mk = bruteforce.match(d, kf, knn=2)
    kf_good = bruteforce.lowe_ratio_mask(mk, config.match_ratio)
    # duplicate suppression (see VOConfig.dup_radius_px): project every
    # live landmark with the solved pose; candidates near one are already
    # mapped — reinserting them fragments tracks
    lm_proj = jax.vmap(lambda pt: project(res.pose, intr, pt))(map_points)
    lm_live = (jnp.arange(map_points.shape[0]) < map_count)
    lm_front = jax.vmap(lambda pt: point_depth(res.pose, pt))(map_points) > 0
    d2 = jnp.sum((p.xy[:, None, :] - lm_proj[None, :, :]) ** 2, axis=-1)
    d2 = jnp.where((lm_live & lm_front)[None, :], d2, jnp.inf)
    d2 = jnp.where(q_valid[:, None], d2, jnp.inf)
    dup = jnp.min(d2, axis=1) < config.dup_radius_px ** 2
    ok = kf_good & ~good & ~dup
    ti2 = mk.train_idx[:, 0]
    # landmark-centric re-observation for the BA obs set (see _reobserve)
    obs_mask, obs_ti = _reobserve(res.pose, map_points, map_desc,
                                  map_count, p.xy, d.bits, p.count, intr,
                                  config)
    tri = triangulate_batch(kf_pose, res.pose, intr, kf_uv[ti2], p.xy)
    depth = jax.vmap(lambda pt: point_depth(res.pose, pt))(tri)
    ang = _parallax_angle(tri, kf_pose, res.pose)
    return (p.xy, d.bits, p.count, good, ti, res.pose, obs_mask,
            res.num_inliers, ok, tri, depth, ang, jnp.sum(kf_good),
            res.inlier_mask & good, ti2, kf_good, obs_ti)


@functools.partial(jax.jit, static_argnames=("config",))
def _reobserve(pose, map_points, map_desc, map_count, xy, bits, n_kp,
               intr, config: "VOConfig"):
    """Landmark-centric re-observation against a KNOWN pose (used to log
    BA observations for essential-fallback frames — without them those
    poses have no constraints and bundle adjustment can never correct
    their velocity-prior scale guess)."""
    from .camera import project
    lm_proj = jax.vmap(lambda pt: project(pose, intr, pt))(map_points)
    lm_live = (jnp.arange(map_points.shape[0]) < map_count)
    lm_front = jax.vmap(lambda pt: point_depth(pose, pt))(map_points) > 0
    q_valid = jnp.arange(xy.shape[0]) < n_kp
    d2 = jnp.sum((xy[:, None, :] - lm_proj[None, :, :]) ** 2, axis=-1)
    d2 = jnp.where((lm_live & lm_front)[None, :], d2, jnp.inf)
    d2 = jnp.where(q_valid[:, None], d2, jnp.inf)
    hm = bruteforce.hamming_matrix(
        Descriptors(bits=map_desc, count=map_count),
        Descriptors(bits=bits, count=n_kp))
    big = jnp.int32(1 << 20)
    hm = jnp.where(d2.T < config.reobs_radius_px ** 2, hm, big)
    best_kp = jnp.argmin(hm, axis=1)
    best_ham = jnp.min(hm, axis=1)
    lm_ok = best_ham <= config.match_abs_dist
    L = map_points.shape[0]
    N = xy.shape[0]
    lid = jnp.arange(L, dtype=jnp.int32)
    comp = best_ham * L + lid
    kp_key = jnp.where(lm_ok, best_kp, N)
    best_comp = jax.ops.segment_min(comp, kp_key, num_segments=N + 1)[:N]
    obs_lm = jnp.where(best_comp <= 257 * L + L, best_comp % L, L)
    obs_mask = (obs_lm < L) & q_valid
    return obs_mask, jnp.where(obs_mask, obs_lm, 0).astype(jnp.int32)


@jax.jit
def _refresh_descriptors(desc, ti, bits, mask):
    """Overwrite re-observed landmarks' descriptors with the CURRENT
    frame's (ORB-SLAM's representative-descriptor idea, simplified):
    without refresh, viewpoint drift decays matchability in ~3-4 frames,
    and short tracks leave trajectory drift unobservable to BA."""
    safe = jnp.where(mask, ti, desc.shape[0])
    return desc.at[safe].set(bits, mode="drop")


@jax.jit
def _insert_landmarks(m: "VOMap", new_pts, new_desc, new_mask):
    """Device-side fixed-capacity map insertion: compact the masked new
    rows (stable order) and append at m.count. No host transfers — the
    host-side _add_landmarks round-trips the whole map over the tunnel."""
    L = m.points.shape[0]
    cap = new_pts.shape[0]
    order = jnp.argsort(~new_mask, stable=True)      # valid rows first
    sp = new_pts[order]
    sd = new_desc[order]
    n = jnp.minimum(jnp.sum(new_mask).astype(jnp.int32), L - m.count)
    rows = jnp.arange(L, dtype=jnp.int32)
    newpos = rows - m.count
    take = (newpos >= 0) & (newpos < n)
    src = jnp.clip(newpos, 0, cap - 1)
    points = jnp.where(take[:, None], sp[src], m.points)
    desc = jnp.where(take[:, None], sd[src], m.desc)
    valid = m.valid | take
    return VOMap(points=points, desc=desc, valid=valid, count=m.count + n)


@functools.partial(jax.jit, static_argnames=("config",))
def track_window(frames: jax.Array, vomap: "VOMap", kf_pose, kf_uv, kf_desc,
                 kf_count, key, intr, config: "VOConfig"):
    """Track a WHOLE window of frames as one compiled program: lax.scan over
    frames carrying the device-resident map + keyframe state. Zero host
    round trips inside the window — the serving-throughput mode (the
    host-driven `VisualOdometry.track` pays one tunnel round trip per frame;
    this pays one per window).

    Tracking failure on a frame holds the previous pose (flagged False in
    `ok`); the map extends only on success. Returns
    (poses (F, 6), ok (F,), inliers (F,), final map, final kf state).
    """
    min_inl = config.min_track_inliers
    n_frames = frames.shape[0]

    def step(carry, inp):
        m, kf_p, kf_u, kf_d, kf_n, k, last_pose, obs, cursor = carry
        fidx, img = inp
        k, sub = jax.random.split(k)
        p, d = orb_detect_describe(img, config.orb)
        tr = Descriptors(bits=m.desc, count=m.count)
        mm = bruteforce.match(d, tr, knn=2)
        good = bruteforce.lowe_ratio_mask(mm, config.match_ratio)
        ti = mm.train_idx[:, 0]
        good = _dedup_matches(good, ti, mm.distance[:, 0],
                              m.points.shape[0])
        # guided-matching purity gate against the previous pose
        from .camera import project
        pred = jax.vmap(lambda pt: project(last_pose, intr, pt))(
            m.points[ti])
        near = jnp.linalg.norm(pred - p.xy, axis=1) < config.match_gate_px
        gated = good & near
        good = jnp.where(jnp.sum(gated) >= config.min_track_inliers,
                         gated, good)
        res = pnp.solve_pnp(sub, m.points[ti], p.xy, intr,
                            valid_mask=good, config=config.ransac)
        ok = ((jnp.sum(good) >= min_inl)
              & (res.num_inliers >= min_inl))
        pose = jnp.where(ok, res.pose, last_pose)
        # extension: match vs keyframe, triangulate, insert (only when ok);
        # kf_n masks padded keyframe rows so they can't win matches
        cap = kf_d.shape[0]
        mk = bruteforce.match(d, Descriptors(bits=kf_d, count=kf_n), knn=2)
        kf_good = bruteforce.lowe_ratio_mask(mk, config.match_ratio)
        cand = kf_good & ~good
        tri = triangulate_batch(kf_p, pose, intr, kf_u[mk.train_idx[:, 0]],
                                p.xy)
        depth = jax.vmap(lambda pt: point_depth(pose, pt))(tri)
        ang = _parallax_angle(tri, kf_p, pose)
        old_count = m.count
        space_left = m.points.shape[0] - old_count
        passed = (cand & jnp.all(jnp.isfinite(tri), axis=1)
                  & (depth > 0.05) & (depth < 1e3)
                  & (ang > config.min_tri_angle) & ok)
        # keyframe promotion rule (same as track()): enough new landmarks
        # (baseline reached) or keyframe matches collapsed
        promote = ok & ((jnp.sum(passed) >= config.min_new_landmarks)
                        | (jnp.sum(kf_good) < config.reanchor_matches))
        new = passed & promote
        m = _insert_landmarks(m, tri, d.bits, new)

        # device-side observation log (feeds windowed BA): record inlier
        # map matches AND the new landmarks' first observations
        rec = (res.inlier_mask & good & ok) | new
        new_rank = jnp.cumsum(new.astype(jnp.int32)) - 1
        new_ok = new & (new_rank < space_left)
        lm_id = jnp.where(new, old_count + new_rank, ti)
        rec = rec & (new_ok | ~new)
        ranks = jnp.cumsum(rec.astype(jnp.int32)) - 1
        ocap = obs["uv"].shape[0]
        pos = jnp.where(rec & (cursor + ranks < ocap), cursor + ranks, ocap)
        obs = dict(
            pose=obs["pose"].at[pos].set(fidx, mode="drop"),
            point=obs["point"].at[pos].set(lm_id, mode="drop"),
            uv=obs["uv"].at[pos].set(p.xy, mode="drop"),
            valid=obs["valid"].at[pos].set(True, mode="drop"),
        )
        cursor = jnp.minimum(cursor + jnp.sum(rec), ocap)

        # keyframe promotes on success; ORB's capacity (strength-sorted)
        # is trimmed/padded to the keyframe buffer's capacity
        def fit(arr):
            n = arr.shape[0]
            if n >= cap:
                return arr[:cap]
            return jnp.pad(arr, ((0, cap - n),) + ((0, 0),) * (arr.ndim - 1))

        kf_p = jnp.where(promote, pose, kf_p)
        kf_u = jnp.where(promote, fit(p.xy), kf_u)
        kf_d = jnp.where(promote, fit(d.bits), kf_d)
        kf_n = jnp.where(promote, jnp.minimum(p.count, cap), kf_n)
        return ((m, kf_p, kf_u, kf_d, kf_n, k, pose, obs, cursor),
                (pose, ok, res.num_inliers))

    ocap = n_frames * config.max_obs_per_frame
    obs0 = dict(pose=jnp.zeros(ocap, jnp.int32),
                point=jnp.zeros(ocap, jnp.int32),
                uv=jnp.zeros((ocap, 2), jnp.float32),
                valid=jnp.zeros(ocap, bool))
    init = (vomap, jnp.asarray(kf_pose, jnp.float32),
            jnp.asarray(kf_uv, jnp.float32), jnp.asarray(kf_desc),
            jnp.asarray(kf_count, jnp.int32),
            key, jnp.asarray(kf_pose, jnp.float32), obs0,
            jnp.zeros((), jnp.int32))
    fids = jnp.arange(n_frames, dtype=jnp.int32)
    carry, (poses, oks, ninl) = jax.lax.scan(step, init, (fids, frames))
    m, kf_p, kf_u, kf_d, kf_n, _, _, obs, _ = carry
    return poses, oks, ninl, m, (kf_p, kf_u, kf_d, kf_n), obs


@functools.partial(jax.jit, static_argnames=("ratio",))
def _extend_compute(desc_p, kf_desc, kf_count, kf_pose, pose, kf_uv, uv_p,
                    intr, ratio: float):
    """Match current frame vs keyframe, triangulate, depth-check — one
    compiled program so the host does a single device_get."""
    cap = desc_p.shape[0]
    q = Descriptors(bits=desc_p, count=jnp.asarray(cap, jnp.int32))
    tr = Descriptors(bits=kf_desc, count=jnp.asarray(kf_count, jnp.int32))
    m = bruteforce.match(q, tr, knn=2)
    ok = bruteforce.lowe_ratio_mask(m, ratio)
    ti = m.train_idx[:, 0]
    tri = triangulate_batch(kf_pose, pose, intr, kf_uv[ti], uv_p)
    depth = jax.vmap(lambda p: point_depth(pose, p))(tri)
    ang = _parallax_angle(tri, kf_pose, pose)
    return ok, ti, tri, depth, ang


def _fit_rows(arr: jax.Array, cap: int, fill=0) -> jax.Array:
    """Trim/pad leading dim to `cap` (static shapes; pad value `fill`)."""
    n = arr.shape[0]
    if n >= cap:
        return arr[:cap]
    return jnp.pad(arr, ((0, cap - n),) + ((0, 0),) * (arr.ndim - 1),
                   constant_values=fill)


@jax.jit
def _hist_insert(hist, k, bits, uv, lm, count, frame, pose):
    """Write one keyframe into slot k of the device-resident history."""
    cap = hist["bits"].shape[1]
    return dict(
        bits=hist["bits"].at[k].set(_fit_rows(bits, cap)),
        uv=hist["uv"].at[k].set(_fit_rows(uv.astype(jnp.float32), cap)),
        lm=hist["lm"].at[k].set(_fit_rows(lm.astype(jnp.int32), cap,
                                          fill=-1)),
        count=hist["count"].at[k].set(jnp.minimum(count, cap)
                                      .astype(jnp.int32)),
        frame=hist["frame"].at[k].set(jnp.asarray(frame, jnp.int32)),
        pose=hist["pose"].at[k].set(pose.astype(jnp.float32)),
    )


@functools.partial(jax.jit, static_argnames=("ratio",))
def _loop_scores(cur_bits, cur_n, hist_bits, hist_count, ratio: float):
    """Good-match counts of the current keyframe vs EVERY stored keyframe —
    one batched program (vmapped popcount-GEMM over the history tensor)
    instead of the per-keyframe host loop of round 1 (one ~50 ms tunnel
    round trip per stored keyframe)."""
    q = Descriptors(bits=cur_bits, count=cur_n)

    def one(bits, cnt):
        m = bruteforce.match(q, Descriptors(bits=bits, count=cnt), knn=2)
        return jnp.sum(bruteforce.lowe_ratio_mask(m, ratio))

    return jax.vmap(one)(hist_bits, hist_count)


@functools.partial(jax.jit, static_argnames=("config",))
def _loop_edge_compute(cur_bits, cur_uv, cur_n, hist, k, map_points,
                       map_desc, map_count, key, intr, config: "VOConfig"):
    """Estimate the loop-closure pose: match current keyframe descriptors
    against historic keyframe k, look up the 3-D landmarks its keypoints
    observed, and PnP the current keypoints against them. Because those
    landmarks live in the SAME map/gauge as the trajectory, the resulting
    absolute pose carries consistent monocular scale — no separate scale
    resolution step is needed (the VERDICT item 4 design).

    The initial descriptor-only PnP can scrape by on very few inliers
    (XLA reduction-order drift shifts the RANSAC draw run to run; a
    4-inlier loop edge applied at weight 10 WORSENED an almost-closed
    trajectory — round-5 suite failure, pre-existing). So the edge is
    HARDENED: guided re-observation of the whole map (wide radius) at
    TWO seeds — the descriptor-PnP pose AND the historic keyframe's own
    stored pose (for a true loop/relocalization the camera is physically
    near that viewpoint) — each followed by a fresh PnP; the pose with
    the most inliers wins. A bad descriptor-PnP seed can lock a
    self-consistent but WRONG association (observed: 21 'inliers' 0.17
    off); the keyframe-pose seed breaks that feedback because it is
    independent of the descriptor matches."""
    old_bits = hist["bits"][k]
    old_lm = hist["lm"][k]
    old_n = hist["count"][k]
    old_pose = hist["pose"][k]
    q = Descriptors(bits=cur_bits, count=cur_n)
    t = Descriptors(bits=old_bits, count=old_n)
    m = bruteforce.match(q, t, knn=2)
    good = bruteforce.lowe_ratio_mask(m, config.match_ratio)
    ti = m.train_idx[:, 0]
    lm = old_lm[ti]
    good = good & (lm >= 0)
    lm_safe = jnp.maximum(lm, 0)
    good = _dedup_matches(good, lm_safe, m.distance[:, 0],
                          map_points.shape[0])
    k1, k2, k3, k4 = jax.random.split(key, 4)
    res = pnp.solve_pnp(k1, map_points[lm_safe], cur_uv, intr,
                        valid_mask=good, config=config.ransac)

    def harden(kk, seed_pose, radius):
        cfg_r = dataclasses.replace(
            config, reobs_radius_px=max(config.reobs_radius_px, radius))
        obs_mask, obs_ti = _reobserve(seed_pose, map_points, map_desc,
                                      map_count, cur_uv, cur_bits, cur_n,
                                      intr, cfg_r)
        return pnp.solve_pnp(kk, map_points[obs_ti], cur_uv, intr,
                             valid_mask=obs_mask, config=config.ransac)

    res2 = harden(k2, res.pose, 12.0)
    # keyframe-pose seed runs coarse-to-fine: the revisit viewpoint can
    # sit tens of px of parallax from the stored keyframe's
    res3a = harden(k3, old_pose, 40.0)
    res3 = harden(k4, res3a.pose, 12.0)
    # return ALL branch poses: raw inlier count cannot arbitrate between
    # a misassociated-but-self-consistent branch and the true one
    # (repeated texture can give the wrong branch MORE inliers) — the
    # caller applies its own prior (close_loop: plausibility vs the
    # trajectory; relocalize: inlier count, it has no prior)
    poses = jnp.stack([res.pose, res2.pose, res3a.pose, res3.pose])
    ninls = jnp.stack([res.num_inliers, res2.num_inliers,
                       res3a.num_inliers, res3.num_inliers])
    return poses, ninls


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
        # last keyframe (pose, padded uv, padded desc, frame_idx) for
        # triangulating NEW landmarks as the camera moves (map extension; the
        # two-view init map alone starves once its landmarks leave the FOV)
        self._last_kf = None
        # observation log (frame_idx, landmark_idx, uv) feeding windowed BA
        self._obs: List[Tuple[int, int, np.ndarray]] = []
        # sparse keyframe history for loop-closure retrieval: fixed-capacity
        # DEVICE-resident tensors so detection is one batched program (a
        # per-keyframe host loop costs ~50 ms tunnel round trip each)
        self._hist = None
        self._hist_n = 0
        self.max_keyframes = 256
        self.pnp_retries = 3

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

    def _add_landmarks(self, pts3d: np.ndarray, desc: np.ndarray
                       ) -> np.ndarray:
        """Host-side map insertion (append into the fixed-capacity table).
        Returns the assigned global landmark indices (may be shorter than
        the request when the map is full)."""
        m = self.map if self.map is not None else self._empty_map()
        count = int(m.count)
        space = self.config.max_landmarks - count
        n = min(pts3d.shape[0], space)
        if n <= 0:
            return np.zeros((0,), np.int64)
        points = np.array(m.points)
        descs = np.array(m.desc)
        valid = np.array(m.valid)
        points[count:count + n] = pts3d[:n]
        descs[count:count + n] = desc[:n]
        valid[count:count + n] = True
        self.map = VOMap(points=jnp.asarray(points), desc=jnp.asarray(descs),
                         valid=jnp.asarray(valid),
                         count=jnp.asarray(count + n, jnp.int32))
        return np.arange(count, count + n)

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
        n2 = min(np.asarray(uv2).shape[0], cap)
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
        # single device->host transfer (tunnel round trips are expensive)
        inlier_mask, pts, wt2 = jax.device_get((res.inlier_mask, tri, wt2))
        mask = inlier_mask & vmask
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
        self._obs = []
        lids = self._add_landmarks(pts[good], np.asarray(desc2)[good])
        gi = np.flatnonzero(good)[:len(lids)]
        for lid, g in zip(lids, gi):
            self._obs.append((0, int(lid), uv1[g]))
            self._obs.append((1, int(lid), uv2[g]))
        self._last_kf = (wt2.astype(np.float32), uv2, desc2, n2, 1)
        # the init keyframe seeds the loop-closure history (otherwise a
        # loop back to the START region has nothing to match against)
        lm = np.full(uv2.shape[0], -1, np.int32)
        lm[gi] = lids
        self._remember_keyframe(1, jnp.asarray(desc2), uv2, lm, n2,
                                wt2.astype(np.float32))
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
        # ONE device->host transfer (each jax->numpy round trip costs tens
        # of ms over the remote-TPU tunnel; never transfer piecemeal)
        good, ti, map_pts = jax.device_get(
            (bruteforce.lowe_ratio_mask(m, self.config.match_ratio),
             m.train_idx[:, 0], self.map.points))
        if good.sum() < self.config.min_track_inliers:
            return False
        # keep static shapes: full padded arrays + validity mask into PnP
        pts3d = map_pts[ti]                        # (cap, 3)
        res = pnp.solve_pnp(self._split(), jnp.asarray(pts3d),
                            jnp.asarray(uv_p), self.intr,
                            valid_mask=jnp.asarray(good),
                            config=self.config.ransac)
        num_inl, pose, inlier_mask = jax.device_get(
            (res.num_inliers, res.pose, res.inlier_mask))
        if int(num_inl) < self.config.min_track_inliers:
            return False
        pose = np.asarray(pose, np.float32)
        self.trajectory.append(pose)
        fidx = len(self.trajectory) - 1
        inl = inlier_mask & good
        for i in np.flatnonzero(inl):
            self._obs.append((fidx, int(ti[i]), uv_p[i]))
        self._extend_map(uv_p, desc_p, n, pose, matched=good, frame_idx=fidx)
        return True

    def refine(self, window: Optional[int] = None) -> bool:
        """Windowed bundle adjustment over the most recent frames: optimizes
        their poses + the landmarks they observe (slam/ba.py Schur-LM) and
        writes the result back into the trajectory/map. Call every few
        tracked frames to bound drift."""
        if not self._obs:
            return False
        w = window or self.config.window
        f_hi = len(self.trajectory)
        f_lo = max(0, f_hi - w)
        obs = [(f, l, uv) for (f, l, uv) in self._obs if f >= f_lo]
        if len(obs) < 12:
            return False
        frames = sorted({f for f, _, _ in obs})
        lids = sorted({l for _, l, _ in obs})
        pmap = {f: i for i, f in enumerate(frames)}
        lmap = {l: i for i, l in enumerate(lids)}
        o = len(obs)
        cap = 1 << max(6, (o - 1).bit_length())  # pow2 pad bounds recompiles
        obs_pose = np.zeros(cap, np.int32)
        obs_point = np.zeros(cap, np.int32)
        obs_uv = np.zeros((cap, 2), np.float32)
        for k, (f, l, uv) in enumerate(obs):
            obs_pose[k] = pmap[f]
            obs_point[k] = lmap[l]
            obs_uv[k] = uv
        valid = np.zeros(cap, bool)
        valid[:o] = True
        poses = np.stack([self.trajectory[f] for f in frames])
        points = np.array(self.map.points)[lids]
        # gauge: freeze the first TWO window poses — monocular BA has a
        # 7-dof gauge (6 pose + scale); freezing one pose leaves the
        # window scale free to slide each refine, compounding scale drift
        # and shearing landmarks against out-of-window observations
        fixed = np.zeros(len(frames), bool)
        fixed[: min(2, len(frames))] = True
        prob = ba.BAProblem(
            poses=jnp.asarray(poses), points=jnp.asarray(points),
            obs_pose=jnp.asarray(obs_pose), obs_point=jnp.asarray(obs_point),
            obs_uv=jnp.asarray(obs_uv), obs_valid=jnp.asarray(valid),
            fixed_poses=jnp.asarray(fixed))
        new_poses, new_points, stats = ba.bundle_adjust(
            prob, self.intr, self.config.ba)
        if not np.isfinite(np.asarray(new_poses)).all():
            return False
        if float(stats.final_cost) > float(stats.initial_cost):
            return False
        new_poses = np.asarray(new_poses, np.float32)
        for f, i in pmap.items():
            self.trajectory[f] = new_poses[i]
        pts = np.array(self.map.points)
        pts[lids] = np.asarray(new_points, np.float32)
        self.map = self.map._replace(points=jnp.asarray(pts))
        return True

    # -------------------------------------------------------- map extension
    def _extend_map(self, uv_p: np.ndarray, desc_p: np.ndarray, n_kp: int,
                    pose: np.ndarray, matched: np.ndarray,
                    frame_idx: int) -> None:
        """Triangulate NEW landmarks between this frame and the last keyframe
        for keypoints that did not match the map, then promote this frame to
        keyframe. All device steps are fixed-capacity (cap x cap match)."""
        kf = self._last_kf
        if kf is None:
            self._last_kf = (pose, uv_p, desc_p, n_kp, frame_idx)
            return
        kf_pose, kf_uv, kf_desc, kf_n, kf_idx = kf
        space = self.config.max_landmarks - int(self.map.count)
        # one fused device program + ONE transfer (tunnel round trips are
        # ~50ms each; eager per-op dispatch here used to cost seconds/frame)
        ok, ti, tri, depth_new, ang = jax.device_get(_extend_compute(
            jnp.asarray(desc_p), jnp.asarray(kf_desc), kf_n,
            jnp.asarray(kf_pose), jnp.asarray(pose),
            jnp.asarray(kf_uv), jnp.asarray(uv_p), self.intr,
            ratio=self.config.match_ratio))
        n_kf_matches = int(ok.sum())
        cand = ok & ~matched  # only keypoints the map does not explain
        good = cand & np.isfinite(tri).all(1) & (depth_new > 0.05) \
            & (depth_new < 1e3) & (ang > self.config.min_tri_angle)
        promote = (int(good.sum()) >= self.config.min_new_landmarks
                   or n_kf_matches < self.config.reanchor_matches)
        if promote:
            self._last_kf = (pose, uv_p, desc_p, n_kp, frame_idx)
        if promote and space > 0 and good.any():
            lids = self._add_landmarks(tri[good], desc_p[good])
            gi = np.flatnonzero(good)[:len(lids)]
            for lid, g in zip(lids, gi):
                self._obs.append((kf_idx, int(lid), kf_uv[ti[g]]))
                self._obs.append((frame_idx, int(lid), uv_p[g]))

    # ------------------------------------------------------- image-level
    def initialize(self, img1, img2) -> bool:
        p1, d1 = orb_detect_describe(jnp.asarray(img1), self.config.orb)
        p2, d2 = orb_detect_describe(jnp.asarray(img2), self.config.orb)
        m = bruteforce.match(d1, d2, knn=2)
        good, n1, ti, xy1, xy2, bits2 = jax.device_get(
            (bruteforce.lowe_ratio_mask(m, self.config.match_ratio),
             p1.count, m.train_idx[:, 0], p1.xy, p2.xy, d2.bits))
        good = good.copy()
        good[int(n1):] = False
        if good.sum() < 32:
            return False
        return self.initialize_pair(xy1[good], xy2[ti[good]],
                                    bits2[ti[good]])

    def track(self, img) -> bool:
        """Track one image frame: the whole ORB->match->PnP->extend compute
        runs as ONE device program (_track_step); only the small decision
        values cross the tunnel, keyframe state and the map stay on device."""
        assert self._initialized
        kf_pose, kf_uv, kf_desc, kf_n, kf_idx = self._last_kf
        (xy_d, bits_d, n_kp, good_d, ti_d, pose_d, inlier_d, num_inl_d,
         ok_d, tri_d, depth_d, ang_d, nkf_d, pure_d, ti2_d,
         kf_good_d, obs_ti_d) = _track_step(
            jnp.asarray(img), self.map.points, self.map.desc, self.map.count,
            jnp.asarray(kf_pose), jnp.asarray(kf_uv), jnp.asarray(kf_desc),
            jnp.asarray(kf_n, jnp.int32),
            jnp.asarray(self.trajectory[-1], jnp.float32),
            self._split(), self.intr, self.config)
        # one transfer: decisions + obs data (device copies stay for kf/map)
        (xy, good, ti, pose, inlier_mask, num_inl, ok, tri, depth, ang,
         n_kf_matches, obs_ids) = jax.device_get(
            (xy_d, good_d, ti_d, pose_d, inlier_d, num_inl_d,
             ok_d, tri_d, depth_d, ang_d, nkf_d, obs_ti_d))
        if good.sum() < self.config.min_track_inliers:
            return self._essential_fallback(
                xy_d, bits_d, n_kp, ti2_d, kf_good_d, kf_pose, kf_uv, kf_n)
        if int(num_inl) < self.config.min_track_inliers:
            # PnP is a RANSAC lottery when inlier purity is low (the same
            # frame can yield 2 or 38 inliers on different seeds); retry
            # with fresh seeds on the SAME matches before declaring loss
            for _ in range(self.pnp_retries):
                res = pnp.solve_pnp(
                    self._split(), self.map.points[ti_d], xy_d, self.intr,
                    valid_mask=good_d, config=self.config.ransac)
                num_inl, pose, inlier_mask = jax.device_get(
                    (res.num_inliers, res.pose, res.inlier_mask))
                inlier_mask = inlier_mask & good
                obs_ids = ti          # retry path: ratio-test landmark ids
                if int(num_inl) >= self.config.min_track_inliers:
                    pose_d = res.pose
                    # the purest set is now the ACCEPTED retry's inliers;
                    # pure_d still holds the rejected first solve's
                    pure_d = res.inlier_mask & good_d
                    break
            else:
                return self._essential_fallback(
                    xy_d, bits_d, n_kp, ti2_d, kf_good_d,
                    kf_pose, kf_uv, kf_n)
            # the precomputed extension/triangulation products used the
            # rejected pose; skip extension this frame (the next frame's
            # fused step refreshes them against the accepted pose)
            ok = np.zeros_like(ok)
        self.trajectory.append(np.asarray(pose, np.float32))
        fidx = len(self.trajectory) - 1
        # inlier_mask is the landmark-centric re-observation set on the
        # main path (ids in obs_ids); RANSAC inliers on retry
        for i in np.flatnonzero(inlier_mask):
            self._obs.append((fidx, int(obs_ids[i]), xy[i]))
        # refresh with the PUREST set only (RANSAC inliers of ratio-test
        # matches): a wrong re-observation overwriting a descriptor
        # hijacks the landmark's identity persistently
        self.map = self.map._replace(desc=_refresh_descriptors(
            self.map.desc, ti_d, bits_d, pure_d))
        # map extension: candidates must clear the PARALLAX gate (rays from
        # the two centers subtend > min_tri_angle — pure rotation has none)
        count = int(self.map.count)
        space = self.config.max_landmarks - count
        new = (ok & np.isfinite(tri).all(1) & (depth > 0.05) & (depth < 1e3)
               & (ang > self.config.min_tri_angle))
        n_new = 0
        gi = np.zeros((0,), np.int64)
        # keyframe promotes only when enough NEW landmarks triangulated
        # (baseline reached) or when keyframe matches collapse (re-anchor);
        # promoting every frame gave near-zero baseline and starved the map
        promote = (int(new.sum()) >= self.config.min_new_landmarks
                   or int(n_kf_matches) < self.config.reanchor_matches)
        if promote and space > 0 and new.any():
            self.map = _insert_landmarks(self.map, tri_d, bits_d,
                                         jnp.asarray(new))
            n_new = min(int(new.sum()), space)
            gi = np.flatnonzero(new)[:n_new]
            for lid, g in zip(range(count, count + n_new), gi):
                self._obs.append((fidx, int(lid), xy[g]))
        if promote:
            self._last_kf = (pose_d, xy_d, bits_d, n_kp, fidx)
            # per-keypoint landmark ids: map matches + freshly triangulated
            lm = np.full(xy.shape[0], -1, np.int32)
            sel = inlier_mask
            lm[sel] = obs_ids[sel]
            if n_new:
                lm[gi] = np.arange(count, count + n_new)
            self._remember_keyframe(fidx, bits_d, xy_d, lm, n_kp, pose_d)
        return True

    def _essential_fallback(self, xy_d, bits_d, n_kp, ti2_d, kf_good_d,
                            kf_pose, kf_uv, kf_n) -> bool:
        """PnP-loss recovery: 2D-2D essential-matrix pose vs the last
        keyframe (needs NO landmarks, so it bridges map-starved stretches
        like sustained rotation), with translation magnitude carried from
        the recent velocity (monocular scale is unobservable from 2D-2D).
        On success the frame becomes the new keyframe and new landmarks
        are triangulated against the old one — rebuilding the map."""
        kf_good, ti2, xy, n_kp_h = jax.device_get(
            (kf_good_d, ti2_d, xy_d, n_kp))
        kf_good = kf_good.copy()
        kf_good[int(n_kp_h):] = False
        if kf_good.sum() < 24 or len(self.trajectory) < 2:
            return False
        kf_uv_h = np.asarray(kf_uv)
        res = essential.find_essential(
            self._split(), jnp.asarray(kf_uv_h[np.asarray(ti2)]), xy_d,
            self.intr, valid_mask=jnp.asarray(kf_good),
            config=self.config.essential)
        ninl, e = jax.device_get((res.num_inliers, res.e))
        if int(ninl) < 16:
            return False
        x1 = essential._normalize_pixels(
            jnp.asarray(kf_uv_h[np.asarray(ti2)]), self.intr)
        x2 = essential._normalize_pixels(xy_d, self.intr)
        r, t = essential.decompose_essential(
            res.e, x1, x2, res.inlier_mask & jnp.asarray(kf_good))
        from .camera import so3_log, se3_compose, se3_relative
        # translation magnitude from recent velocity (constant speed prior)
        v = np.asarray(se3_relative(jnp.asarray(self.trajectory[-2]),
                                    jnp.asarray(self.trajectory[-1])))
        speed = float(np.linalg.norm(v[3:]))
        rel = jnp.concatenate([so3_log(r), speed * t])
        pose = np.asarray(se3_compose(rel, jnp.asarray(kf_pose)),
                          np.float32)
        if not np.isfinite(pose).all():
            return False
        self.trajectory.append(pose)
        fidx = len(self.trajectory) - 1
        # log re-observations against the solved pose so bundle adjustment
        # can correct this pose (its translation scale is only a velocity
        # prior — without obs it would be frozen garbage in the graph)
        obs_mask, obs_ti = jax.device_get(_reobserve(
            jnp.asarray(pose), self.map.points, self.map.desc,
            self.map.count, xy_d, bits_d, n_kp, self.intr, self.config))
        for i in np.flatnonzero(obs_mask):
            self._obs.append((fidx, int(obs_ti[i]), xy[i]))
        # rebuild the map against the old keyframe from this new pose
        bits_h = np.asarray(bits_d)
        self._extend_map(np.asarray(xy, np.float32), bits_h, int(n_kp_h),
                         pose, matched=np.zeros(xy.shape[0], bool),
                         frame_idx=fidx)
        # force keyframe promotion even if _extend_map declined
        self._last_kf = (pose, np.asarray(xy, np.float32), bits_h,
                         int(n_kp_h), fidx)
        return True

    def track_batch(self, frames, refine: bool = False) -> np.ndarray:
        """Track a window of frames with ONE device program + ONE transfer
        (track_window). Appends successfully-tracked poses to the
        trajectory, updates the device-resident map/keyframe. With
        ``refine=True`` a windowed Schur-BA over the window's device-logged
        observations runs before results come back — still zero extra
        round trips. Returns the (F,) success flags."""
        assert self._initialized
        kf_pose, kf_uv, kf_desc, kf_n, _ = self._last_kf
        poses, oks, _, m, (kfp, kfu, kfd, kfn), obs = track_window(
            jnp.asarray(frames), self.map, kf_pose, kf_uv, kf_desc, kf_n,
            self._split(), self.intr, self.config)
        if refine:
            prob = ba.BAProblem(
                poses=poses, points=m.points,
                obs_pose=obs["pose"], obs_point=obs["point"],
                obs_uv=obs["uv"], obs_valid=obs["valid"],
                fixed_poses=jnp.zeros(poses.shape[0], bool).at[0].set(True))
            new_poses, new_points, stats = ba.bundle_adjust(
                prob, self.intr, self.config.ba)
            improved = (jnp.isfinite(new_poses).all()
                        & (stats.final_cost <= stats.initial_cost))
            poses = jnp.where(improved, new_poses, poses)
            m = m._replace(points=jnp.where(improved, new_points, m.points))
        poses_h, oks_h = jax.device_get((poses, oks))
        for f in range(len(oks_h)):
            if oks_h[f]:
                self.trajectory.append(np.asarray(poses_h[f], np.float32))
        self.map = m
        self._last_kf = (kfp, kfu, kfd, kfn, len(self.trajectory) - 1)
        return oks_h

    # ------------------------------------------------- loop closure / graph
    def _remember_keyframe(self, fidx: int, bits, uv, lm, count, pose
                           ) -> None:
        """Store a keyframe (descriptors, pixels, per-keypoint landmark ids,
        pose) into the device-resident loop-closure history."""
        cap = self.config.max_obs_per_frame
        if self._hist is None:
            K = self.max_keyframes
            self._hist = dict(
                bits=jnp.zeros((K, cap, 8), jnp.uint32),
                uv=jnp.zeros((K, cap, 2), jnp.float32),
                lm=jnp.full((K, cap), -1, jnp.int32),
                count=jnp.zeros((K,), jnp.int32),
                frame=jnp.full((K,), -1, jnp.int32),
                pose=jnp.zeros((K, 6), jnp.float32))
        if self._hist_n >= self.max_keyframes:
            return
        self._hist = _hist_insert(
            self._hist, self._hist_n, jnp.asarray(bits),
            jnp.asarray(uv), jnp.asarray(lm), jnp.asarray(count),
            fidx, jnp.asarray(pose))
        self._hist_n += 1

    def detect_loop(self, min_matches: int = 40, exclude_recent: int = 20
                    ) -> Optional[Tuple[int, int, int]]:
        """Descriptor-retrieval loop candidate: ONE batched device program
        matches the current keyframe against the whole stored history
        (excluding recent frames). Returns (frame_idx, n_matches, hist_slot)
        of the best candidate, or None. (Beyond-reference: place recognition
        over hamming matching.)"""
        if self._last_kf is None or self._hist is None or self._hist_n == 0:
            return None
        _, _, cur_bits, cur_n, cur_idx = self._last_kf
        scores, frames_h = jax.device_get((
            _loop_scores(jnp.asarray(cur_bits),
                         jnp.asarray(cur_n, jnp.int32),
                         self._hist["bits"], self._hist["count"],
                         self.config.match_ratio),
            self._hist["frame"]))
        best = None
        for k in range(self._hist_n):
            fidx, n = int(frames_h[k]), int(scores[k])
            if cur_idx - fidx < exclude_recent:
                continue
            if n >= min_matches and (best is None or n > best[1]):
                best = (fidx, n, k)
        return best

    def close_loop(self, min_matches: int = 40, exclude_recent: int = 20,
                   min_inliers: int = 15, weight: float = 10.0,
                   iters: int = 30) -> bool:
        """Fully automatic loop closure: detect a revisited keyframe,
        estimate the loop pose by PnP of the current keypoints against the
        old keyframe's landmarks (consistent monocular scale — the map IS
        the gauge), form the loop edge, and refine the whole trajectory
        with the pose graph. Returns True when a loop was closed."""
        if self._last_kf is None or self._hist is None or self._hist_n == 0:
            return False
        kf_pose, kf_uv, kf_bits, kf_n, cur_idx = self._last_kf
        scores, frames_h = jax.device_get((
            _loop_scores(jnp.asarray(kf_bits),
                         jnp.asarray(kf_n, jnp.int32),
                         self._hist["bits"], self._hist["count"],
                         self.config.match_ratio),
            self._hist["frame"]))
        cands = sorted(
            ((int(scores[k]), int(frames_h[k]), k)
             for k in range(self._hist_n)
             if cur_idx - int(frames_h[k]) >= exclude_recent
             and int(scores[k]) >= min_matches), reverse=True)
        from .camera import se3_relative
        centers = self.positions()
        path = float(np.linalg.norm(np.diff(centers, axis=0), axis=1).sum())
        # iterate the best few candidates: a candidate whose PnP edge is
        # IMPLAUSIBLE (correction far beyond what odometry drift can be —
        # a self-consistent misassociation; observed 0.32x-of-path) is
        # rejected, a candidate that already AGREES with the trajectory
        # within the edge's own noise closes the loop with no graph bend
        # (bending would only inject the edge noise into a trajectory
        # that is already loop-consistent), and a plausible disagreement
        # triggers the pose-graph refinement.
        for _, fidx_old, k in cands[:3]:
            poses_j, ninls = jax.device_get(_loop_edge_compute(
                jnp.asarray(kf_bits), jnp.asarray(kf_uv, jnp.float32),
                jnp.asarray(kf_n, jnp.int32), self._hist,
                jnp.asarray(k, jnp.int32), self.map.points, self.map.desc,
                self.map.count, self._split(), self.intr, self.config))
            order = np.argsort(np.asarray(ninls))[::-1]
            for b in order:
                pose_j, ninl = poses_j[b], int(ninls[b])
                if ninl < min_inliers or not np.isfinite(pose_j).all():
                    continue
                z = np.asarray(se3_relative(
                    jnp.asarray(self.trajectory[fidx_old]),
                    jnp.asarray(pose_j, jnp.float32)), np.float32)
                rel_cur = np.asarray(se3_relative(
                    jnp.asarray(self.trajectory[fidx_old]),
                    jnp.asarray(self.trajectory[cur_idx])), np.float32)
                corr = z - rel_cur
                ct = float(np.linalg.norm(corr[3:]))
                cr = float(np.linalg.norm(corr[:3]))
                if ct > 0.25 * path or cr > 0.5:
                    continue      # misassociated branch — try the next
                if ct < max(0.03 * path, 1e-3) and cr < 0.03:
                    return True   # loop verified; already consistent
                return self.optimize_posegraph(
                    loop_edges=[(fidx_old, cur_idx, z, weight)],
                    iters=iters)
        return False

    def relocalize(self, img, min_matches: int = 25,
                   min_inliers: int = 15) -> bool:
        """Global relocalization after tracking loss — the kidnapped-camera
        case that neither track()'s guided matching nor the essential
        fallback handles (both only look at the LAST keyframe).

        ORB the frame, score its descriptors against the whole
        device-resident keyframe history in one batched program
        (_loop_scores), then PnP the keypoints against the best candidate
        keyframes' landmarks (_loop_edge_compute — the landmarks live in
        the map gauge, so the recovered pose carries consistent monocular
        scale). On success the frame joins the trajectory, its map
        re-observations are logged for BA, and it becomes the current
        keyframe so track() resumes normally.

        Beyond-reference capability (the reference has no SLAM layer;
        SURVEY §7 steps 5-6)."""
        if not self._initialized or self._hist is None or self._hist_n == 0:
            return False
        cap = self.config.max_obs_per_frame
        p, d = orb_detect_describe(jnp.asarray(img), self.config.orb)
        xy_h, bits_h, n_kp = jax.device_get((p.xy, d.bits, p.count))
        n = min(int(n_kp), cap)
        uv_p, _ = self._pad_rows(np.asarray(xy_h, np.float32)[:n], cap)
        bits_p, _ = self._pad_rows(np.asarray(bits_h)[:n], cap)
        bits_d = jnp.asarray(bits_p)
        uv_d = jnp.asarray(uv_p, jnp.float32)
        n_d = jnp.asarray(n, jnp.int32)
        scores = np.asarray(jax.device_get(_loop_scores(
            bits_d, n_d, self._hist["bits"], self._hist["count"],
            self.config.match_ratio)))[: self._hist_n]
        # try the best few candidates (a wrong retrieval fails PnP cheaply)
        for k in np.argsort(scores)[::-1][:3]:
            if scores[k] < min_matches:
                break
            poses_j, ninls = jax.device_get(_loop_edge_compute(
                bits_d, uv_d, n_d, self._hist,
                jnp.asarray(int(k), jnp.int32), self.map.points,
                self.map.desc, self.map.count,
                self._split(), self.intr, self.config))
            b = int(np.argmax(np.asarray(ninls)))
            pose_j, ninl = poses_j[b], ninls[b]
            if int(ninl) < min_inliers or not np.isfinite(pose_j).all():
                continue
            pose = np.asarray(pose_j, np.float32)
            self.trajectory.append(pose)
            fidx = len(self.trajectory) - 1
            obs_mask, obs_ti = jax.device_get(_reobserve(
                jnp.asarray(pose), self.map.points, self.map.desc,
                self.map.count, uv_d, bits_d, n_d, self.intr,
                self.config))
            for i in np.flatnonzero(obs_mask):
                self._obs.append((fidx, int(obs_ti[i]), uv_p[i]))
            self._last_kf = (pose, uv_p, bits_p, n, fidx)
            return True
        return False

    def optimize_posegraph(self, loop_edges=None, iters: int = 30) -> bool:
        """Global trajectory refinement over sequential odometry edges plus
        optional loop-closure constraints [(i, j, z_ij (6,), weight)], using
        slam/posegraph.py. Updates the trajectory in place."""
        from . import posegraph
        from .camera import se3_relative
        F = len(self.trajectory)
        if F < 3:
            return False
        traj = jnp.asarray(np.stack(self.trajectory))
        ei = list(range(F - 1))
        ej = list(range(1, F))
        ez = [np.asarray(se3_relative(traj[i], traj[i + 1]))
              for i in range(F - 1)]
        ew = [1.0] * (F - 1)
        for (i, j, z, w) in (loop_edges or []):
            ei.append(i)
            ej.append(j)
            ez.append(np.asarray(z, np.float32))
            ew.append(float(w))
        g = posegraph.PoseGraph(
            poses=traj,
            edge_i=jnp.asarray(ei, jnp.int32),
            edge_j=jnp.asarray(ej, jnp.int32),
            edge_z=jnp.asarray(np.stack(ez), jnp.float32),
            edge_w=jnp.asarray(ew, jnp.float32),
            edge_valid=jnp.ones((len(ei),), bool),
            fixed=jnp.asarray([True] + [False] * (F - 1)))
        poses, cost = posegraph.optimize(g, iters=iters)
        poses = np.asarray(poses, np.float32)
        if not np.isfinite(poses).all():
            return False
        self.trajectory = [poses[i] for i in range(F)]
        return True

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
