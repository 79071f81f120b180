"""Distributed bundle adjustment: observation-sharded normal equations.

The scheme from SURVEY §7 step 6: shard the observation table across the
"data" mesh axis; every device accumulates partial U/V/W/g blocks over its
observation shard with segment_sum; one psum reduces them; the tiny reduced
camera solve (6P x 6P) and the landmark back-substitution are replicated.
Poses and landmarks are replicated state (window BA keeps both small); the
bandwidth-heavy part — per-observation Jacobians — never leaves the device
that owns the observations.

Collectives ride the mesh's ICI: one psum of
(P·36 + L·9 + L·P·18 + P·6 + L·3) floats per LM iteration.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..core.config import BAConfig
from ..slam import ba
from ..slam.camera import Intrinsics


def _lm_step_local(poses, points, lam, cost_prev, prob_shard: ba.BAProblem,
                   intr: Intrinsics, config: BAConfig, axis: str):
    """One LM step where `prob_shard` holds this device's observations."""
    psum = lambda x: jax.lax.psum(x, axis)
    delta = config.huber_delta
    U, V, W, g_c, g_p = ba.build_normal_equations(
        poses, points, intr, prob_shard, delta, reduce_fn=psum)
    dc, dp = ba.schur_solve(U, V, W, g_c, g_p, lam, prob_shard.fixed_poses)
    new_poses = poses + dc
    new_points = points + dp
    new_cost = psum(ba.cost(new_poses, new_points, intr, prob_shard, delta))
    accept = new_cost < cost_prev
    return (
        jnp.where(accept, new_poses, poses),
        jnp.where(accept, new_points, points),
        jnp.where(accept, lam * config.damping_down, lam * config.damping_up),
        jnp.where(accept, new_cost, cost_prev),
    )


@functools.partial(jax.jit, static_argnames=("mesh", "config", "axis"))
def bundle_adjust_sharded(prob: ba.BAProblem, intr: Intrinsics,
                          mesh: Mesh, config: BAConfig = BAConfig(),
                          axis: str = "data"):
    """LM bundle adjustment with observations sharded over `axis`.

    The observation arrays of `prob` must have leading dim divisible by the
    mesh axis size (pad with obs_valid=False rows; mesh.pad_to_multiple).
    Returns (poses, points, stats) — replicated.
    """
    obs_spec = P(axis)
    rep = P()

    in_specs = ba.BAProblem(
        poses=rep, points=rep,
        obs_pose=obs_spec, obs_point=obs_spec, obs_uv=obs_spec,
        obs_valid=obs_spec, fixed_poses=rep,
    )

    def run(prob_shard: ba.BAProblem):
        psum = lambda x: jax.lax.psum(x, axis)
        c0 = psum(ba.cost(prob_shard.poses, prob_shard.points, intr,
                          prob_shard, config.huber_delta))

        def body(state):
            poses, points, lam, cost_prev, it = state
            poses, points, lam, cost_prev = _lm_step_local(
                poses, points, lam, cost_prev, prob_shard, intr, config, axis)
            return poses, points, lam, cost_prev, it + 1

        def cond(state):
            _, _, lam, _, it = state
            return (it < config.max_iters) & (lam < 1e6)

        init = (prob_shard.poses, prob_shard.points,
                jnp.asarray(config.damping_init, jnp.float32), c0,
                jnp.asarray(0, jnp.int32))
        poses, points, lam, cost_final, it = jax.lax.while_loop(cond, body, init)
        return poses, points, ba.BAStats(c0, cost_final, it)

    return shard_map(run, mesh=mesh,
                     in_specs=(in_specs,),
                     out_specs=(rep, rep, ba.BAStats(rep, rep, rep)),
                     check_rep=False)(prob)
