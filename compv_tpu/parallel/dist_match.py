"""Distributed descriptor matching: train set sharded by keyframe ownership.

SURVEY §7 step 6: each device owns a block of the map's descriptors
("keyframe ownership"); queries are replicated (an all_gather of queries is
implicit in the replicated in_spec); every device runs the local
popcount-GEMM against its block; the global KNN is a psum-free reduce of the
per-device top-k candidates (all_gather of (Q, k) distance/index pairs, then
a final top-k over device axis).

Replaces the reference's query-range thread fan-out
(bruteforce.cxx:115-130) with map-block sharding — the reverse split, chosen
because in SLAM the map is the large, distributed object while per-frame
queries are small.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..core.types import Descriptors, Matches, PAD_DISTANCE
from ..matchers import bruteforce


@functools.partial(jax.jit, static_argnames=("mesh", "knn", "axis"))
def match_sharded(query: Descriptors, train: Descriptors, mesh: Mesh,
                  knn: int = 2, axis: str = "data") -> Matches:
    """KNN hamming match with `train` rows sharded over `axis`.

    train.bits leading dim must divide the mesh axis; invalid rows are
    already masked by train.count (translated to a per-shard count below).
    Returns replicated Matches with *global* train indices.
    """
    n_dev = mesh.shape[axis]
    t_total = train.bits.shape[0]
    assert t_total < (1 << 31) // 258, (
        f"train set of {t_total} rows overflows the int32 composite "
        "tie-break key; shard the map or widen the key to int64")
    t_local = t_total // n_dev

    def run(q_bits, q_count, t_bits, t_count):
        dev = jax.lax.axis_index(axis)
        # local validity: global rows [dev*t_local, (dev+1)*t_local)
        base = dev * t_local
        local_ids = base + jnp.arange(t_local, dtype=jnp.int32)
        t_valid = local_ids < t_count
        q = Descriptors(bits=q_bits, count=q_count)
        t = Descriptors(bits=t_bits, count=jnp.sum(t_valid).astype(jnp.int32))
        d = bruteforce.hamming_matrix(q, t)
        d = jnp.where(t_valid[None, :], d, PAD_DISTANCE)
        neg, idx = jax.lax.top_k(-d, knn)              # local top-k
        gidx = base + idx                              # global indices
        # gather all devices' candidates and reduce to global top-k
        cand_d = jax.lax.all_gather(-neg, axis, axis=1)    # (Q, n_dev, k)
        cand_i = jax.lax.all_gather(gidx, axis, axis=1)
        qn = cand_d.shape[0]
        cand_d = cand_d.reshape(qn, n_dev * knn)
        cand_i = cand_i.reshape(qn, n_dev * knn)
        # composite (distance, global-index) key: ties resolve to the lowest
        # global index, bit-identical to the single-device iterated argmin
        # regardless of mesh size. True hamming distances are <= 256 for
        # 256-bit rows, so clamping to 257 keeps PAD_DISTANCE representable
        # while bounding the key at 258*t_total (int32-safe for t_total
        # < 2^31/258 ~ 8.3M rows; asserted below at trace time).
        key = jnp.minimum(cand_d, 257) * jnp.int32(t_total) + cand_i
        _, sel = jax.lax.top_k(-key, knn)
        final_i = jnp.take_along_axis(cand_i, sel, axis=1)
        neg2 = -jnp.take_along_axis(cand_d, sel, axis=1)
        q_valid = jnp.arange(qn, dtype=jnp.int32) < q_count
        return final_i.astype(jnp.int32), -neg2, q_valid

    rep = P()
    train_idx, distance, query_valid = shard_map(
        run, mesh=mesh,
        in_specs=(rep, rep, P(axis), rep),
        out_specs=(rep, rep, rep),
        check_rep=False,
    )(query.bits, query.count, train.bits, train.count)
    return Matches(train_idx=train_idx, distance=distance,
                   query_valid=query_valid)
