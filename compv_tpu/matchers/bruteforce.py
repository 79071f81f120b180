"""Brute-force hamming KNN matcher as a popcount-GEMM.

Re-design of core/matchers/compv_core_matcher_bruteforce.cxx:18-240 (+
popcnt SSE4.2/AVX2/NEON asm, ~1.8k LoC). The reference streams each train
row against all query rows with SIMD popcount and an insertion-sorted best-2.

TPU formulation: unpack 256-bit descriptors to (N, 256) {0,1} planes once,
then hamming(q, t) = q . (1 - t) + (1 - q) . t — two MXU matmuls (or one,
see below) over the bit planes. For Q = T = 2000 that is ~2 GFLOP: trivially
MXU-bound, replacing the reference's O(Q*T*32B) scalar popcount loop.
KNN selection is lax.top_k over the distance matrix.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.config import MatchConfig
from ..core.registry import register
from ..core.types import Descriptors, Matches, PAD_DISTANCE


def unpack_bits(packed: jax.Array) -> jax.Array:
    """(N, words) uint32 -> (N, words*32) int8 in {0,1} (bit i of word w
    -> column w*32+i, matching brief._pack_bits order)."""
    n, words = packed.shape
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (packed[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return bits.reshape(n, words * 32).astype(jnp.int8)


def hamming_matrix(query: Descriptors, train: Descriptors) -> jax.Array:
    """(Q, T) int32 hamming distances.

    Using sum_bits(q xor t) = sum(q) + sum(t) - 2 q.t — ONE (Q,256)x(256,T)
    matmul plus rank-1 corrections, the MXU-optimal form. The bit planes
    feed the MXU as int8 with int32 accumulation (s8xs8->s32): exact, and
    ~8x the f32 MXU rate on v5e (394 int8 TOPS vs 49 f32 TFLOPs).
    """
    qb = unpack_bits(query.bits)
    tb = unpack_bits(train.bits)
    dot = jax.lax.dot_general(
        qb, tb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)        # (Q, T) MXU popcount-GEMM
    q1 = jnp.sum(qb.astype(jnp.int32), axis=1, keepdims=True)
    t1 = jnp.sum(tb.astype(jnp.int32), axis=1, keepdims=True)
    return q1 + t1.T - 2 * dot


@functools.partial(jax.jit, static_argnames=("knn",))
def match(query: Descriptors, train: Descriptors, knn: int = 2) -> Matches:
    """KNN hamming match (reference CompVMatcherBruteForce::process with
    KNN=1/2/k). Invalid (padded) train columns get distance PAD_DISTANCE so
    they never win; invalid query rows are flagged via query_valid."""
    d = hamming_matrix(query, train)
    t_valid = train.valid  # (T,)
    d = jnp.where(t_valid[None, :], d, PAD_DISTANCE)
    # Iterated argmin instead of lax.top_k: top_k lowers to a full sort on
    # TPU (~10x slower); knn is 1/2/small-k (bruteforce.cxx:166-223 keeps a
    # streaming best-2), so k min-reduction passes are the fast form.
    cols = jnp.arange(d.shape[1], dtype=jnp.int32)[None, :]
    idxs, dists = [], []
    for _ in range(knn):
        # min + argmin reductions only — no take_along_axis (TPU gathers
        # are an order of magnitude slower than a second reduction)
        best = jnp.argmin(d, axis=1).astype(jnp.int32)
        idxs.append(best)
        dists.append(jnp.min(d, axis=1))
        d = jnp.where(cols == best[:, None], PAD_DISTANCE, d)
    return Matches(train_idx=jnp.stack(idxs, axis=1),
                   distance=jnp.stack(dists, axis=1),
                   query_valid=query.valid)


def lowe_ratio_mask(matches: Matches, ratio: float = 0.75) -> jax.Array:
    """(Q,) bool: best-of-2 passes Lowe's ratio test (the reference's sample
    app applies d0 < ratio * d1, samples/object_recognition/main.cxx:183-190).
    Requires knn >= 2."""
    d0 = matches.distance[:, 0].astype(jnp.float32)
    d1 = matches.distance[:, 1].astype(jnp.float32)
    return (d0 < ratio * d1) & matches.query_valid & (d0 < PAD_DISTANCE)


def cross_check_mask(fwd: Matches, bwd: Matches) -> jax.Array:
    """(Q,) bool mutual-best mask (the crosscheck alternative documented in
    bruteforce.cxx)."""
    q_best = fwd.train_idx[:, 0]                     # (Q,)
    t_best = bwd.train_idx[:, 0]                     # (T,)
    mutual = t_best[q_best] == jnp.arange(q_best.shape[0], dtype=jnp.int32)
    return mutual & fwd.query_valid


@register("matcher", "bruteforce")
def make_bruteforce(config: MatchConfig = MatchConfig()):
    """Factory (reference COMPV_BRUTEFORCE_ID)."""

    def run(query: Descriptors, train: Descriptors) -> Matches:
        return match(query, train, knn=config.knn)

    return run
