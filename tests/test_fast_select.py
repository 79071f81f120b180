"""Parity tests for the fused FAST selection+placement kernel
(kernels/select_place.py) against lax.top_k's exact tie semantics,
interpret mode on CPU.

The hard case (round-3 advisor finding): under nms_spaced the key map is
2x2 min-pooled, so one pooled row interleaves two original rows — a tie at
pooled column 0 can have a LARGER flat index than a tie at pooled column 1.
The kernel must rank cutoff-1 ties by flat index (lax.top_k's order), not
by pooled position. Maps here are built so ties straddle the budget and
the positional-vs-flat inversion actually occurs.
"""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp


@pytest.fixture(scope="module", autouse=True)
def _force_interpret():
    old = os.environ.get("COMPV_TPU_PALLAS")
    os.environ["COMPV_TPU_PALLAS"] = "interpret"
    yield
    if old is None:
        os.environ.pop("COMPV_TPU_PALLAS", None)
    else:
        os.environ["COMPV_TPU_PALLAS"] = old


from compv_tpu.features import fast


def _ref_topk(s_np, k):
    """lax.top_k over the flat map: values desc, ties by ascending index."""
    vals, idx = jax.lax.top_k(
        jnp.asarray(s_np).reshape(-1).astype(jnp.float32), k)
    return np.asarray(vals), np.asarray(idx)


def _run_cutoff(s_np, k, nms_spaced):
    keys = np.asarray(fast._cutoff_select(jnp.asarray(s_np), k, nms_spaced))
    return 255 - (keys >> 22), keys & ((1 << 22) - 1)


def _assert_topk_parity(s_np, k, nms_spaced):
    want_v, want_i = _ref_topk(s_np, k)
    got_v, got_i = _run_cutoff(s_np, k, nms_spaced)
    live = want_v > 0      # zero-strength tail is PAD for us, arbitrary idx
    np.testing.assert_array_equal(got_v[live], want_v[live].astype(np.int64))
    np.testing.assert_array_equal(got_i[live], want_i[live])
    assert np.all(got_v[~live] == 0)


def _spaced_tie_map(h, w, n_ties, n_strict, tie_val=10, seed=0):
    """<=1 nonzero per 2x2 block (the nms_spaced precondition), with the
    tie population split across even/odd original rows so pooled-column
    order disagrees with flat-index order inside most pooled rows."""
    rng = np.random.default_rng(seed)
    s = np.zeros((h, w), np.uint8)
    blocks = [(i, j) for i in range(h // 2) for j in range(w // 2)]
    rng.shuffle(blocks)
    for t, (i, j) in enumerate(blocks[:n_ties]):
        # alternate parity with a column-dependent twist: within one
        # pooled row both orders occur
        s[2 * i + (t + j) % 2, 2 * j + t % 2] = tie_val
    for t, (i, j) in enumerate(blocks[n_ties:n_ties + n_strict]):
        s[2 * i + t % 2, 2 * j] = 200 - (t % 40)
    return s


class TestSpacedTieCut:
    def test_inversion_minimal(self):
        """Deterministic inversion: in pooled row 0, the odd-row tie sits
        at pooled col 0 and the even-row tie at pooled col 1; flat order
        is the reverse. Budget of 1 tie must keep the even-row one."""
        h, w = 16, 64
        s = np.zeros((h, w), np.uint8)
        s[1, 0] = 10     # flat idx w      (pooled col 0)
        s[0, 2] = 10     # flat idx 2      (pooled col 1) — flat-first
        s[8, 8] = 99     # one strict corner
        _assert_topk_parity(s, k=2, nms_spaced=True)

    @pytest.mark.parametrize("k", [8, 20, 33, 47, 64, 100])
    def test_budget_straddles_ties(self, k):
        s = _spaced_tie_map(64, 96, n_ties=40, n_strict=12, seed=1)
        _assert_topk_parity(s, k, nms_spaced=True)

    def test_more_budget_than_nonzeros(self):
        s = _spaced_tie_map(32, 64, n_ties=10, n_strict=3, seed=2)
        _assert_topk_parity(s, k=200, nms_spaced=True)

    def test_multi_tile_rows(self):
        """Pooled map spans >1 row tile so the SMEM accumulator carries
        the tie prefix across sequential grid steps."""
        s = _spaced_tie_map(300, 96, n_ties=120, n_strict=30, seed=3)
        _assert_topk_parity(s, k=90, nms_spaced=True)

    def test_multi_chunk_smem_carry(self):
        """Flat layout exceeds one kernel chunk (1536 rows of 128) so
        BOTH SMEM carries run: the cross-chunk tie prefix and the output
        block offset."""
        s = _spaced_tie_map(1600, 256, n_ties=200, n_strict=60, seed=6)
        _assert_topk_parity(s, k=150, nms_spaced=True)

    @pytest.mark.parametrize("k", [5, 17, 40])
    def test_unpooled_ties(self, k):
        rng = np.random.default_rng(4)
        s = np.zeros((48, 80), np.uint8)
        pos = rng.choice(48 * 80, 60, replace=False)
        s.reshape(-1)[pos[:45]] = 7                # one big tie class
        s.reshape(-1)[pos[45:]] = rng.integers(20, 200, 15)
        _assert_topk_parity(s, k, nms_spaced=False)

    def test_matches_xla_fallback(self):
        s = _spaced_tie_map(64, 96, n_ties=40, n_strict=12, seed=5)
        got = _run_cutoff(s, 30, nms_spaced=True)
        old = os.environ["COMPV_TPU_PALLAS"]
        os.environ["COMPV_TPU_PALLAS"] = "0"
        try:
            want = _run_cutoff(s, 30, nms_spaced=True)
        finally:
            os.environ["COMPV_TPU_PALLAS"] = old
        np.testing.assert_array_equal(got[0], want[0])
        live = want[0] > 0
        np.testing.assert_array_equal(got[1][live], want[1][live])
