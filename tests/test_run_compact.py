"""Parity: Pallas run-table compaction (kernels/run_compact.py) vs the
XLA full-map sentinel sort (features/ccl._sorted_run_table), interpret
mode on CPU. Both sides are stable within equal roots (flat order = start
ascending), so outputs must match elementwise including sentinels."""
import os

import numpy as np
import pytest
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


def _labels_from_mask(mask):
    """A labeling consistent with ccl semantics: every fg pixel carries
    its component root (min flat index); bg pixels carry n. For run-table
    parity the exact labeling need not be connectivity-correct — it only
    must map each pixel to SOME root id < n, constant per region."""
    from compv_tpu.features import ccl
    old = os.environ["COMPV_TPU_PALLAS"]
    os.environ["COMPV_TPU_PALLAS"] = "0"
    try:
        return ccl.label_scan(jnp.asarray(mask.astype(np.uint8)))
    finally:
        os.environ["COMPV_TPU_PALLAS"] = old


def _both(labels, max_runs):
    from compv_tpu.features.ccl import _sorted_run_table
    got = _sorted_run_table(labels, max_runs)
    old = os.environ["COMPV_TPU_PALLAS"]
    os.environ["COMPV_TPU_PALLAS"] = "0"
    try:
        want = _sorted_run_table(labels, max_runs)
    finally:
        os.environ["COMPV_TPU_PALLAS"] = old
    return got, want


def _assert_equal(got, want):
    names = ("g_root", "g_s", "g_e", "run_count")
    for g, w, nm in zip(got, want, names):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w),
                                      err_msg=nm)


class TestRunCompactParity:
    def test_random_blobs(self):
        rng = np.random.default_rng(0)
        mask = rng.random((64, 100)) < 0.45
        labels = _labels_from_mask(mask)
        _assert_equal(*_both(labels, 4096))

    def test_dense_text_like(self):
        yy, xx = np.mgrid[0:96, 0:130]
        mask = ((yy // 3) % 3 != 0) & ((xx // 2 + (yy // 7) * 3) % 5 < 2)
        labels = _labels_from_mask(mask)
        _assert_equal(*_both(labels, 8192))

    def test_full_rows_and_width_runs(self):
        """Runs spanning the entire width stress the forward halo."""
        mask = np.zeros((40, 120), bool)
        mask[3] = True
        mask[7, :60] = True
        mask[7, 61:] = True
        mask[39] = True                       # last row, full width
        labels = _labels_from_mask(mask)
        _assert_equal(*_both(labels, 1024))

    def test_empty_and_single_pixels(self):
        labels = _labels_from_mask(np.zeros((32, 64), bool))
        _assert_equal(*_both(labels, 512))
        mask = np.zeros((32, 64), bool)
        mask[0, 0] = mask[31, 63] = mask[5, 20] = True
        labels = _labels_from_mask(mask)
        _assert_equal(*_both(labels, 512))

    def test_chunk_boundary_runs(self):
        """A map tall enough for several 64-row flat chunks; alternating
        columns maximize run count (worst-case density)."""
        rng = np.random.default_rng(3)
        mask = np.zeros((220, 120), bool)
        mask[:, ::2] = True                   # 1-px runs, w/2 per row
        mask &= rng.random((220, 120)) < 0.95
        labels = _labels_from_mask(mask)
        _assert_equal(*_both(labels, 16384))

    def test_overflow_flagged(self):
        """More runs than max_runs: run_count must still report the true
        count on both paths (results beyond capacity are unspecified)."""
        mask = np.zeros((64, 120), bool)
        mask[:, ::2] = True
        labels = _labels_from_mask(mask)
        got, want = _both(labels, 512)
        assert int(got[3]) == int(want[3])
        assert int(got[3]) > 512

    def test_extract_components_end_to_end(self):
        """Full extract_components parity across dispatch paths (also
        covers the Pallas segmented scan integration)."""
        from compv_tpu.features import ccl
        yy, xx = np.mgrid[0:80, 0:110]
        mask = ((yy // 4 + xx // 6) % 3 != 0)
        labels = _labels_from_mask(mask)
        got = ccl.extract_components(labels, 64, max_runs=8192)
        old = os.environ["COMPV_TPU_PALLAS"]
        os.environ["COMPV_TPU_PALLAS"] = "0"
        try:
            want = ccl.extract_components(labels, 64, max_runs=8192)
        finally:
            os.environ["COMPV_TPU_PALLAS"] = old
        for f in got._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(got, f)), np.asarray(getattr(want, f)),
                err_msg=f)


class TestTopkByArea:
    """_topk_by_area must be bit-identical to lax.top_k (value desc,
    index asc ties) on integer-valued f32 keys — including the big-area
    branch (> k components at the 255 clamp) and on both dispatch
    paths."""

    def _oracle(self, key, k):
        import jax
        v, p = jax.lax.top_k(jnp.asarray(key), k)
        return np.asarray(v), np.asarray(p)

    def _check(self, key, k, n_px):
        from compv_tpu.features.ccl import _topk_by_area
        key_j = jnp.asarray(key)
        for mode in ("interpret", "0"):
            old = os.environ["COMPV_TPU_PALLAS"]
            os.environ["COMPV_TPU_PALLAS"] = mode
            try:
                va, pa = _topk_by_area(key_j, k, n_px)
            finally:
                os.environ["COMPV_TPU_PALLAS"] = old
            vo, po = self._oracle(key, k)
            np.testing.assert_array_equal(np.asarray(va), vo, err_msg=mode)
            sel = vo > 0
            np.testing.assert_array_equal(np.asarray(pa)[sel], po[sel],
                                          err_msg=mode)

    def test_small_areas_with_ties(self):
        rng = np.random.default_rng(11)
        key = np.zeros(1024, np.float32)
        ends = rng.choice(1024, 300, replace=False)
        key[ends] = rng.integers(1, 60, 300)
        self._check(key, 64, 64 * 64)

    def test_clamp_bucket_below_k(self):
        key = np.zeros(512, np.float32)
        key[10] = 300.0
        key[100] = 500.0
        key[200:240] = np.arange(40) + 5.0
        self._check(key, 16, 100_000)

    def test_big_branch_orders_by_true_area(self):
        # 40 components all >= 255 px, k = 8: the cutoff lands inside the
        # clamp bucket and the selection must rank by TRUE area
        rng = np.random.default_rng(3)
        key = np.zeros(2048, np.float32)
        pos = rng.choice(2048, 40, replace=False)
        key[pos] = rng.permutation(40) * 37 + 260.0
        self._check(key, 8, 1_000_000)

    def test_big_branch_equal_areas_tie_by_index(self):
        key = np.zeros(1024, np.float32)
        key[13:973:40] = 400.0     # 24 equal big components
        self._check(key, 6, 500_000)
