"""Parity: the Pallas segmented multi-stat scan (kernels/seg_scan.py) vs
the associative_scan reference formulation (features/ccl._seg_scan_multi),
interpret mode on CPU. Stats are integer-valued f32, so results must be
EXACT regardless of combine order."""
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


def _xla_ref(sums, mins, maxs, new):
    old = os.environ["COMPV_TPU_PALLAS"]
    os.environ["COMPV_TPU_PALLAS"] = "0"
    try:
        from compv_tpu.features.ccl import _seg_scan_multi
        return _seg_scan_multi(sums, mins, maxs, new)
    finally:
        os.environ["COMPV_TPU_PALLAS"] = old


def _case(n, seg_mean, seed, ns=3, nm=2, nx=2):
    rng = np.random.default_rng(seed)
    new = rng.random(n) < 1.0 / max(seg_mean, 1)
    sums = tuple(rng.integers(-50, 50, n).astype(np.float32)
                 for _ in range(ns))
    mins = tuple(rng.integers(-1000, 1000, n).astype(np.float32)
                 for _ in range(nm))
    maxs = tuple(rng.integers(-1000, 1000, n).astype(np.float32)
                 for _ in range(nx))
    return (tuple(jnp.asarray(s) for s in sums),
            tuple(jnp.asarray(s) for s in mins),
            tuple(jnp.asarray(s) for s in maxs), jnp.asarray(new))


def _assert_parity(n, seg_mean, seed, **kw):
    from compv_tpu.kernels.seg_scan import seg_scan_multi
    sums, mins, maxs, new = _case(n, seg_mean, seed, **kw)
    got = seg_scan_multi(sums, mins, maxs, new)
    want = _xla_ref(sums, mins, maxs, new)
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w),
                                      err_msg=f"stat {i}")


class TestSegScanParity:
    def test_single_chunk(self):
        _assert_parity(32768, 37, 0)

    def test_multi_chunk_carry(self):
        """Segments crossing both row (lane-128) and chunk (32k)
        boundaries exercise the level-2 scan and the SMEM carry."""
        _assert_parity(3 * 32768, 1000, 1)

    def test_unaligned_length(self):
        _assert_parity(70001, 11, 2)

    def test_one_giant_segment(self):
        """No boundary at all: everything accumulates from element 0
        through every carry hop."""
        from compv_tpu.kernels.seg_scan import seg_scan_multi
        n = 2 * 32768
        sums, mins, maxs, _ = _case(n, 10, 3)
        new = jnp.zeros((n,), bool)
        got = seg_scan_multi(sums, mins, maxs, new)
        want = _xla_ref(sums, mins, maxs, new)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

    def test_every_element_new(self):
        from compv_tpu.kernels.seg_scan import seg_scan_multi
        n = 32768
        sums, mins, maxs, _ = _case(n, 10, 4)
        new = jnp.ones((n,), bool)
        got = seg_scan_multi(sums, mins, maxs, new)
        for g, w in zip(got, sums + mins + maxs):
            np.testing.assert_array_equal(np.asarray(g),
                                          np.asarray(w, dtype=np.float32))

    def test_mser_shape(self):
        """MSER carries 3 sums + 2 mins + 2 maxs (7 stats)."""
        _assert_parity(16384, 23, 5, ns=3, nm=2, nx=2)

    def test_ccl_shape(self):
        """CCL extract carries 6 sums + 2 mins + 2 maxs (10 stats)."""
        _assert_parity(65536, 9, 6, ns=6, nm=2, nx=2)
