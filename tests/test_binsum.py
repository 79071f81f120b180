"""Factored one-hot matmul bincount (ops/binsum.py) — exactness vs
numpy bincount, including out-of-range drop semantics, weights, batching,
and the LUT apply (reference analogues: accumulator builds in
base/math/compv_math_histogram.cxx and
core/features/hough/compv_core_feature_houghsht.cxx voting)."""
import numpy as np
import jax.numpy as jnp
import pytest

from compv_tpu.ops import binsum


@pytest.mark.parametrize("n_bins", [7, 256, 1000, 2943, 4096])
def test_bincount_exact(n_bins):
    rng = np.random.default_rng(n_bins)
    idx = rng.integers(-3, n_bins + 7, 20000).astype(np.int32)
    got = np.asarray(binsum.bincount(jnp.asarray(idx), n_bins))
    ref = np.bincount(idx[(idx >= 0) & (idx < n_bins)], minlength=n_bins)
    assert got.dtype == np.int32
    np.testing.assert_array_equal(got, ref)


def test_bincount_weighted():
    rng = np.random.default_rng(1)
    idx = rng.integers(0, 300, 8192).astype(np.int32)
    w = rng.normal(size=8192).astype(np.float32)
    got = np.asarray(binsum.bincount(jnp.asarray(idx), 256, jnp.asarray(w)))
    m = idx < 256
    ref = np.zeros(256, np.float64)
    np.add.at(ref, idx[m], w[m].astype(np.float64))
    np.testing.assert_allclose(got, ref, atol=1e-3)


def test_bincount_integer_weights_exact():
    # integer-valued f32 weights below 2^24: sums are exact
    rng = np.random.default_rng(2)
    idx = rng.integers(0, 64, 4096).astype(np.int32)
    w = rng.integers(0, 100, 4096).astype(np.float32)
    got = np.asarray(binsum.bincount(jnp.asarray(idx), 64, jnp.asarray(w)))
    ref = np.bincount(idx, weights=w, minlength=64)
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("weighted", [False, True])
def test_bincount_batched(weighted):
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 530, (9, 5000)).astype(np.int32)
    w = rng.normal(size=idx.shape).astype(np.float32) if weighted else None
    got = np.asarray(binsum.bincount_batched(
        jnp.asarray(idx), 512, None if w is None else jnp.asarray(w)))
    assert got.shape == (9, 512)
    for b in range(9):
        m = idx[b] < 512
        if weighted:
            ref = np.zeros(512, np.float64)
            np.add.at(ref, idx[b][m], w[b][m].astype(np.float64))
            np.testing.assert_allclose(got[b], ref, atol=1e-3)
        else:
            ref = np.bincount(idx[b][m], minlength=512)
            np.testing.assert_array_equal(got[b], ref)


def test_apply_lut256_any_lut():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (33, 41), np.uint8)
    lut = rng.permutation(256).astype(np.uint8)   # wildly non-monotone
    got = np.asarray(binsum.apply_lut256(jnp.asarray(img), jnp.asarray(lut)))
    np.testing.assert_array_equal(got, lut[img])
