"""Butterfly stream compaction (ops/compaction.py) — order-preserving
exactness vs numpy nonzero, row and global forms, overflow truncation."""
import numpy as np
import jax.numpy as jnp
import pytest

from compv_tpu.ops import compaction


@pytest.mark.parametrize("shape,density", [((8, 16), 0.3), ((33, 180), 0.05),
                                           ((4, 128), 0.9), ((7, 100), 0.0)])
def test_compact_rows(shape, density):
    rng = np.random.default_rng(shape[1])
    valid = rng.random(shape) < density
    vals = rng.integers(0, 1000, shape).astype(np.int32)
    (out,), counts = compaction.compact_rows(
        jnp.asarray(valid), (jnp.asarray(vals),))
    out, counts = np.asarray(out), np.asarray(counts)
    for r in range(shape[0]):
        ref = vals[r][valid[r]]
        assert counts[r] == len(ref)
        np.testing.assert_array_equal(out[r, : len(ref)], ref)


@pytest.mark.parametrize("cap", [16, 100, 5000])
def test_compact_global(cap):
    rng = np.random.default_rng(cap)
    h, w = 40, 180
    valid = rng.random((h, w)) < 0.1
    a = rng.integers(0, 99, (h, w)).astype(np.int32)
    b = rng.normal(size=(h, w)).astype(np.float32)
    (oa, ob), ok, total = compaction.compact(
        jnp.asarray(valid), (jnp.asarray(a), jnp.asarray(b)), cap)
    oa, ob, ok = np.asarray(oa), np.asarray(ob), np.asarray(ok)
    ref_a = a[valid]              # row-major scan order
    ref_b = b[valid]
    n = min(cap, len(ref_a))
    assert int(total) == len(ref_a)
    assert ok.sum() == n
    np.testing.assert_array_equal(oa[:n], ref_a[:n])
    np.testing.assert_array_equal(ob[:n], ref_b[:n])
