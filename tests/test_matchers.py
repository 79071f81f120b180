"""Brute-force hamming matcher tests vs NumPy popcount oracle."""
import numpy as np
import jax.numpy as jnp

from compv_tpu.core.types import Descriptors
from compv_tpu.matchers import bruteforce
from tests.reference import ref_ops


def _mk_desc(rng, n, valid=None):
    bits = rng.integers(0, 2 ** 32, size=(n, 8), dtype=np.uint64).astype(np.uint32)
    return Descriptors(bits=jnp.asarray(bits),
                       count=jnp.asarray(n if valid is None else valid, jnp.int32)), bits


class TestHamming:
    def test_distance_matrix_exact(self):
        rng = np.random.default_rng(0)
        q, qb = _mk_desc(rng, 33)
        t, tb = _mk_desc(rng, 57)
        ours = np.asarray(bruteforce.hamming_matrix(q, t))
        ref = ref_ops.hamming_distance_matrix(qb, tb)
        np.testing.assert_array_equal(ours, ref)

    def test_knn2_orders_distances(self):
        rng = np.random.default_rng(1)
        q, _ = _mk_desc(rng, 20)
        t, _ = _mk_desc(rng, 40)
        m = bruteforce.match(q, t, knn=2)
        d = np.asarray(m.distance)
        assert (d[:, 0] <= d[:, 1]).all()

    def test_identical_descriptor_matches_self(self):
        rng = np.random.default_rng(2)
        t, tb = _mk_desc(rng, 30)
        q = Descriptors(bits=jnp.asarray(tb[:10]), count=jnp.asarray(10, jnp.int32))
        m = bruteforce.match(q, t, knn=1)
        np.testing.assert_array_equal(np.asarray(m.train_idx)[:, 0], np.arange(10))
        assert (np.asarray(m.distance)[:, 0] == 0).all()

    def test_padded_train_never_matches(self):
        rng = np.random.default_rng(3)
        t, tb = _mk_desc(rng, 30, valid=5)  # only 5 live train rows
        q = Descriptors(bits=jnp.asarray(tb[10:20]), count=jnp.asarray(10, jnp.int32))
        m = bruteforce.match(q, t, knn=1)
        assert (np.asarray(m.train_idx)[:, 0] < 5).all()

    def test_lowe_ratio(self):
        rng = np.random.default_rng(4)
        t, tb = _mk_desc(rng, 30)
        q = Descriptors(bits=jnp.asarray(tb[:8]), count=jnp.asarray(8, jnp.int32))
        m = bruteforce.match(q, t, knn=2)
        mask = np.asarray(bruteforce.lowe_ratio_mask(m, 0.75))
        assert mask[:8].all()  # exact self matches: d0=0 << d1

    def test_cross_check(self):
        rng = np.random.default_rng(5)
        t, tb = _mk_desc(rng, 16)
        fwd = bruteforce.match(t, t, knn=1)
        bwd = bruteforce.match(t, t, knn=1)
        mask = np.asarray(bruteforce.cross_check_mask(fwd, bwd))
        assert mask.all()
