"""Tracing utility + misc op tests (gamma)."""
import numpy as np
import jax.numpy as jnp

from compv_tpu.core import trace
from compv_tpu.ops import histogram


class TestTrace:
    def test_span_and_report(self):
        trace.reset()
        with trace.span("op_a"):
            _ = jnp.sum(jnp.arange(100))
        with trace.span("op_a"):
            pass
        with trace.span("op_b"):
            pass
        rows = trace.table()
        names = {r[0]: r for r in rows}
        assert names["op_a"][1] == 2
        assert names["op_b"][1] == 1
        assert "op_a" in trace.report()
        trace.reset()
        assert trace.table() == []


class TestGamma:
    def test_identity(self, rng):
        img = jnp.asarray(rng.integers(0, 256, (16, 16), np.uint8))
        out = histogram.gamma_correct(img, 1.0)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(img))

    def test_matches_numpy(self, rng):
        img = rng.integers(0, 256, (20, 20), dtype=np.uint8)
        out = histogram.gamma_correct(jnp.asarray(img), 0.5)
        want = np.clip(np.round(255.0 * (img / 255.0) ** 0.5), 0, 255)
        np.testing.assert_allclose(np.asarray(out), want, atol=1)
