"""Scalar-oracle parity for every remaining integer-exact kernel
(round-2 VERDICT item 4): each vectorized TPU formulation must reproduce
an INDEPENDENT NumPy scalar formulation exactly — the analogue of the
reference's scalar-C++-vs-ASM sweep (unittests/main.cxx:89-94).
Fixed-point color coefficients transcribed from the reference's tables
(compv_image_conv_rgbfamily.cxx, compv_image_conv_to_rgbx.cxx,
compv_image_conv_hsv.cxx); see tests/reference/ref_ops.py.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from compv_tpu.features import ccl, hough_sht
from compv_tpu.ops import color, morphology
from tests.reference import ref_ops


class TestColorOracles:
    def test_rgb_to_yuv444_exact(self, rgb_image):
        y, u, v = color.rgb_to_yuv444(jnp.asarray(rgb_image))
        ry, ru, rv = ref_ops.rgb_to_yuv444(rgb_image)
        np.testing.assert_array_equal(np.asarray(y), ry)
        np.testing.assert_array_equal(np.asarray(u), ru)
        np.testing.assert_array_equal(np.asarray(v), rv)

    def test_yuv444_to_rgb_exact(self, rng):
        y = rng.integers(0, 256, (64, 80), np.uint8)
        u = rng.integers(0, 256, (64, 80), np.uint8)
        v = rng.integers(0, 256, (64, 80), np.uint8)
        ours = np.asarray(color.yuv444_to_rgb(
            jnp.asarray(y), jnp.asarray(u), jnp.asarray(v)))
        np.testing.assert_array_equal(ours, ref_ops.yuv444_to_rgb(y, u, v))

    def test_yuv420_to_rgb_exact(self, rng):
        y = rng.integers(0, 256, (64, 80), np.uint8)
        u = rng.integers(0, 256, (32, 40), np.uint8)
        v = rng.integers(0, 256, (32, 40), np.uint8)
        ours = np.asarray(color.yuv420_to_rgb(
            jnp.asarray(y), jnp.asarray(u), jnp.asarray(v)))
        np.testing.assert_array_equal(ours, ref_ops.yuv420_to_rgb(y, u, v))

    def test_rgb_to_hsv_exact(self, rgb_image):
        ours = np.asarray(color.rgb_to_hsv(jnp.asarray(rgb_image)))
        ref = ref_ops.rgb_to_hsv(rgb_image)
        np.testing.assert_array_equal(ours, ref)

    def test_rgb_to_hsv_extremes(self):
        """Gray pixels (minus=0), black (max=0), saturated channels, and
        the negative-diff wraparound all hit the u8 wrap paths."""
        px = np.array([[[7, 7, 7], [0, 0, 0], [255, 0, 0], [0, 255, 0],
                        [0, 0, 255], [10, 250, 240], [250, 10, 240],
                        [1, 2, 3], [3, 2, 1], [128, 127, 129]]], np.uint8)
        ours = np.asarray(color.rgb_to_hsv(jnp.asarray(px)))
        np.testing.assert_array_equal(ours, ref_ops.rgb_to_hsv(px))


class TestMorphologyOracles:
    @pytest.mark.parametrize("kind", ["rect", "cross", "ellipse"])
    @pytest.mark.parametrize("op", ["erode", "dilate"])
    def test_exact(self, rng, kind, op):
        img = (rng.integers(0, 2, (48, 64)) * 255).astype(np.uint8)
        strel = morphology.structuring_element(kind, 5, 3)
        ours = np.asarray(getattr(morphology, op)(jnp.asarray(img), strel))
        np.testing.assert_array_equal(ours,
                                      getattr(ref_ops, op)(img, strel))

    def test_grayscale_morphology_exact(self, rng):
        img = rng.integers(0, 256, (32, 48), np.uint8)
        strel = morphology.structuring_element("cross", 3, 3)
        np.testing.assert_array_equal(
            np.asarray(morphology.erode(jnp.asarray(img), strel)),
            ref_ops.erode(img, strel))


class TestCclOracles:
    def test_components_exact(self, rng):
        img = (rng.random((40, 56)) < 0.35).astype(np.uint8)
        comps_ref, runs_ref = ref_ops.ccl_components(img, 8)
        labels = ccl.label(jnp.asarray(img))
        comps = ccl.extract_components(labels, max_components=256,
                                       max_runs=4096)
        n = int(comps.count)
        assert n == len(comps_ref)
        ours = {}
        for i in range(n):
            ours[int(comps.roots[i])] = dict(
                area=int(comps.areas[i]),
                box=tuple(int(x) for x in np.asarray(comps.boxes[i])),
                mom=np.asarray(comps.moments[i]),
            )
        assert set(ours) == set(comps_ref)
        for r, c in comps_ref.items():
            o = ours[r]
            assert o["area"] == c["area"]
            assert o["box"] == (c["x0"], c["y0"], c["x1"], c["y1"])
            np.testing.assert_allclose(
                o["mom"],
                [c["area"], c["sx"], c["sy"], c["sxx"], c["sxy"],
                 c["syy"]], rtol=1e-6)

    def test_runs_exact(self, rng):
        img = (rng.random((24, 40)) < 0.4).astype(np.uint8)
        _, runs_ref = ref_ops.ccl_components(img, 8)
        labels = ccl.label(jnp.asarray(img))
        runs = ccl.extract_runs(labels, max_runs=1024)
        n = int(runs.count)
        assert n == len(runs_ref)
        got = [(int(runs.y[i]), int(runs.x0[i]), int(runs.x1[i]),
                int(runs.root[i])) for i in range(n)]
        assert got == runs_ref


class TestShtOracle:
    def test_accumulator_votes_exact(self):
        edges = np.zeros((48, 64), np.uint8)
        edges[10, 5:60] = 255
        edges[5:45, 33] = 255
        for i in range(6, 40):
            edges[i, i + 3] = 255
        n_theta = 90
        acc_ref = ref_ops.sht_accumulator(edges, 1.0, n_theta)
        # drive our accumulator through the same voting path by inlining
        # the vote stage (hough_lines_sht keeps it internal)
        from compv_tpu.ops import binsum
        h, w = edges.shape
        diag = float(np.hypot(h, w))
        n_rho = int(2 * np.ceil(diag / 1.0)) + 1
        thetas = jnp.asarray(
            np.arange(n_theta, dtype=np.float32) * (np.pi / n_theta))
        xy, valid = hough_sht.edge_coordinates(jnp.asarray(edges), 4096)
        rho = xy[:, 0:1] * jnp.cos(thetas)[None] \
            + xy[:, 1:2] * jnp.sin(thetas)[None]
        ri = jnp.round(rho).astype(jnp.int32) + n_rho // 2
        ri = jnp.clip(ri, 0, n_rho - 1)
        ri = jnp.where(valid[:, None], ri, n_rho)
        acc = binsum.bincount_batched(ri.T, n_rho).T
        np.testing.assert_array_equal(np.asarray(acc), acc_ref)


class TestHogOracle:
    def test_cell_histograms_close(self, rng):
        from compv_tpu.features import hog as hog_mod
        img = rng.integers(0, 256, (32, 40), np.uint8)
        ours = np.asarray(hog_mod._cell_histograms(
            jnp.asarray(img), 8, 9, False))
        ref = ref_ops.hog_cell_histograms(img, 8, 9, False)
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-3)


class TestBriefOracle:
    def test_descriptor_bits_exact(self, rng):
        from compv_tpu.core.types import Points
        from compv_tpu.features import brief
        img = rng.integers(0, 256, (64, 80), np.uint8)
        n = 24
        xy = np.stack([rng.uniform(18, 60, n),
                       rng.uniform(18, 45, n)], 1).astype(np.float32)
        ang = rng.uniform(-np.pi, np.pi, n).astype(np.float32)
        pts = Points(xy=jnp.asarray(xy), strength=jnp.ones((n,)),
                     angle=jnp.asarray(ang),
                     level=jnp.zeros((n,), jnp.int32),
                     size=jnp.full((n,), 7.0), count=jnp.asarray(n))
        pa, pb = brief.brief_pattern(256, 31, pattern="learned")
        for method in ("gather", "patch"):
            ours = np.asarray(brief.describe(
                jnp.asarray(img), pts, method=method,
                pattern="learned").bits)
            ref = ref_ops.brief_describe(img, xy, ang, pa, pb)
            np.testing.assert_array_equal(ours, ref)
