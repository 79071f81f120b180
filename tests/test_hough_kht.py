"""Hough KHT tests."""
import os

import numpy as np
import jax.numpy as jnp

from compv_tpu.core.config import HoughConfig
from compv_tpu.features import hough_kht


class TestKHT:
    def test_detects_line_segments(self):
        edges = np.zeros((128, 128), np.uint8)
        edges[30, 20:100] = 255          # horizontal segment
        edges[20:110, 80] = 255          # vertical segment
        lines, gs = hough_kht.hough_lines_kht(
            jnp.asarray(edges), HoughConfig(threshold=20, max_lines=8))
        n = int(lines.count)
        assert n >= 2
        rho = np.asarray(lines.rho)[:n]
        theta = np.asarray(lines.theta)[:n]
        has_h = any(abs(t - np.pi / 2) < 0.1 and abs(r - 30) <= 2
                    for r, t in zip(rho, theta))
        has_v = any((abs(t) < 0.1 or abs(t - np.pi) < 0.1) and abs(abs(r) - 80) <= 2
                    for r, t in zip(rho, theta))
        assert has_h and has_v
        assert float(gs) > 0

    def test_diagonal_line(self):
        edges = np.zeros((96, 96), np.uint8)
        for i in range(10, 86):
            edges[i, i] = 255            # 45-degree line y=x
        lines, _ = hough_kht.hough_lines_kht(
            jnp.asarray(edges), HoughConfig(threshold=10, max_lines=4))
        n = int(lines.count)
        assert n >= 1
        t = float(lines.theta[0])
        # normal of y=x is at 135 degrees (3*pi/4); rho ~ 0
        assert abs(t - 3 * np.pi / 4) < 0.1
        assert abs(float(lines.rho[0])) < 3

    def test_degenerate_thin_maps(self):
        """Maps thinner than one 16-px tile (ty or tx == 0) must return
        zero lines, on both dispatch paths (caught on-chip round 4: the
        (8, 128) shape built an empty tile grid and crashed both the
        run-table and the binsum formulation)."""
        import os
        cfg = HoughConfig(threshold=20, max_lines=8)
        for shp in [(8, 128), (128, 8), (4, 4), (16, 16)]:
            e = jnp.zeros(shp, jnp.uint8)
            old = os.environ.get("COMPV_TPU_PALLAS")
            for mode in ("0", "interpret"):
                os.environ["COMPV_TPU_PALLAS"] = mode
                try:
                    lines, _ = hough_kht.hough_lines_kht(e, cfg)
                    assert int(lines.count) == 0, (shp, mode)
                finally:
                    if old is None:
                        os.environ.pop("COMPV_TPU_PALLAS", None)
                    else:
                        os.environ["COMPV_TPU_PALLAS"] = old

    def test_empty(self):
        edges = np.zeros((64, 64), np.uint8)
        lines, gs = hough_kht.hough_lines_kht(jnp.asarray(edges),
                                              HoughConfig(threshold=5))
        assert int(lines.count) == 0

    def test_noise_votes_weaker_than_segments(self):
        rng = np.random.default_rng(0)
        edges = np.zeros((128, 128), np.uint8)
        # scattered noise: 200 random single pixels
        ys, xs = rng.integers(0, 128, 200), rng.integers(0, 128, 200)
        edges[ys, xs] = 255
        edges[64, 10:120] = 255          # one strong segment
        lines, _ = hough_kht.hough_lines_kht(
            jnp.asarray(edges), HoughConfig(threshold=20, max_lines=4))
        assert int(lines.count) >= 1
        # the top line is the segment
        assert abs(float(lines.theta[0]) - np.pi / 2) < 0.1
        assert abs(float(lines.rho[0]) - 64) <= 2


class TestCrossTileMerge:
    """Round-2 VERDICT item 6: strings crossing 16-px tile borders must
    vote as ONE cluster (exact global connectivity + collinear merge),
    matching the reference's global string chaining
    (houghkht.cxx:207+, linking_AppendixA)."""

    def _long_diagonals(self):
        edges = np.zeros((256, 256), np.uint8)
        for i in range(8, 248):              # 15 tiles long, 45 degrees
            edges[i, i] = 255
        for i in range(16, 240):             # second diagonal, offset
            edges[i, 255 - i] = 255
        edges[128, 8:248] = 255              # horizontal, 15 tiles
        return edges

    def test_same_line_set_as_sht(self):
        from compv_tpu.features import hough_sht
        edges = self._long_diagonals()
        cfg = HoughConfig(threshold=40, max_lines=8)
        klines, _ = hough_kht.hough_lines_kht(jnp.asarray(edges), cfg)
        slines = hough_sht.hough_lines_sht(jnp.asarray(edges),
                                           HoughConfig(threshold=100,
                                                       max_lines=8))
        kn, sn = int(klines.count), int(slines.count)
        assert sn >= 3

        def line_set(lines, m):
            return [(float(lines.rho[i]), float(lines.theta[i]))
                    for i in range(m)]

        kset = line_set(klines, kn)
        # every SHT line is found by KHT within quantization tolerance
        for sr, st_ in line_set(slines, sn):
            found = any(abs(sr - kr) <= 4 and
                        min(abs(st_ - kt), np.pi - abs(st_ - kt)) <= 0.1
                        for kr, kt in kset)
            assert found, (sr, st_, kset)

    def test_no_duplicate_split_votes(self):
        """One straight string spanning many tiles must yield exactly one
        KHT line, not per-tile fragments (nearby rho/theta duplicates)."""
        edges = np.zeros((256, 256), np.uint8)
        for i in range(8, 248):
            edges[i, i] = 255
        lines, _ = hough_kht.hough_lines_kht(
            jnp.asarray(edges), HoughConfig(threshold=20, max_lines=8))
        n = int(lines.count)
        assert n >= 1
        rho = np.asarray(lines.rho)[:n]
        theta = np.asarray(lines.theta)[:n]
        # cluster reported lines by proximity: all must collapse to 1 line
        close = 0
        for i in range(n):
            if (abs(rho[i] - rho[0]) <= 6
                    and min(abs(theta[i] - theta[0]),
                            np.pi - abs(theta[i] - theta[0])) <= 0.12):
                close += 1
        assert close == n, (rho, theta)   # no far-off spurious lines
        assert n <= 2                      # accumulator NMS may keep <=2

    def test_merged_string_outvotes_fragments(self):
        """The merged long string must vote with its FULL pixel count:
        its peak strength clearly exceeds a short segment's."""
        edges = np.zeros((256, 256), np.uint8)
        for i in range(8, 248):
            edges[i, i] = 255               # 240-px string over 15 tiles
        edges[40, 200:230] = 255            # 30-px segment inside one tile+
        lines, _ = hough_kht.hough_lines_kht(
            jnp.asarray(edges), HoughConfig(threshold=10, max_lines=8))
        n = int(lines.count)
        assert n >= 2
        s = np.asarray(lines.strength)[:n].astype(float)
        # top line is the long diagonal and dominates
        assert abs(float(lines.theta[0]) - 3 * np.pi / 4) < 0.1
        assert s[0] >= 3.0 * s[1]


class TestPieceStatsRunsParity:
    """The Pallas-path piece statistics (run-table + segmented scan,
    round 4) must agree with the binsum formulation: identical counts /
    validity / selection order, float-tolerance moments."""

    def _both(self, edges, max_clusters=128):
        import os
        old = os.environ.get("COMPV_TPU_PALLAS")
        os.environ["COMPV_TPU_PALLAS"] = "interpret"
        try:
            got = hough_kht.cluster_statistics(jnp.asarray(edges),
                                               max_clusters)
        finally:
            os.environ["COMPV_TPU_PALLAS"] = "0"
        try:
            want = hough_kht.cluster_statistics(jnp.asarray(edges),
                                                max_clusters)
        finally:
            if old is None:
                os.environ.pop("COMPV_TPU_PALLAS", None)
            else:
                os.environ["COMPV_TPU_PALLAS"] = old
        return got, want

    def test_parity_on_segments(self):
        rng = np.random.default_rng(7)
        edges = np.zeros((96, 128), np.uint8)
        edges[30, 8:100] = 1
        edges[10:90, 64] = 1
        for i in range(12, 80):
            edges[i, i + 20] = 1
        edges |= (rng.random((96, 128)) < 0.01)
        (c1, m1, v1, ok1), (c2, m2, v2, ok2) = self._both(edges)
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
        np.testing.assert_array_equal(np.asarray(ok1), np.asarray(ok2))
        sel = np.asarray(ok1)
        np.testing.assert_allclose(np.asarray(m1)[sel], np.asarray(m2)[sel],
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(v1)[sel], np.asarray(v2)[sel],
                                   atol=1e-3)

    def test_kht_lines_match_across_paths(self):
        import os
        edges = np.zeros((128, 160), np.uint8)
        edges[40, 10:150] = 1
        for i in range(8, 120):
            edges[i, i + 10] = 1
        cfg = HoughConfig(threshold=15, max_lines=6)
        old = os.environ.get("COMPV_TPU_PALLAS")
        os.environ["COMPV_TPU_PALLAS"] = "interpret"
        try:
            l1, g1 = hough_kht.hough_lines_kht(jnp.asarray(edges), cfg)
        finally:
            os.environ["COMPV_TPU_PALLAS"] = "0"
        try:
            l2, g2 = hough_kht.hough_lines_kht(jnp.asarray(edges), cfg)
        finally:
            if old is None:
                os.environ.pop("COMPV_TPU_PALLAS", None)
            else:
                os.environ["COMPV_TPU_PALLAS"] = old
        n1, n2 = int(l1.count), int(l2.count)
        assert n1 == n2
        r1 = sorted(zip(np.asarray(l1.rho)[:n1], np.asarray(l1.theta)[:n1]))
        r2 = sorted(zip(np.asarray(l2.rho)[:n2], np.asarray(l2.theta)[:n2]))
        for (ra, ta), (rb, tb) in zip(r1, r2):
            assert abs(ra - rb) <= 1.5 and abs(ta - tb) < 0.05, (r1, r2)


class TestTileLabelKernel:
    def test_pallas_matches_xla_loop(self):
        """kernels/kht_label.py must reproduce the XLA fori_loop labels
        bit-for-bit (same synchronous update, same iteration count)."""
        from compv_tpu.features.hough_kht import _tile_local_label
        rng = np.random.default_rng(11)
        # width NOT a multiple of 128 tiles -> exercises lane padding
        binary = jnp.asarray(
            (rng.random((80, 208)) < 0.15).astype(np.uint8) * 255)
        tile, ty, tx = 16, 5, 13
        old = os.environ.get("COMPV_TPU_PALLAS")
        os.environ["COMPV_TPU_PALLAS"] = "interpret"
        try:
            got = _tile_local_label(binary, tile, ty, tx, 15)
        finally:
            os.environ["COMPV_TPU_PALLAS"] = "0"
        try:
            want = _tile_local_label(binary, tile, ty, tx, 15)
        finally:
            if old is None:
                os.environ.pop("COMPV_TPU_PALLAS", None)
            else:
                os.environ["COMPV_TPU_PALLAS"] = old
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
