"""HOG, Hough SHT, and CCL tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from compv_tpu.core.config import HogConfig, HoughConfig
from compv_tpu.features import ccl, hog as hog_mod, hough_sht


class TestHog:
    def test_descriptor_size(self):
        cfg = HogConfig()
        d = hog_mod.hog(jnp.asarray(np.zeros((64, 128), np.uint8)), cfg)
        assert d.shape[0] == hog_mod.hog_descriptor_size(64, 128, cfg)
        # standard 64x128 person window: 7x15 blocks x 36 = 3780
        assert d.shape[0] == 3780

    def test_vertical_edge_energy_in_horizontal_bin(self):
        img = np.zeros((64, 64), np.uint8)
        img[:, 32:] = 255
        cfg = HogConfig(norm="none")
        d = np.asarray(hog_mod.hog(jnp.asarray(img), cfg)).reshape(-1, 9)
        total = d.sum(0)
        # gradient along +x -> angle 0 -> bin 0 dominates
        assert total.argmax() == 0

    @pytest.mark.parametrize("norm", ["none", "l1", "l1sqrt", "l2", "l2hys"])
    def test_norms_finite(self, norm):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (32, 32), dtype=np.uint8)
        d = np.asarray(hog_mod.hog(jnp.asarray(img), HogConfig(norm=norm)))
        assert np.isfinite(d).all()
        if norm == "l2hys":
            assert d.max() <= 1.0 + 1e-5


class TestHoughSHT:
    def test_detects_horizontal_and_vertical_lines(self):
        edges = np.zeros((128, 128), np.uint8)
        edges[40, 10:120] = 255      # horizontal line y=40
        edges[10:120, 70] = 255      # vertical line x=70
        lines = hough_sht.hough_lines_sht(
            jnp.asarray(edges), HoughConfig(threshold=60, max_lines=8))
        n = int(lines.count)
        assert n >= 2
        rho = np.asarray(lines.rho)[:n]
        theta = np.asarray(lines.theta)[:n]
        # vertical line: theta ~ 0, rho ~ 70 ; horizontal: theta ~ pi/2, rho ~ 40
        has_v = any(abs(t) < 0.05 and abs(r - 70) <= 1.5 for r, t in zip(rho, theta))
        has_h = any(abs(t - np.pi / 2) < 0.05 and abs(r - 40) <= 1.5
                    for r, t in zip(rho, theta))
        assert has_v and has_h

    def test_edge_coordinates_scan_order(self):
        from compv_tpu.features.hough_sht import edge_coordinates
        from compv_tpu.ops import compaction
        rng = np.random.default_rng(3)
        e = jnp.asarray((rng.random((40, 70)) < 0.1).astype(np.uint8) * 255)
        xy, valid = edge_coordinates(e, 128)
        xs_g = np.broadcast_to(np.arange(70)[None, :], (40, 70))
        ys_g = np.broadcast_to(np.arange(40)[:, None], (40, 70))
        want_x = xs_g[np.asarray(e) > 0][:128]
        want_y = ys_g[np.asarray(e) > 0][:128]
        n = int(np.asarray(valid).sum())
        assert n == min(128, int((np.asarray(e) > 0).sum()))
        np.testing.assert_array_equal(np.asarray(xy)[:n, 0], want_x[:n])
        np.testing.assert_array_equal(np.asarray(xy)[:n, 1], want_y[:n])

    def test_no_lines_in_empty_map(self):
        edges = np.zeros((64, 64), np.uint8)
        lines = hough_sht.hough_lines_sht(jnp.asarray(edges),
                                          HoughConfig(threshold=10))
        assert int(lines.count) == 0

    def test_strength_counts_votes(self):
        edges = np.zeros((64, 64), np.uint8)
        edges[32, 4:60] = 255
        lines = hough_sht.hough_lines_sht(jnp.asarray(edges),
                                          HoughConfig(threshold=20, max_lines=4))
        assert int(lines.strength[0]) >= 50  # ~56 collinear points


class TestCCL:
    def test_two_blobs(self):
        img = np.zeros((32, 32), np.uint8)
        img[4:10, 4:10] = 255
        img[20:28, 15:25] = 255
        lbl = ccl.label(jnp.asarray(img))
        comps = ccl.extract_components(lbl, 16)
        assert int(comps.count) == 2
        areas = sorted(np.asarray(comps.areas)[:2].tolist())
        assert areas == [36, 80]
        boxes = np.asarray(comps.boxes)[:2]
        assert {tuple(b) for b in boxes} == {(4, 4, 9, 9), (15, 20, 24, 27)}

    def test_8_vs_4_connectivity(self):
        img = np.zeros((8, 8), np.uint8)
        img[1, 1] = 255
        img[2, 2] = 255  # diagonal touch
        lbl8 = ccl.label(jnp.asarray(img), connectivity=8)
        lbl4 = ccl.label(jnp.asarray(img), connectivity=4)
        c8 = ccl.extract_components(lbl8, 8)
        c4 = ccl.extract_components(lbl4, 8)
        assert int(c8.count) == 1
        assert int(c4.count) == 2

    def test_spiral_converges(self):
        """Worst case for plain propagation; path halving must still finish."""
        img = np.zeros((32, 32), np.uint8)
        # serpentine: one long connected path (worst-case diameter ~ H*W/2)
        for r in range(0, 32, 2):
            img[r, :] = 255
            if r + 1 < 32:
                img[r + 1, 31 if (r // 2) % 2 == 0 else 0] = 255
        lbl = ccl.label(jnp.asarray(img))
        comps = ccl.extract_components(lbl, 8)
        assert int(comps.count) == 1
        assert int(comps.areas[0]) == int((img > 0).sum())

    def test_extract_boxes_matches_full_stats(self):
        """Boxes-only extraction (the reference's boxes workload,
        speed_compare:163-168) must agree with extract_components on
        boxes/areas/roots, in root order with no area ranking."""
        rng = np.random.default_rng(7)
        img = (rng.random((48, 64)) < 0.35).astype(np.uint8) * 255
        lbl = ccl.label(jnp.asarray(img))
        bt = ccl.extract_boxes(lbl, 512)
        full = ccl.extract_components(lbl, 512)
        n = int(bt.count)
        assert n == int(full.count)
        assert int(bt.total_components) == int(full.total_components)
        # roots ascend (scan order of first pixels)
        roots = np.asarray(bt.roots)[:n]
        assert (np.diff(roots) > 0).all()
        by_root_full = {int(r): (tuple(b), int(a)) for r, b, a in zip(
            np.asarray(full.roots)[:n], np.asarray(full.boxes)[:n],
            np.asarray(full.areas)[:n])}
        for r, b, a in zip(roots, np.asarray(bt.boxes)[:n],
                           np.asarray(bt.areas)[:n]):
            fb, fa = by_root_full[int(r)]
            assert tuple(b) == fb and int(a) == fa

    def test_extract_boxes_overflow_flagged(self):
        img = np.zeros((16, 16), np.uint8)
        img[0::2, 0::2] = 255   # 64 isolated single-pixel components
        lbl = ccl.label(jnp.asarray(img))
        bt = ccl.extract_boxes(lbl, 16)
        assert int(bt.count) == 16
        assert int(bt.total_components) == 64   # overflow visible

    def test_run_count_reports_truncation(self):
        # vertical stripes: one run per (row, stripe) = 16*8 = 128 runs
        img = np.zeros((16, 16), np.uint8)
        img[:, 0::2] = 255
        lbl = ccl.label(jnp.asarray(img))
        full = ccl.extract_components(lbl, 16, max_runs=256)
        assert int(full.run_count) == 128      # fits: stats exact
        cut = ccl.extract_components(lbl, 16, max_runs=64)
        assert int(cut.run_count) == 128       # true count survives the cap
        assert int(cut.run_count) > 64         # caller can detect the drop

    def test_centroids(self):
        img = np.zeros((16, 16), np.uint8)
        img[4:8, 6:10] = 255
        comps = ccl.extract_components(ccl.label(jnp.asarray(img)), 4)
        np.testing.assert_allclose(np.asarray(comps.centroids)[0], [7.5, 5.5])

    def test_moments(self):
        """Second-order component moments (reference
        CompVConnectedComponentMoments: sum1,sumx,sumy,sumxx,sumxy,sumyy)."""
        img = np.zeros((16, 16), np.uint8)
        img[4:8, 6:10] = 255
        comps = ccl.extract_components(ccl.label(jnp.asarray(img)), 4)
        ys, xs = np.where(img > 0)
        expect = [len(xs), xs.sum(), ys.sum(), (xs * xs).sum(),
                  (xs * ys).sum(), (ys * ys).sum()]
        np.testing.assert_allclose(np.asarray(comps.moments)[0], expect)

    def test_extract_runs_rle(self):
        """Run-length segments sorted top->down left->right (reference
        COMPV_PLSL_TYPE_RLE + SORT_SEGMENTS semantics)."""
        img = np.zeros((6, 12), np.uint8)
        img[1, 2:5] = 1          # run (1, 2..4)
        img[1, 7:9] = 1          # run (1, 7..8)
        img[3, 0:12] = 1         # run (3, 0..11)
        img[4, 5] = 1            # run (4, 5..5)
        lbl = ccl.label(jnp.asarray(img))
        runs = ccl.extract_runs(lbl, max_runs=8)
        assert int(runs.count) == 4
        got = [(int(runs.y[i]), int(runs.x0[i]), int(runs.x1[i]))
               for i in range(4)]
        assert got == [(1, 2, 4), (1, 7, 8), (3, 0, 11), (4, 5, 5)]
        # run roots match the label image
        for i in range(4):
            y, x0 = got[i][0], got[i][1]
            assert int(runs.root[i]) == int(np.asarray(lbl)[y, x0])

    def test_extract_blob_points(self):
        rng = np.random.default_rng(3)
        img = (rng.random((40, 56)) < 0.3).astype(np.uint8)
        lbl = ccl.label(jnp.asarray(img))
        comps = ccl.extract_components(lbl, 16)
        blobs = ccl.extract_blob_points(lbl, comps.roots, cap=256)
        lab = np.asarray(lbl)
        for k in range(int(comps.count)):
            root = int(comps.roots[k])
            ys, xs = np.where(lab == root)
            cnt = int(blobs.counts[k])
            assert cnt == len(xs)
            got = np.asarray(blobs.xy)[k, :cnt]
            expect = set(zip(xs.tolist(), ys.tolist()))
            assert set(map(tuple, got.tolist())) == expect

    def test_remove_and_flatten(self):
        img = np.zeros((20, 20), np.uint8)
        img[2:5, 2:5] = 1        # area 9
        img[10:18, 10:18] = 1    # area 64
        lbl = ccl.label(jnp.asarray(img))
        comps = ccl.extract_components(lbl, 8)
        # flatten: biggest component gets id 1
        flat = np.asarray(ccl.flatten_labels(lbl, 8))
        assert flat[12, 12] == 1 and flat[3, 3] == 2 and flat[0, 0] == 0
        # remove the small one
        lbl2 = ccl.remove_components(lbl, jnp.asarray(
            [int(comps.roots[1])], jnp.int32))
        c2 = ccl.extract_components(lbl2, 8)
        assert int(c2.count) == 1 and int(c2.areas[0]) == 64

    def test_tiled_vs_scan_differential(self):
        """label_tiled is a structurally independent algorithm (tile-local
        converge + boundary-slot union-find); exact agreement with the
        Pallas/jnp sweep over random images is a strong mutual oracle —
        this differential caught the round-1 max_sweeps=64 silent split."""
        rng = np.random.default_rng(7)
        for h, w in ((24, 36), (77, 130)):
            for _ in range(6):
                img = (rng.random((h, w)) <
                       rng.uniform(0.1, 0.6)).astype(np.uint8)
                for conn in (4, 8):
                    a = np.asarray(ccl.label_tiled(
                        jnp.asarray(img), connectivity=conn, tile=(8, 16)))
                    b = np.asarray(ccl.label_scan(
                        jnp.asarray(img), connectivity=conn))
                    np.testing.assert_array_equal(a, b)

    def test_long_snake_exceeds_old_cap(self):
        """A squiggle with >64 turns: the round-1 sweep cap (64) silently
        split it into several labels; both paths must yield ONE component
        whose root is the min linear index."""
        h, w = 90, 130
        img = np.zeros((h, w), np.uint8)
        for r in range(0, h - 1, 2):
            img[r, 1:w - 1] = 1
            img[r + 1, w - 2 if (r // 2) % 2 == 0 else 1] = 1
        for fn in (ccl.label_scan, ccl.label_tiled):
            lbl = np.asarray(fn(jnp.asarray(img), connectivity=8))
            roots = np.unique(lbl[lbl < h * w])
            assert len(roots) == 1 and roots[0] == 1, (fn.__name__, roots)
