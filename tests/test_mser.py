"""MSER threshold-sweep tests (reference: core/ccl lmser, driven by
tests with text-like blob images; we use synthetic blobs)."""
import numpy as np
import jax.numpy as jnp

from compv_tpu.features.mser import MSERConfig, mser, mser_region_points


def _blob_image(h=96, w=128):
    """Bright background with two dark solid blobs of distinct sizes."""
    img = np.full((h, w), 220, np.uint8)
    img[20:40, 20:50] = 30          # 20x30 rectangle
    yy, xx = np.mgrid[0:h, 0:w]
    circle = (yy - 65) ** 2 + (xx - 90) ** 2 <= 15 ** 2
    img[circle] = 50
    return img


class TestMSER:
    def test_finds_dark_blobs(self):
        img = jnp.asarray(_blob_image())
        res = mser(img, MSERConfig(max_regions=16, level_step=8))
        assert int(res.count) >= 2
        areas = np.asarray(res.areas)[np.asarray(res.valid)]
        boxes = np.asarray(res.boxes)[np.asarray(res.valid)]
        # the rectangle blob: area 600, bbox (20,20)-(49,39)
        rect = [i for i, b in enumerate(boxes)
                if abs(b[0] - 20) <= 2 and abs(b[1] - 20) <= 2
                and abs(b[2] - 49) <= 2 and abs(b[3] - 39) <= 2]
        assert rect, boxes
        assert abs(int(areas[rect[0]]) - 600) <= 60
        # the circle blob: area ~pi*15^2=707
        circ = [i for i, b in enumerate(boxes)
                if abs((b[0] + b[2]) / 2 - 90) <= 3
                and abs((b[1] + b[3]) / 2 - 65) <= 3]
        assert circ, boxes
        assert abs(int(areas[circ[0]]) - 707) <= 80

    def test_bright_on_dark(self):
        img = 255 - _blob_image()
        res = mser(jnp.asarray(img),
                   MSERConfig(max_regions=16, bright_on_dark=True))
        assert int(res.count) >= 2

    def test_flat_image_no_regions(self):
        img = jnp.full((64, 64), 128, jnp.uint8)
        res = mser(img, MSERConfig(max_regions=8))
        # the full frame fails max_area; nothing else exists
        assert int(res.count) == 0

    def test_area_bounds_respected(self):
        img = jnp.asarray(_blob_image())
        res = mser(img, MSERConfig(max_regions=16, min_area=0.2,
                                   max_area=0.9))
        areas = np.asarray(res.areas)[np.asarray(res.valid)]
        assert (areas >= 0.2 * 96 * 128).all() if areas.size else True

    def test_region_points_match_threshold_component(self):
        """Pixel-list extraction (reference LMSER result 'points'): each
        extracted list must equal the numpy-thresholded connected
        component at the region's level/root, row-major sorted."""
        img_np = _blob_image()
        cfg = MSERConfig(max_regions=16)
        res = mser(jnp.asarray(img_np), cfg)
        n = int(res.count)
        assert n >= 2
        pts = mser_region_points(jnp.asarray(img_np), res, cap=2048,
                                 config=cfg)
        h, w = img_np.shape
        levels = np.asarray(res.levels)
        roots = np.asarray(res.roots)
        counts = np.asarray(pts.counts)
        xy = np.asarray(pts.xy)
        from scipy import ndimage
        for k in range(n):
            mask = img_np <= levels[k]
            lab, _ = ndimage.label(
                mask, structure=np.ones((3, 3), int))
            ry, rx = divmod(int(roots[k]), w)
            comp = lab == lab[ry, rx]
            assert lab[ry, rx] > 0
            got = xy[k][: counts[k]]
            want = np.argwhere(comp)[:, ::-1]       # (y,x)->(x,y)
            assert counts[k] == comp.sum()
            # both row-major: argwhere scans rows, compaction scans rows
            np.testing.assert_array_equal(got, want)
            assert int(res.areas[k]) == int(comp.sum())
