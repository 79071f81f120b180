"""Image-pipeline op tests vs NumPy oracles (the reference's golden-value
strategy, unittests/main.cxx, adapted per SURVEY §4)."""
import numpy as np
import jax.numpy as jnp
import pytest

from compv_tpu.ops import color, convolve, histogram, morphology, remap, resize, threshold
from compv_tpu.core.config import BorderMode, Interp
from tests.reference import ref_ops


class TestColor:
    def test_rgb_to_gray_exact(self, rgb_image):
        ours = np.asarray(color.rgb_to_gray(jnp.asarray(rgb_image)))
        ref = ref_ops.rgb_to_gray(rgb_image)
        np.testing.assert_array_equal(ours, ref)

    def test_gray_roundtrip_formats(self, rgb_image):
        g1 = np.asarray(color.bgr_to_gray(jnp.asarray(rgb_image[..., ::-1])))
        g2 = ref_ops.rgb_to_gray(rgb_image)
        np.testing.assert_array_equal(g1, g2)

    def test_upsample2x_matmul_exact_vs_repeat(self, rng):
        """The MXU one-hot upsample (BENCH_DETAIL round-3 yuv420 fix) must
        be BIT-identical to nearest-neighbor jnp.repeat, including odd
        output sizes."""
        for h, w in ((120, 160), (121, 161), (2, 2)):
            p = jnp.asarray(rng.integers(
                0, 256, ((h + 1) // 2, (w + 1) // 2), np.uint8))
            ours = np.asarray(color._upsample2x_nearest(p, h, w))
            ref = np.repeat(np.repeat(np.asarray(p), 2, 0), 2, 1)[:h, :w]
            np.testing.assert_array_equal(ours, ref.astype(np.int32))

    def test_yuv420_roundtrip(self, rgb_image):
        y, u, v = color.rgb_to_yuv420(jnp.asarray(rgb_image))
        assert y.shape == rgb_image.shape[:2]
        assert u.shape == (rgb_image.shape[0] // 2, rgb_image.shape[1] // 2)
        back = np.asarray(color.yuv420_to_rgb(y, u, v)).astype(np.int32)
        # Studio-swing quantization + chroma subsampling: loose bound.
        err = np.abs(back - rgb_image.astype(np.int32))
        assert np.median(err) <= 40

    def test_hsv_roundtrip(self, rgb_image):
        hsv = color.rgb_to_hsv(jnp.asarray(rgb_image))
        back = np.asarray(color.hsv_to_rgb(hsv)).astype(np.int32)
        err = np.abs(back - rgb_image.astype(np.int32))
        assert np.percentile(err, 90) <= 12

    def test_split_merge(self, rgb_image):
        planes = color.split_channels(jnp.asarray(rgb_image))
        merged = np.asarray(color.merge_channels(*planes))
        np.testing.assert_array_equal(merged, rgb_image)

    def test_monotone_lut_formula_exact(self):
        """The gather-free monotone-LUT identity used on TPU
        (histogram.apply_monotone_lut): sum of threshold comparisons ==
        direct lut[v], for arbitrary non-decreasing LUTs."""
        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (64, 64)).astype(np.uint8)
        for _ in range(5):
            lut = np.sort(rng.integers(0, 256, 256)).astype(np.uint8)
            b = np.searchsorted(lut.astype(np.int32), np.arange(255),
                                side="right")
            out = ((img.astype(np.int32)[..., None] >= b).sum(-1)
                   .astype(np.uint8))
            np.testing.assert_array_equal(out, lut[img])

    def test_packed_422_layout_exact(self):
        """YUYV/UYVY byte layout vs a hand-built oracle (reference packed
        conversions, base/image/compv_image_conv_to_rgbx.cxx)."""
        rng = np.random.default_rng(3)
        rgb = rng.integers(0, 256, (8, 10, 3), np.uint8)
        buf = np.asarray(color.rgb_to_yuyv422(jnp.asarray(rgb)))
        assert buf.shape == (8, 20)
        y, u, v = (np.asarray(a) for a in color.rgb_to_yuv444(
            jnp.asarray(rgb)))
        # bytes: [Y0 U01 Y1 V01] per 2-px group
        np.testing.assert_array_equal(buf[:, 0::4], y[:, 0::2])
        np.testing.assert_array_equal(buf[:, 2::4], y[:, 1::2])
        u2 = ((u[:, 0::2].astype(int) + u[:, 1::2].astype(int)) // 2)
        np.testing.assert_array_equal(buf[:, 1::4], u2.astype(np.uint8))
        ub = np.asarray(color.rgb_to_uyvy422(jnp.asarray(rgb)))
        np.testing.assert_array_equal(ub[:, 1::4], y[:, 0::2])
        np.testing.assert_array_equal(ub[:, 0::4], u2.astype(np.uint8))

    def test_packed_422_roundtrip_and_gray(self, rgb_image):
        buf = color.rgb_to_yuyv422(jnp.asarray(rgb_image))
        back = np.asarray(color.yuyv422_to_rgb(buf)).astype(np.int32)
        err = np.abs(back - rgb_image.astype(np.int32))
        assert np.median(err) <= 40      # studio swing + 1x2 chroma
        g = np.asarray(color.yuyv422_to_gray(buf))
        y = np.asarray(color.rgb_to_yuv444(jnp.asarray(rgb_image))[0])
        np.testing.assert_array_equal(g, y)
        buf2 = color.rgb_to_uyvy422(jnp.asarray(rgb_image))
        back2 = np.asarray(color.uyvy422_to_rgb(buf2)).astype(np.int32)
        assert np.median(np.abs(back2 - rgb_image.astype(np.int32))) <= 40
        np.testing.assert_array_equal(
            np.asarray(color.uyvy422_to_gray(buf2)), y)

    def test_batched_color_routes(self, rgb_image):
        """Every conversion runs batched over a leading (B,) dim with
        results identical to per-image calls (VERDICT item 8)."""
        batch = np.stack([rgb_image, rgb_image[::-1].copy()])
        b = jnp.asarray(batch)
        for fn in (color.rgb_to_gray, color.rgb_to_hsv,
                   color.rgb_to_yuyv422, color.rgb_to_uyvy422):
            got = np.asarray(fn(b))
            for i in range(2):
                np.testing.assert_array_equal(
                    got[i], np.asarray(fn(jnp.asarray(batch[i]))))
        # planar 420 both directions, batched
        y, u, v = color.rgb_to_yuv420(b)
        y0, u0, v0 = color.rgb_to_yuv420(jnp.asarray(batch[0]))
        np.testing.assert_array_equal(np.asarray(u)[0], np.asarray(u0))
        back = np.asarray(color.yuv420_to_rgb(y, u, v))
        back0 = np.asarray(color.yuv420_to_rgb(y0, u0, v0))
        np.testing.assert_array_equal(back[0], back0)


class TestConvolve:
    def test_conv2d_matches_oracle(self, gray_image):
        k = np.outer([1, 2, 1], [1, 2, 1]).astype(np.float32) / 16.0
        ours = np.asarray(convolve.conv2d(jnp.asarray(gray_image), jnp.asarray(k)))
        ref = ref_ops.conv2d(gray_image, k)
        np.testing.assert_allclose(ours, ref, atol=1e-2)

    def test_separable_equals_dense(self, gray_image):
        kx = np.array([0.25, 0.5, 0.25], np.float32)
        ky = np.array([0.1, 0.8, 0.1], np.float32)
        dense = np.asarray(convolve.conv2d(jnp.asarray(gray_image),
                                           jnp.asarray(np.outer(ky, kx))))
        sep = np.asarray(convolve.conv_separable(jnp.asarray(gray_image),
                                                 jnp.asarray(kx), jnp.asarray(ky)))
        np.testing.assert_allclose(sep, dense, atol=1e-2)

    def test_gaussian_blur_preserves_mean(self, gray_image):
        out = np.asarray(convolve.gaussian_blur(jnp.asarray(gray_image), 5, 2.0,
                                                border=BorderMode.REPLICATE))
        assert abs(float(out.mean()) - float(gray_image.mean())) < 2.0

    def test_sobel_gradients(self, gray_image):
        gx, gy = convolve.gradients(jnp.asarray(gray_image), "sobel")
        # vertical edge image: gx strong, gy ~ 0
        edge = np.zeros((32, 32), np.uint8)
        edge[:, 16:] = 255
        gx2, gy2 = convolve.gradients(jnp.asarray(edge), "sobel")
        assert float(jnp.abs(gx2).max()) > 500
        assert float(jnp.abs(gy2[4:-4, 4:-4]).max()) == 0.0

    def test_gradient_fast(self):
        img = np.arange(100, dtype=np.uint8).reshape(10, 10)
        gx, gy = convolve.gradient_fast(jnp.asarray(img))
        assert float(gx[5, 5]) == 2.0   # I[x+1]-I[x-1] on a unit ramp
        assert float(gy[5, 5]) == 20.0


class TestResize:
    def test_bilinear_u8_exact(self, gray_image):
        out_h, out_w = 133, 197  # awkward sizes on purpose
        ours = np.asarray(resize.resize_bilinear_u8(jnp.asarray(gray_image), out_h, out_w))
        ref = ref_ops.resize_bilinear_u8(gray_image, out_h, out_w)
        np.testing.assert_array_equal(ours, ref)

    def test_bicubic_identity(self, gray_image):
        out = np.asarray(resize.resize_bicubic(jnp.asarray(gray_image),
                                               *gray_image.shape))
        np.testing.assert_allclose(out.astype(np.int32), gray_image.astype(np.int32),
                                   atol=1)

    def test_pyramid_shapes(self, gray_image):
        pyr = resize.build_pyramid(jnp.asarray(gray_image), 8, 0.83)
        assert len(pyr) == 8
        assert pyr[0].shape == gray_image.shape
        for lv in range(1, 8):
            exp_h = max(1, int(gray_image.shape[0] * 0.83 ** lv))
            assert pyr[lv].shape[0] == exp_h


class TestThresholdHistogram:
    def test_otsu_matches_oracle(self, gray_image):
        t, binary = threshold.otsu_threshold(jnp.asarray(gray_image))
        assert int(t) == ref_ops.otsu(gray_image)
        assert set(np.unique(np.asarray(binary))) <= {0, 255}

    def test_histogram_exact(self, gray_image):
        ours = np.asarray(histogram.histogram256(jnp.asarray(gray_image)))
        ref = np.bincount(gray_image.reshape(-1), minlength=256)
        np.testing.assert_array_equal(ours, ref)

    def test_equalize_flattens(self, gray_image):
        eq = np.asarray(histogram.equalize(jnp.asarray(gray_image)))
        assert eq.std() >= gray_image.std() * 0.95

    def test_adaptive_threshold(self, gray_image):
        out = np.asarray(threshold.threshold_adaptive(jnp.asarray(gray_image), 5, 8.0))
        assert set(np.unique(out)) <= {0, 255}

    def test_projections(self, gray_image):
        px = np.asarray(histogram.projection_x(jnp.asarray(gray_image)))
        np.testing.assert_array_equal(px, gray_image.astype(np.int64).sum(0))


class TestMorphology:
    def test_erode_dilate_duality(self, gray_image):
        se = morphology.structuring_element("cross", 3, 3)
        binary = (gray_image > 127).astype(np.uint8) * 255
        er = np.asarray(morphology.erode(jnp.asarray(binary), se))
        di = np.asarray(morphology.dilate(jnp.asarray(binary), se))
        assert (er <= binary).all() and (di >= binary).all()

    def test_erode_oracle(self):
        img = np.zeros((9, 9), np.uint8)
        img[3:6, 3:6] = 255
        se = morphology.structuring_element("rect", 3, 3)
        er = np.asarray(morphology.erode(jnp.asarray(img), se))
        exp = np.zeros((9, 9), np.uint8)
        exp[4, 4] = 255
        np.testing.assert_array_equal(er, exp)

    def test_open_close(self, gray_image):
        se = morphology.structuring_element("ellipse", 3, 3)
        binary = (gray_image > 127).astype(np.uint8) * 255
        op = np.asarray(morphology.open_(jnp.asarray(binary), se))
        cl = np.asarray(morphology.close_(jnp.asarray(binary), se))
        assert (op <= cl).all()


class TestRemap:
    def test_identity_remap(self, gray_image):
        h, w = gray_image.shape
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
        out = np.asarray(remap.remap(jnp.asarray(gray_image), jnp.asarray(xs),
                                     jnp.asarray(ys)))
        np.testing.assert_array_equal(out, gray_image)

    def test_default_pixel_outside(self, gray_image):
        h, w = gray_image.shape
        xs = np.full((4, 4), -10.0, np.float32)
        ys = np.full((4, 4), -10.0, np.float32)
        out = np.asarray(remap.remap(jnp.asarray(gray_image), jnp.asarray(xs),
                                     jnp.asarray(ys), default_pixel=7))
        np.testing.assert_array_equal(out, np.full((4, 4), 7, np.uint8))

    def test_warp_identity_homography(self, gray_image):
        h, w = gray_image.shape
        eye = jnp.eye(3, dtype=jnp.float32)
        out = np.asarray(remap.warp_perspective_inverse(jnp.asarray(gray_image),
                                                        eye, h, w))
        np.testing.assert_array_equal(out, gray_image)

    def test_warp_translation(self, gray_image):
        h, w = gray_image.shape
        m = jnp.asarray([[1.0, 0.0, 5.0], [0.0, 1.0, 0.0]], jnp.float32)
        out = np.asarray(remap.warp_affine_inverse(jnp.asarray(gray_image), m, h, w))
        np.testing.assert_array_equal(out[:, : w - 5 - 1], gray_image[:, 5: w - 1])

    def test_remap_bounded_matches_remap(self, gray_image):
        """The tiled MXU remap must match the gather remap on an
        undistortion-shaped map (u8 rounding can differ by 1 on exact .5
        boundaries; nearest must be exact)."""
        h, w = gray_image.shape
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
        cx, cy = w / 2, h / 2
        r2 = ((xx - cx) / cx) ** 2 + ((yy - cy) / cy) ** 2
        mx = (xx + (xx - cx) * -0.05 * r2).astype(np.float32)
        my = (yy + (yy - cy) * -0.05 * r2).astype(np.float32)
        d = int(np.ceil(max(np.abs(mx - xx).max(), np.abs(my - yy).max())))
        img = jnp.asarray(gray_image)
        for interp in (remap.Interp.BILINEAR, remap.Interp.NEAREST):
            a = np.asarray(remap.remap(img, jnp.asarray(mx),
                                       jnp.asarray(my), interp=interp))
            b = np.asarray(remap.remap_bounded(
                img, jnp.asarray(mx), jnp.asarray(my), max_displacement=d,
                interp=interp))
            if interp == remap.Interp.NEAREST:
                np.testing.assert_array_equal(a, b)
            else:
                assert np.abs(a.astype(int) - b.astype(int)).max() <= 1
                # and almost all pixels identical
                assert (a == b).mean() > 0.99

    def test_remap_bounded_nearest_half_pixel_ties(self, gray_image):
        """Review-caught: round-half-to-even is not shift-invariant, so
        NEAREST must round in GLOBAL coordinates — a half-pixel-shift map
        is all ties and exposes any local rounding."""
        h, w = gray_image.shape
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        img = jnp.asarray(gray_image)
        a = np.asarray(remap.remap(img, jnp.asarray(xx + 0.5),
                                   jnp.asarray(yy + 0.5),
                                   interp=remap.Interp.NEAREST))
        b = np.asarray(remap.remap_bounded(img, jnp.asarray(xx + 0.5),
                                           jnp.asarray(yy + 0.5),
                                           max_displacement=1,
                                           interp=remap.Interp.NEAREST))
        np.testing.assert_array_equal(a, b)

    def test_remap_bounded_default_and_float(self, gray_image):
        """Out-of-image sources yield default_pixel; float images skip the
        u8 rounding and match remap to fp tolerance."""
        h, w = gray_image.shape
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        mx = xx + 3.25
        my = yy.copy()
        mx[0, :] = -50.0     # off-image row -> default
        img_f = jnp.asarray(gray_image.astype(np.float32))
        a = np.asarray(remap.remap(img_f, jnp.asarray(mx), jnp.asarray(my),
                                   default_pixel=9.0))
        b = np.asarray(remap.remap_bounded(img_f, jnp.asarray(mx),
                                           jnp.asarray(my),
                                           max_displacement=4,
                                           default_pixel=9.0))
        np.testing.assert_allclose(a, b, atol=1e-3)
        assert (b[0] == 9.0).all()
