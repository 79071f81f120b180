"""Golden-checksum regression tests.

The reference's unit tests assert hard-coded MD5s / golden sums over every
kernel output (unittests/feature_fast.cxx:17-65, compv_tests_md5). Same
strategy here for INTEGER-exact outputs (portable across platforms): any
semantic change to these kernels flips the digest and fails loudly.
Digests pinned from the jnp reference formulations; the Pallas kernels are
asserted bit-equal to those in test_kernels.py, closing the chain.
"""
import numpy as np
import jax.numpy as jnp

from compv_tpu import runtime
from compv_tpu.features import ccl, fast

H, W = 120, 160


def _golden_image():
    yy, xx = np.mgrid[0:H, 0:W]
    img = np.clip(96 + 80 * ((xx // 8 + yy // 8) % 2)
                  + ((xx * 7 + yy * 13) % 17) - 8, 0, 255).astype(np.uint8)
    # guard the input itself first
    assert runtime.md5_hex(img) == "d2bae6e19c77ec86b88939e3162d651f"
    return img


def _corner_image():
    """Bright discs on a dark page — corner-RICH (the checkerboard golden
    image has ZERO FAST corners: X-junctions give two opposite 8-arcs and
    never a 9-contiguous one, so its strengths digest pins an all-zero
    map; this one pins 267 real NMS survivors)."""
    rng = np.random.default_rng(1234)
    img = np.full((H, W), 40, np.uint8)
    yy, xx = np.mgrid[0:H, 0:W]
    for _ in range(40):
        cy = rng.integers(10, H - 10)
        cx = rng.integers(10, W - 10)
        r = rng.integers(3, 7)
        img[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = 200
    img = np.clip(img + (np.add.outer(np.arange(H) * 13,
                                      np.arange(W) * 7) % 11) - 5,
                  0, 255).astype(np.uint8)
    assert runtime.md5_hex(img) == "94f62b91d17d2fb0ff770996ae764993"
    return img


class TestGolden:
    def test_fast_strengths_nms_digest(self):
        img = _golden_image()
        s = np.asarray(fast.fast_nms(fast.fast_strengths(
            jnp.asarray(img), 20, 9)))
        assert runtime.md5_hex(s) == "281d1df6a4cae29b127dd617fe461ce4"

    def test_fast_strengths_corner_rich_digest(self):
        img = _corner_image()
        s = np.asarray(fast.fast_nms(fast.fast_strengths(
            jnp.asarray(img), 20, 9)))
        assert (s > 0).sum() == 267
        assert runtime.md5_hex(s) == "f8b8735686864aacefd8e4b5a6a056eb"

    def test_brief_descriptor_digest(self):
        """Absolute pin of the oriented-BRIEF descriptor bits (the parity
        test guards gather==patch; this guards both against semantic
        drift). Full frontend path: FAST -> moments orientation ->
        describe."""
        from compv_tpu.core.config import FastConfig
        from compv_tpu.core.types import Points
        from compv_tpu.features import brief
        from compv_tpu.ops.mathutils import orientations
        img = _corner_image()
        pts = fast.fast_detect(jnp.asarray(img),
                               FastConfig(threshold=20, max_features=64))
        assert int(pts.count) == 64
        ang = orientations(jnp.asarray(img), pts.xy, 15)
        pts = Points(xy=pts.xy, strength=pts.strength, angle=ang,
                     level=pts.level, size=pts.size, count=pts.count)
        d = brief.describe(jnp.asarray(img), pts, method="gather")
        bits = np.asarray(d.bits)
        # digest re-pinned 2026-08-19: default pattern switched to the
        # learned ORB pair table (brief_pattern_learned.py)
        assert runtime.md5_hex(bits.view(np.uint8)) == \
            "61575956c8b62a86d7684e9d0c058bc7"
        # the gaussian pattern keeps its own pin (pattern selectability)
        dg = brief.describe(jnp.asarray(img), pts, method="gather",
                            pattern="gaussian")
        assert runtime.md5_hex(np.asarray(dg.bits).view(np.uint8)) == \
            "b8a8cda194f3a8071cd65576b8b5fc6c"

    def test_ccl_labels_digest(self):
        img = _golden_image()
        binary = (img > 128).astype(np.uint8)
        lbl = np.asarray(ccl.label(jnp.asarray(binary))).astype(np.int32)
        assert runtime.md5_hex(lbl) == "5ced3c84f5eb2204970a27dc68c51784"
