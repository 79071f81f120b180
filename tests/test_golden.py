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


class TestGolden:
    def test_fast_strengths_nms_digest(self):
        img = _golden_image()
        s = np.asarray(fast.fast_nms(fast.fast_strengths(
            jnp.asarray(img), 20, 9)))
        assert runtime.md5_hex(s) == "281d1df6a4cae29b127dd617fe461ce4"

    def test_ccl_labels_digest(self):
        img = _golden_image()
        binary = (img > 128).astype(np.uint8)
        lbl = np.asarray(ccl.label(jnp.asarray(binary))).astype(np.int32)
        assert runtime.md5_hex(lbl) == "5ced3c84f5eb2204970a27dc68c51784"
