"""Per-op benchmark sweep vs the reference's speed_compare table.

Runs every op with a reference number (BASELINE.md) at the reference's
shapes on the real TPU chip and prints ms/frame + speedup. The driver-facing
headline stays in bench.py; this is the engineering scorecard.

Usage: python bench_all.py [--csv]
"""
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

HD = (720, 1282)

# reference ms/frame = total_ms / iterations (BASELINE.md, speed_compare)
REF_MS = {
    "rgb24_to_gray": 449 / 10000,
    "yuv420_to_rgb": 968 / 10000,
    "rgb_to_hsv": 2137 / 10000,
    "histogram": 1073 / 10000,
    "equalize": 2675 / 10000,
    "fast9_nms": 3358 / 10000,
    "scale_bilinear": 1474 / 10000,
    "gaussian_blur7": 1367 / 10000,
    "sobel": 7476 / 10000,
    "adaptive_thresh": 3551 / 10000,
    "otsu": 1253 / 10000,
    "match_knn2_200": 260 / 1000,
    "canny": 14903 / 10000,
    "hough_sht": 10367 / 1000,
    "hough_kht": 1413 / 1000,
    "erode3": 449 / 10000,
    "close3": 794 / 10000,
    "ccl": 2973 / 10000,
    "mser": 27072 / 1000,
    "hog": 5198 / 1000,
}


def timeit(fn, *args, iters=50, trials=3):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3  # ms


def timeit_varied(fn, inputs, trials=2):
    """Per-frame time over DISTINCT inputs — same-input loops overlap
    asynchronously and can read ~10x too fast for while_loop-heavy ops."""
    import jax
    out = fn(inputs[0])
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        outs = [fn(x) for x in inputs]
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / len(inputs))
    return best * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from compv_tpu.core.config import (CannyConfig, FastConfig, HogConfig,
                                       HoughConfig)
    from compv_tpu.core.types import Descriptors
    from compv_tpu.features import canny as canny_mod, fast as fast_mod
    from compv_tpu.features import hog as hog_mod
    from compv_tpu.features import hough_sht, hough_kht, ccl as ccl_mod
    from compv_tpu.features.mser import mser, MSERConfig
    from compv_tpu.matchers import bruteforce
    from compv_tpu.ops import (color, convolve, histogram, morphology,
                               resize, threshold)

    rng = np.random.default_rng(0)
    h, w = HD
    yy, xx = np.mgrid[0:h, 0:w]
    gray_np = np.clip(96 + 80 * ((xx // 16 + yy // 16) % 2)
                      + rng.normal(0, 8, (h, w)), 0, 255).astype(np.uint8)
    gray = jnp.asarray(gray_np)
    rgb = jnp.asarray(rng.integers(0, 256, (h, w, 3), np.uint8))
    y_p = gray
    u_p = jnp.asarray(rng.integers(0, 256, (h // 2, w // 2), np.uint8))
    v_p = jnp.asarray(rng.integers(0, 256, (h // 2, w // 2), np.uint8))

    results = {}

    results["rgb24_to_gray"] = timeit(jax.jit(color.rgb_to_gray), rgb)
    results["yuv420_to_rgb"] = timeit(jax.jit(color.yuv420_to_rgb),
                                      y_p, u_p, v_p)
    results["rgb_to_hsv"] = timeit(jax.jit(color.rgb_to_hsv), rgb)
    results["histogram"] = timeit(jax.jit(histogram.histogram256), gray)
    results["equalize"] = timeit(jax.jit(histogram.equalize), gray)
    fast_fn = jax.jit(lambda x: fast_mod.fast_detect(
        x, FastConfig(threshold=20, max_features=2000)))
    results["fast9_nms"] = timeit(fast_fn, gray)
    results["scale_bilinear"] = timeit(
        jax.jit(lambda x: resize.resize_bilinear(x, 597, 1064)), gray)
    results["gaussian_blur7"] = timeit(
        jax.jit(lambda x: convolve.gaussian_blur(x, 7, 2.0)), gray)
    results["sobel"] = timeit(jax.jit(lambda x: convolve.gradients(x)), gray)
    results["adaptive_thresh"] = timeit(
        jax.jit(lambda x: threshold.threshold_adaptive(x, 5, 8.0)), gray)
    results["otsu"] = timeit(
        jax.jit(lambda x: threshold.otsu_threshold(x)[1]), gray)

    tb = jnp.asarray(rng.integers(0, 2 ** 32, (200, 8), np.uint64)
                     .astype(np.uint32))
    qb = jnp.asarray(rng.integers(0, 2 ** 32, (258, 8), np.uint64)
                     .astype(np.uint32))
    tr = Descriptors(bits=tb, count=jnp.asarray(200, jnp.int32))
    q = Descriptors(bits=qb, count=jnp.asarray(258, jnp.int32))
    results["match_knn2_200"] = timeit(
        jax.jit(lambda a, b: bruteforce.match(a, b, knn=2)), q, tr)

    results["canny"] = timeit(
        jax.jit(lambda x: canny_mod.canny(x, CannyConfig())), gray)
    edges = canny_mod.canny(gray, CannyConfig())
    results["hough_sht"] = timeit(
        jax.jit(lambda e: hough_sht.hough_lines_sht(
            e, HoughConfig(threshold=120, max_lines=64))), edges)
    results["hough_kht"] = timeit(
        jax.jit(lambda e: hough_kht.hough_lines_kht(
            e, HoughConfig(threshold=120, max_lines=64))), edges)

    big = jnp.asarray(rng.integers(0, 2, (1285, 1285), np.uint8) * 255)
    strel = morphology.structuring_element("cross", 3, 3)
    results["erode3"] = timeit(
        jax.jit(lambda x: morphology.erode(x, strel)), big)
    results["close3"] = timeit(
        jax.jit(lambda x: morphology.close_(x, strel)), big)

    texts = [jnp.asarray((rng.random((1122, 1182)) < 0.08).astype(np.uint8))
             for _ in range(10)]
    results["ccl"] = timeit_varied(jax.jit(lambda x: ccl_mod.label(x)), texts)
    mser_imgs = [jnp.asarray(np.clip(
        220 - 120 * ((xx[:720, :1182] // 40 + yy[:720, :1182] // 40) % 2)
        + rng.normal(0, 5, (720, 1182)), 0, 255).astype(np.uint8))
        for _ in range(3)]
    results["mser"] = timeit_varied(
        jax.jit(lambda x: mser(x, MSERConfig(max_regions=64))), mser_imgs)
    results["hog"] = timeit(
        jax.jit(lambda x: hog_mod.hog(x, HogConfig())), gray)

    # ---- beyond-reference pipeline metrics (no reference counterpart) ----
    from compv_tpu.core.config import OrbConfig
    from compv_tpu.features.orb import orb_detect_describe
    orb_cfg = OrbConfig(levels=8, max_features=2000)
    orb_ms = timeit(jax.jit(lambda x: orb_detect_describe(x, orb_cfg)), gray)
    d2k = Descriptors(bits=jnp.asarray(
        rng.integers(0, 2 ** 32, (2000, 8), np.uint64).astype(np.uint32)),
        count=jnp.asarray(2000, jnp.int32))
    match2k_ms = timeit(
        jax.jit(lambda a, b: bruteforce.match(a, b, knn=2)), d2k, d2k)
    print("# pipeline (no reference number):")
    print(f"{'orb_hd_8lvl_2000f':<18}{orb_ms:>10.4f} ms "
          f"({1e3 / orb_ms:>7.0f} fps)")
    print(f"{'match_knn2_2000':<18}{match2k_ms:>10.4f} ms")

    csv = "--csv" in sys.argv
    print(f"{'op':<18}{'ours ms':>10}{'ref ms':>10}{'speedup':>9}")
    total_logsp = 0.0
    for k, ms in results.items():
        ref = REF_MS[k]
        sp = ref / ms
        total_logsp += np.log(sp)
        line = (f"{k},{ms:.4f},{ref:.4f},{sp:.2f}" if csv
                else f"{k:<18}{ms:>10.4f}{ref:>10.4f}{sp:>8.1f}x")
        print(line)
    gmean = float(np.exp(total_logsp / len(results)))
    print(f"geometric-mean speedup vs reference: {gmean:.2f}x")


if __name__ == "__main__":
    main()
