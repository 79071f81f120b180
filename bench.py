"""Headline benchmark, run by the driver on real TPU hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: FAST9+NMS corner detection at HD (1280x720), frames/s on one chip —
the reference's headline kernel (speed_compare:61-69: 3,358 ms for 10k HD
frames on an 8-thread i7-4790K = 2,977 fps; OpenCV 973 fps).
vs_baseline = our fps / reference fps.

Methodology (hardened in round 2): the whole measured loop runs INSIDE one
jitted lax.scan over K DISTINCT device-generated batches, and the time is
the marginal (t(K2)-t(K1))/(K2-K1) best-of-trials. Host-side repeat loops
over the same input misread by orders of magnitude on the remote-TPU
tunnel (repeat-dispatch caching + async overlap), and a zero-argument jit
constant-folds entirely at compile time.
"""
import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

REFERENCE_FPS = 10000.0 / 3.358  # speed_compare:61-69 (mt, avx2)


def main():
    import jax
    import jax.numpy as jnp
    from compv_tpu.core.config import FastConfig
    from compv_tpu.features.fast import fast_detect_batch

    h, w = 720, 1280
    batch = 8  # chip THROUGHPUT: batched frames amortize fixed overheads,
    # the honest unit against the reference's 8-thread CPU throughput
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    img_np = np.clip(96 + 80 * ((xx // 16 + yy // 16) % 2)
                     + rng.normal(0, 8, (h, w)), 0, 255).astype(np.uint8)
    imgs0 = jnp.asarray(np.stack(
        [np.roll(img_np, 3 * i, axis=1) for i in range(batch)]))
    cfg = FastConfig(threshold=20, max_features=2000)

    def make(K):
        @jax.jit
        def run(base):
            def body(c, i):
                v = jnp.roll(base, i * 5 + 1, axis=2) + i.astype(base.dtype)
                p = fast_detect_batch(v, cfg)
                return (c + jnp.sum(p.xy) + jnp.sum(p.count)
                        .astype(jnp.float32), None)
            o, _ = jax.lax.scan(body, jnp.float32(0),
                                jnp.arange(K, dtype=jnp.int32))
            return o
        return run

    K1, K2 = 2, 66
    r1, r2 = make(K1), make(K2)
    float(r1(imgs0))
    float(r2(imgs0))
    # min each timing SEPARATELY: a tunnel burst during one t1 would make
    # a per-trial difference negative and min() would pick it
    best1 = best2 = float("inf")
    for trial in range(6):
        t0 = time.perf_counter()
        float(r1(imgs0))          # value fetch: block_until_ready does
        best1 = min(best1, time.perf_counter() - t0)   # NOT block on the
        t0 = time.perf_counter()                       # axon tunnel
        float(r2(imgs0))
        best2 = min(best2, time.perf_counter() - t0)
        if trial < 5:
            time.sleep(1.0)
    fps = batch * (K2 - K1) / max(best2 - best1, 1e-9)

    print(json.dumps({
        "metric": "fast9_nms_hd_frames_per_s",
        "value": round(fps, 1),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / REFERENCE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
