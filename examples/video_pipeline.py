"""Production-style video pipeline: native prefetching loader -> batched
TPU frontend -> annotated output frames.

Demonstrates the full runtime stack working together (the role of the
reference's camera -> thread-pool -> detector -> GL loop,
samples/object_recognition/main.cxx): the C++ FrameLoader hides disk
latency behind TPU compute, frames run through the batched Pallas FAST
frontend, results rasterize to an output image sequence.

Usage: python examples/video_pipeline.py [n_frames]
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from compv_tpu import FastConfig, runtime, viz
from compv_tpu.features.fast import fast_detect_batch
from compv_tpu.io.video import ImageSequenceWriter


def main(n_frames=32, h=480, w=640, batch=8):
    rng = np.random.default_rng(0)
    workdir = tempfile.mkdtemp(prefix="compv_video_")

    # synthesize a raw frame sequence on disk (stand-in for a camera/dataset)
    yy, xx = np.mgrid[0:h, 0:w]
    paths = []
    for i in range(n_frames):
        img = np.clip(96 + 80 * (((xx + 5 * i) // 16 + yy // 16) % 2)
                      + rng.normal(0, 8, (h, w)), 0, 255).astype(np.uint8)
        p = os.path.join(workdir, f"{i:05d}.raw")
        img.tofile(p)
        paths.append(p)

    print(f"native runtime available: {runtime.available()}")
    loader = runtime.FrameLoader(paths, h * w, workers=4, queue_depth=16)
    cfg = FastConfig(threshold=20, max_features=1000)
    detect = jax.jit(lambda x: fast_detect_batch(x, cfg))
    writer = ImageSequenceWriter(os.path.join(workdir, "out"),
                                 pattern="{:05d}.png")
    # warm the compile outside the throughput measurement
    jax.block_until_ready(detect(jnp.zeros((batch, h, w), jnp.uint8)).xy)

    t0 = time.perf_counter()
    buf, done = [], 0
    for raw in loader:
        buf.append(raw.reshape(h, w))
        if len(buf) == batch:
            pts = detect(jnp.asarray(np.stack(buf)))
            xys, counts = jax.device_get((pts.xy, pts.count))
            for f in range(batch):
                n = int(counts[f])
                # cap the host-side rasterization (the python-loop drawer is
                # the demo's bottleneck, not the TPU)
                canvas = viz.draw_points(buf[f], xys[f][:min(n, 150)])
                canvas = viz.draw_text(canvas, f"{n}", 4, 4, scale=2)
                writer.write(canvas)
            done += batch
            buf.clear()
    loader.close()
    dt = time.perf_counter() - t0
    print(f"processed {done} frames in {dt:.2f}s = {done / dt:.0f} fps "
          f"(load + detect + draw + encode)")
    print(f"annotated frames in {os.path.join(workdir, 'out')}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
