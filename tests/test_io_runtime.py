"""IO / native-runtime / viz / checkpoint tests (reference: FileUtils + MD5
+ image decoder + video reader + save/load persistence)."""
import hashlib
import os

import numpy as np
import jax.numpy as jnp
import pytest

from compv_tpu import runtime
from compv_tpu.io import checkpoint, image as image_io, video
from compv_tpu import viz


class TestRuntime:
    def test_md5_matches_hashlib(self, rng):
        data = rng.integers(0, 256, 10000, dtype=np.uint8)
        assert runtime.md5_hex(data) == hashlib.md5(data.tobytes()).hexdigest()

    def test_md5_empty(self):
        assert runtime.md5_hex(np.zeros(0, np.uint8)) == \
            "d41d8cd98f00b204e9800998ecf8427e"  # RFC 1321 empty digest

    @pytest.mark.skipif(not runtime.available(), reason="no native runtime")
    def test_aligned_buffer(self):
        b = runtime.AlignedBuffer(1 << 16, alignment=256)
        assert b.array.ctypes.data % 256 == 0
        b.array[:] = 7
        assert int(b.array.sum()) == 7 << 16

    def test_frame_loader_ordered(self, tmp_path):
        paths = []
        for i in range(32):
            p = tmp_path / f"frame_{i:03d}.raw"
            np.full(256, i, np.uint8).tofile(p)
            paths.append(str(p))
        ld = runtime.FrameLoader(paths, 256, workers=4, queue_depth=4)
        frames = list(ld)
        ld.close()
        assert [int(f[0]) for f in frames] == list(range(32))

    def test_frame_loader_missing_file(self, tmp_path):
        p = tmp_path / "exists.raw"
        np.full(64, 3, np.uint8).tofile(p)
        ld = runtime.FrameLoader([str(p), str(tmp_path / "missing.raw")], 64)
        a = ld.next()
        b = ld.next()
        assert int(a[0]) == 3 and b is not None  # missing -> zero frame
        assert ld.next() is None
        ld.close()


class TestImageIO:
    def test_pgm_roundtrip(self, tmp_path, rng):
        img = rng.integers(0, 256, (33, 47), dtype=np.uint8)
        p = str(tmp_path / "t.pgm")
        image_io.write_pgm(p, img)
        np.testing.assert_array_equal(image_io.read_pgm(p), img)

    def test_ppm_roundtrip(self, tmp_path, rng):
        img = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
        p = str(tmp_path / "t.ppm")
        image_io.write_ppm(p, img)
        np.testing.assert_array_equal(image_io.read_ppm(p), img)

    def test_png_via_pil(self, tmp_path, rng):
        pytest.importorskip("PIL")
        img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        p = str(tmp_path / "t.png")
        image_io.imwrite(p, img)
        np.testing.assert_array_equal(image_io.imread(p), img)

    def test_yuv420(self, tmp_path, rng):
        w, h = 32, 24
        y = rng.integers(0, 256, (h, w), dtype=np.uint8)
        u = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
        v = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
        p = str(tmp_path / "t.yuv")
        with open(p, "wb") as f:
            for frame in range(2):
                f.write(y.tobytes())
                f.write(u.tobytes())
                f.write(v.tobytes())
        y2, u2, v2 = image_io.read_yuv420(p, w, h, frame=1)
        np.testing.assert_array_equal(y2, y)
        np.testing.assert_array_equal(u2, u)
        np.testing.assert_array_equal(v2, v)


class TestVideo:
    def test_raw_video_reader(self, tmp_path, rng):
        w, h, n = 16, 12, 5
        frames = rng.integers(0, 256, (n, h, w), dtype=np.uint8)
        p = str(tmp_path / "v.raw")
        with open(p, "wb") as f:
            f.write(frames.tobytes())
        r = video.RawVideoReader(p, w, h, fmt="gray")
        assert len(r) == n
        got = list(r)
        for a, b in zip(got, frames):
            np.testing.assert_array_equal(a, b)

    def test_image_sequence_pgm_prefetch(self, tmp_path, rng):
        paths = []
        for i in range(6):
            img = np.full((10, 14), i * 10, np.uint8)
            p = str(tmp_path / f"{i:02d}.pgm")
            image_io.write_pgm(p, img)
            paths.append(p)
        r = video.ImageSequenceReader(paths)
        got = list(r)
        assert len(got) == 6
        assert [int(g[0, 0]) for g in got] == [0, 10, 20, 30, 40, 50]

    def test_ffmpeg_gated(self, tmp_path):
        import shutil
        if shutil.which("ffmpeg") is None:
            with pytest.raises(RuntimeError, match="ffmpeg"):
                video.FfmpegReader(str(tmp_path / "x.mp4"), 64, 48)


class TestCheckpoint:
    def test_pytree_roundtrip(self, tmp_path, rng):
        tree = {"a": jnp.asarray(rng.normal(size=(4, 3)), jnp.float32),
                "b": (jnp.arange(5), jnp.asarray(2.5))}
        p = str(tmp_path / "ckpt.npz")
        checkpoint.save_pytree(p, tree)
        got = checkpoint.load_pytree(p, tree)
        np.testing.assert_allclose(np.asarray(got["a"]),
                                   np.asarray(tree["a"]))
        np.testing.assert_array_equal(np.asarray(got["b"][0]), np.arange(5))

    def test_vo_roundtrip(self, tmp_path, rng):
        from compv_tpu.slam import camera, vo
        intr = camera.Intrinsics.make(100.0, 100.0, 32.0, 24.0)
        odo = vo.VisualOdometry(intr)
        odo.trajectory = [np.zeros(6, np.float32),
                          np.arange(6, dtype=np.float32)]
        odo.map = odo._empty_map()
        odo._initialized = True
        p = str(tmp_path / "vo.npz")
        checkpoint.save_vo(p, odo)
        odo2 = vo.VisualOdometry(intr)
        checkpoint.load_vo(p, odo2)
        assert odo2._initialized
        assert len(odo2.trajectory) == 2
        np.testing.assert_allclose(odo2.trajectory[1], np.arange(6))
        assert int(odo2.map.count) == 0

    def test_vo_resume_tracks_after_restore(self, tmp_path):
        """The snapshot carries the keyframe + obs log + loop history, so a
        restored VO can immediately track (round-1 bug: _last_kf was not
        persisted and the first resumed track() crashed)."""
        from compv_tpu.io import datasets
        from compv_tpu.slam import camera, vo
        from compv_tpu.core.config import RansacConfig, OrbConfig, BAConfig
        frames, gt, (fx, fy, cx, cy) = datasets.synthetic_sequence(
            n_frames=5, h=120, w=160, n_landmarks=200, fx=140.0)
        intr = camera.Intrinsics.make(fx, fy, cx, cy)
        cfg = vo.VOConfig(
            max_landmarks=512, max_obs_per_frame=256, min_track_inliers=10,
            ransac=RansacConfig(max_iters=256, batch=64, threshold=9.0),
            essential=RansacConfig(max_iters=512, batch=128, threshold=2e-5),
            ba=BAConfig(max_iters=2), orb=OrbConfig(levels=2,
                                                    max_features=256))
        odo = vo.VisualOdometry(intr, cfg)
        assert odo.initialize(frames[0], frames[1])
        assert odo.track(frames[2])
        p = str(tmp_path / "vo_resume.npz")
        checkpoint.save_vo(p, odo)
        odo2 = vo.VisualOdometry(intr, cfg)
        checkpoint.load_vo(p, odo2)
        assert odo2._last_kf is not None
        assert odo2._hist_n == odo._hist_n
        assert len(odo2._obs) == len(odo._obs)
        assert odo2.track(frames[3])       # resumes without crashing
        assert len(odo2.trajectory) == 4


class TestCamera:
    def test_run_loop_early_stop(self):
        from compv_tpu.io.camera import FrameSource, run_loop
        frames = [np.full((4, 4), i, np.uint8) for i in range(5)]
        seen = []
        n = run_loop(FrameSource(frames),
                     lambda f: (seen.append(int(f[0, 0])), len(seen) < 3)[1])
        assert n == 3 and seen == [0, 1, 2]

    def test_error_callback(self):
        from compv_tpu.io.camera import FrameSource, run_loop
        frames = [np.zeros((2, 2), np.uint8)] * 4
        errs = []

        def cb(f):
            raise ValueError("boom")

        n = run_loop(FrameSource(frames), cb, on_error=errs.append)
        assert n == 4 and len(errs) == 4


class TestViz:
    def test_draw_points_and_boxes(self, rng):
        img = rng.integers(0, 256, (40, 60), dtype=np.uint8)
        c = viz.draw_points(img, [[10, 10], [50, 30]])
        assert c.shape == (40, 60, 3)
        assert tuple(c[10, 10]) == viz.draw.GREEN if hasattr(viz, "draw") \
            else True
        c2 = viz.draw_boxes(c, [[5, 5, 20, 20]])
        assert c2.shape == (40, 60, 3)

    def test_draw_matches_shape(self, rng):
        a = rng.integers(0, 256, (30, 40), dtype=np.uint8)
        b = rng.integers(0, 256, (36, 50), dtype=np.uint8)
        c = viz.draw_matches(a, [[5, 5], [10, 10]], b, [[7, 7], [20, 20]],
                             [1, 0])
        assert c.shape == (36, 90, 3)

    def test_draw_trajectory(self):
        pos = np.stack([np.linspace(0, 10, 20), np.zeros(20),
                        np.linspace(0, 5, 20)], 1)
        c = viz.draw_trajectory(pos, size=128)
        assert c.shape == (128, 128, 3)
        assert (c != 255).any()  # something was drawn


class TestVideoWriter:
    def test_raw_roundtrip(self, tmp_path, rng):
        from compv_tpu.io.video import RawVideoReader, RawVideoWriter
        frames = [rng.integers(0, 256, (12, 16), dtype=np.uint8)
                  for _ in range(4)]
        p = str(tmp_path / "out.raw")
        with RawVideoWriter(p, fmt="gray") as wtr:
            for f in frames:
                wtr.write(f)
        r = RawVideoReader(p, 16, 12, fmt="gray")
        got = list(r)
        assert len(got) == 4
        for a, b in zip(got, frames):
            np.testing.assert_array_equal(a, b)

    def test_image_sequence_writer(self, tmp_path, rng):
        from compv_tpu.io.video import (ImageSequenceReader,
                                        ImageSequenceWriter)
        w = ImageSequenceWriter(str(tmp_path / "seq"))
        paths = [w.write(np.full((8, 10), i * 20, np.uint8))
                 for i in range(3)]
        r = ImageSequenceReader(paths)
        got = list(r)
        assert [int(g[0, 0]) for g in got] == [0, 20, 40]

    def test_draw_text(self):
        c = viz.draw_text(np.zeros((20, 80), np.uint8), "12.5 fps", 2, 2)
        assert c.shape == (20, 80, 3)
        assert (c != 0).any()
