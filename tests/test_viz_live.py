"""Live viewer tests (reference: windowed presentation drawing/ + gl/;
re-scoped to an MJPEG-over-HTTP window per SURVEY §7)."""
import urllib.request

import numpy as np

from compv_tpu.viz.live import LiveViewer, MJPEGServer


class TestMJPEGServer:
    def test_frame_roundtrip_and_stream(self):
        srv = MJPEGServer()
        try:
            rng = np.random.default_rng(0)
            f1 = rng.integers(0, 255, (48, 64, 3)).astype(np.uint8)
            srv.push(f1)
            data = urllib.request.urlopen(
                srv.url + "frame.jpg", timeout=5).read()
            assert data[:2] == b"\xff\xd8"  # JPEG SOI
            page = urllib.request.urlopen(srv.url, timeout=5).read()
            assert b"/stream" in page
            req = urllib.request.urlopen(srv.url + "stream", timeout=5)
            assert "multipart/x-mixed-replace" in req.headers["Content-Type"]
            chunk = req.read(64)
            assert b"--frame" in chunk
        finally:
            srv.close()

    def test_404_before_first_frame(self):
        srv = MJPEGServer()
        try:
            try:
                urllib.request.urlopen(srv.url + "frame.jpg", timeout=5)
                raise AssertionError("expected 404")
            except urllib.error.HTTPError as e:
                assert e.code == 404
        finally:
            srv.close()


class TestLiveViewer:
    def test_mjpeg_show_with_annotations(self):
        v = LiveViewer(backend="mjpeg")
        try:
            img = np.zeros((40, 60), np.uint8)
            xy = np.array([[10.0, 10.0], [30.0, 20.0]])
            v.show(img, points=xy, text="f0")
            v.show(img, lines=np.array([[0, 0, 59, 39]]),
                   trajectory=np.array([[0, 0, 0], [1.0, 0, 0]]))
            assert v.frames_shown == 2
            data = urllib.request.urlopen(
                v.url + "frame.jpg", timeout=5).read()
            assert data[:2] == b"\xff\xd8"
        finally:
            v.close()

    def test_none_backend(self):
        v = LiveViewer(backend="none")
        v.show(np.zeros((8, 8), np.uint8))
        v.close()

    def test_annotate_points_object(self):
        import jax.numpy as jnp
        from compv_tpu.core.types import Points
        n = 5
        pts = Points(
            xy=jnp.asarray(np.random.default_rng(0)
                           .uniform(0, 30, (n, 2)).astype(np.float32)),
            strength=jnp.ones((n,)), angle=jnp.zeros((n,)),
            level=jnp.zeros((n,), jnp.int32), size=jnp.ones((n,)),
            count=jnp.asarray(3, jnp.int32))
        v = LiveViewer(backend="none")
        out = v.annotate(np.zeros((32, 32), np.uint8), points=pts)
        assert out.shape == (32, 32, 3)
        v.close()
