"""Live visualization — the interactive-presentation layer.

Reference: the windowed GL pipeline (drawing/compv_window.cxx,
drawing/compv_canvas.cxx + gl/* ~7.3k LoC: GL surfaces, renderers, blitters
and the UI run loop). A TPU host is headless, so the TPU-native equivalent
re-scopes presentation to two backends over the same host-side rasterizers
(viz/draw.py):

- ``mjpeg``: an in-process HTTP server streaming annotated frames as
  multipart/x-mixed-replace JPEG — any browser is the window. This is the
  remote-development analogue of the reference's window: zero native deps
  (stdlib http.server + PIL encode), works over an SSH tunnel.
- ``matplotlib``: an interactive pyplot window when a display exists.
- ``none``: drop frames (benchmarks / tests).

``LiveViewer`` mirrors the reference surface's draw-then-present flow
(CompVWindow::beginDraw / drawImage / canvas drawText / endDraw): one
``show(frame, points=..., matches=..., lines=..., text=...)`` call per
frame annotates and presents.
"""
from __future__ import annotations

import io as _io
import socket
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Sequence

import numpy as np

from . import draw


def _encode_jpeg(rgb: np.ndarray, quality: int = 85) -> bytes:
    from PIL import Image
    buf = _io.BytesIO()
    Image.fromarray(rgb).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


_PAGE = (b"<!doctype html><title>compv-tpu</title>"
         b"<body style='margin:0;background:#111'>"
         b"<img src='/stream' style='max-width:100vw;max-height:100vh'>"
         b"</body>")


class MJPEGServer:
    """Minimal multipart-JPEG streaming server; the browser is the window.

    Endpoints: ``/`` (viewer page), ``/stream`` (multipart/x-mixed-replace),
    ``/frame.jpg`` (latest frame one-shot). ``push(rgb)`` swaps the current
    frame and wakes all connected stream clients.
    """

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 quality: int = 85):
        self._quality = quality
        self._cond = threading.Condition()
        self._jpeg: Optional[bytes] = None
        self._seq = 0
        self._closed = False
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # noqa: N802 — silence per-request log
                pass

            def do_GET(self):  # noqa: N802 — http.server API
                if self.path == "/":
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.end_headers()
                    self.wfile.write(_PAGE)
                elif self.path == "/frame.jpg":
                    with outer._cond:
                        data = outer._jpeg
                    if data is None:
                        self.send_response(404)
                        self.end_headers()
                        return
                    self.send_response(200)
                    self.send_header("Content-Type", "image/jpeg")
                    self.send_header("Content-Length", str(len(data)))
                    self.end_headers()
                    self.wfile.write(data)
                elif self.path == "/stream":
                    self.send_response(200)
                    self.send_header(
                        "Content-Type",
                        "multipart/x-mixed-replace; boundary=frame")
                    self.end_headers()
                    seen = -1
                    try:
                        while True:
                            with outer._cond:
                                outer._cond.wait_for(
                                    lambda: outer._seq != seen
                                    or outer._closed, timeout=1.0)
                                if outer._closed:
                                    return
                                if outer._seq == seen:
                                    continue
                                data, seen = outer._jpeg, outer._seq
                            if data is None:
                                continue
                            self.wfile.write(
                                b"--frame\r\nContent-Type: image/jpeg\r\n"
                                b"Content-Length: "
                                + str(len(data)).encode() + b"\r\n\r\n"
                                + data + b"\r\n")
                    except (BrokenPipeError, ConnectionResetError):
                        return
                else:
                    self.send_response(404)
                    self.end_headers()

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._httpd.daemon_threads = True
        self.host, self.port = self._httpd.server_address[:2]
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True)
        self._thread.start()

    @property
    def url(self) -> str:
        return f"http://{self.host}:{self.port}/"

    def push(self, rgb: np.ndarray) -> None:
        data = _encode_jpeg(np.ascontiguousarray(rgb), self._quality)
        with self._cond:
            self._jpeg = data
            self._seq += 1
            self._cond.notify_all()

    def close(self) -> None:
        with self._cond:
            self._closed = True
            self._cond.notify_all()
        self._httpd.shutdown()
        self._httpd.server_close()


class LiveViewer:
    """Draw-then-present per-frame viewer (reference CompVWindow flow).

    backend: ``"mjpeg"`` (default — headless/browser), ``"matplotlib"``
    (interactive window), or ``"none"``. All annotation arguments accept
    device or host arrays; annotation itself runs host-side (viz/draw.py),
    mirroring the reference's canvas draw calls
    (drawing/compv_canvas.cxx drawLines/drawPoints/drawText).
    """

    def __init__(self, backend: str = "mjpeg", title: str = "compv-tpu",
                 **kw):
        self.backend = backend
        self.frames_shown = 0
        if backend == "mjpeg":
            self._server = MJPEGServer(**kw)
            print(f"[viz] live view at {self._server.url}")
        elif backend == "matplotlib":
            import matplotlib.pyplot as plt
            self._plt = plt
            plt.ion()
            self._fig, self._ax = plt.subplots(num=title)
            self._im = None
        elif backend != "none":
            raise ValueError(f"unknown viewer backend {backend!r}")

    def annotate(self, frame, points=None, valid=None, lines=None,
                 boxes=None, trajectory=None, text: str = "") -> np.ndarray:
        img = draw.to_rgb(np.asarray(frame))
        if points is not None:
            xy = np.asarray(getattr(points, "xy", points))
            v = valid
            if v is None and hasattr(points, "count"):
                v = np.arange(xy.shape[0]) < int(points.count)
            img = draw.draw_points(img, xy, v)
        if lines is not None:
            img = draw.draw_lines(img, np.asarray(lines))
        if boxes is not None:
            img = draw.draw_boxes(img, np.asarray(boxes))
        if text:
            img = draw.draw_text(img, text, 8, 8)
        if trajectory is not None:
            panel = draw.draw_trajectory(np.asarray(trajectory),
                                         size=img.shape[0])
            img = np.concatenate([img, draw.to_rgb(panel)], axis=1)
        return img

    def show(self, frame, **annotations) -> None:
        img = self.annotate(frame, **annotations)
        self.frames_shown += 1
        if self.backend == "mjpeg":
            self._server.push(img)
        elif self.backend == "matplotlib":
            if self._im is None:
                self._im = self._ax.imshow(img)
                self._ax.axis("off")
            else:
                self._im.set_data(img)
            self._fig.canvas.draw_idle()
            self._plt.pause(0.001)

    @property
    def url(self) -> Optional[str]:
        return self._server.url if self.backend == "mjpeg" else None

    def close(self) -> None:
        if self.backend == "mjpeg":
            self._server.close()
        elif self.backend == "matplotlib":
            self._plt.close(self._fig)
