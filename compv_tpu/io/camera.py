"""Camera / frame-source abstraction.

Reference: the camera module + OS plugins (camera/compv_camera.cxx:47-105
loads MFoundation/DirectShow/Android plugins; caps width/height/fps;
`setCallbackOnNewFrame(CompVMatPtr)`, `setCallbackOnError`). A TPU host has
no webcam — the equivalent surface is a uniform FrameSource over files /
raw streams / user generators, plus the same callback-style run loop so
applications written against the reference's camera API map 1:1.
"""
from __future__ import annotations

import time
from typing import Callable, Iterable, Iterator, Optional

import numpy as np


class FrameSource:
    """Uniform frame iterator with reference-style caps (width/height/fps).

    Wrap any iterable of numpy frames (RawVideoReader, ImageSequenceReader,
    FfmpegReader, or a generator). `fps` throttles delivery like a live
    camera; 0 = as fast as the source produces.
    """

    def __init__(self, frames: Iterable[np.ndarray], width: int = 0,
                 height: int = 0, fps: float = 0.0):
        self._frames = frames
        self.width = width
        self.height = height
        self.fps = fps

    def __iter__(self) -> Iterator[np.ndarray]:
        period = 1.0 / self.fps if self.fps > 0 else 0.0
        last = 0.0
        for f in self._frames:
            if period:
                now = time.monotonic()
                wait = period - (now - last)
                if wait > 0:
                    time.sleep(wait)
                last = time.monotonic()
            yield f


def run_loop(source: FrameSource,
             on_new_frame: Callable[[np.ndarray], bool],
             on_error: Optional[Callable[[Exception], None]] = None) -> int:
    """Reference-style capture loop (CompVCamera::start + callbacks,
    samples/object_recognition/main.cxx:229): calls `on_new_frame` per frame
    until it returns False or the source ends. Returns frames delivered."""
    n = 0
    for frame in source:
        try:
            n += 1
            if on_new_frame(frame) is False:
                break
        except Exception as e:  # noqa: BLE001 — routed to the error callback
            if on_error is None:
                raise
            on_error(e)
    return n
