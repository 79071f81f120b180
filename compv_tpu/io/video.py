"""Video / frame-stream readers.

Reference: core/video/compv_core_video_reader_ffmpeg.cxx:68-221 (FFmpeg
decode into CompVMat; the writer is an empty stub). Here:

  * RawVideoReader — raw concatenated I420/grayscale frames in one file
    (the reference test-corpus format), zero dependencies;
  * ImageSequenceReader — a directory/list of image files (TUM/KITTI style
    datasets), prefetched by the native C++ FrameLoader when frames are raw
    fixed-size (PGM with constant header / .raw), PIL otherwise;
  * FfmpegReader — container formats via an `ffmpeg` subprocess pipe, gated
    on the binary being installed (it is not in this image).
"""
from __future__ import annotations

import os
import shutil
import subprocess
from typing import Iterator, List, Sequence

import numpy as np

from . import image as image_io


class RawVideoReader:
    """Iterate frames of a raw video blob. format: 'gray' or 'i420'."""

    def __init__(self, path: str, width: int, height: int,
                 fmt: str = "i420"):
        self.path, self.width, self.height, self.fmt = path, width, height, fmt
        ysz = width * height
        self.frame_bytes = ysz if fmt == "gray" else ysz + (ysz // 2)
        self.n_frames = os.path.getsize(path) // self.frame_bytes

    def read(self, idx: int):
        """Frame idx -> (H, W) gray or (y, u, v) planes."""
        if self.fmt == "gray":
            with open(self.path, "rb") as f:
                f.seek(idx * self.frame_bytes)
                buf = np.frombuffer(f.read(self.frame_bytes), np.uint8)
            return buf.reshape(self.height, self.width).copy()
        return image_io.read_yuv420(self.path, self.width, self.height, idx)

    def __len__(self):
        return self.n_frames

    def __iter__(self):
        for i in range(self.n_frames):
            yield self.read(i)


class ImageSequenceReader:
    """Frames from image files (sorted). Uses the native prefetching
    FrameLoader for fixed-size raw/.pgm sequences so disk reads overlap TPU
    compute; falls back to per-file decode otherwise."""

    def __init__(self, paths: Sequence[str], gray: bool = True,
                 prefetch: bool = True, workers: int = 4):
        self.paths: List[str] = sorted(str(p) for p in paths)
        self.gray = gray
        self._loader = None
        if prefetch and self.paths and self.paths[0].endswith(".pgm"):
            # constant-size PGM fast path: same header => same offset
            try:
                first = image_io.read_pgm(self.paths[0])
                # all files must match: a later PGM with different dims or
                # header length would be silently misread at a fixed offset
                sizes = {os.path.getsize(p) for p in self.paths}
                if len(sizes) == 1 and first.dtype == np.uint8:
                    from ..runtime import FrameLoader, available
                    if available():
                        self._shape = first.shape
                        self._offset = (os.path.getsize(self.paths[0])
                                        - first.size)
                        self._loader = FrameLoader(
                            self.paths, os.path.getsize(self.paths[0]),
                            workers=workers)
            except Exception:
                self._loader = None

    @classmethod
    def from_dir(cls, directory: str, pattern: str = "", **kw
                 ) -> "ImageSequenceReader":
        names = [os.path.join(directory, n) for n in sorted(os.listdir(directory))
                 if pattern in n]
        return cls(names, **kw)

    def __len__(self):
        return len(self.paths)

    def __iter__(self) -> Iterator[np.ndarray]:
        if self._loader is not None:
            for raw in self._loader:
                yield raw[self._offset:].reshape(self._shape)
            return
        for p in self.paths:
            yield image_io.imread(p, gray=self.gray)


class RawVideoWriter:
    """Append raw frames to a single blob file (the reference's video writer
    is an EMPTY stub — core/video writer, 0 lines; this one works).
    fmt 'gray': (H, W) uint8 frames; 'i420': (y, u, v) plane tuples."""

    def __init__(self, path: str, fmt: str = "gray"):
        self.fmt = fmt
        self._f = open(path, "wb")
        self.frames_written = 0

    def write(self, frame) -> None:
        if self.fmt == "gray":
            self._f.write(np.ascontiguousarray(frame, np.uint8).tobytes())
        else:
            y, u, v = frame
            for p in (y, u, v):
                self._f.write(np.ascontiguousarray(p, np.uint8).tobytes())
        self.frames_written += 1

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class ImageSequenceWriter:
    """Numbered image files in a directory (PGM/PNG by extension)."""

    def __init__(self, directory: str, pattern: str = "{:06d}.pgm"):
        os.makedirs(directory, exist_ok=True)
        self.directory = directory
        self.pattern = pattern
        self.frames_written = 0

    def write(self, frame) -> str:
        path = os.path.join(self.directory,
                            self.pattern.format(self.frames_written))
        image_io.imwrite(path, np.asarray(frame))
        self.frames_written += 1
        return path


class FfmpegReader:
    """Container video via `ffmpeg` subprocess -> raw gray frames.
    Raises at construction when ffmpeg is absent (this image has none)."""

    def __init__(self, path: str, width: int, height: int):
        if shutil.which("ffmpeg") is None:
            raise RuntimeError(
                "ffmpeg binary not found: container decode unavailable; use "
                "RawVideoReader / ImageSequenceReader")
        self.width, self.height = width, height
        self._proc = subprocess.Popen(
            ["ffmpeg", "-i", path, "-f", "rawvideo", "-pix_fmt", "gray",
             "-s", f"{width}x{height}", "-loglevel", "quiet", "-"],
            stdout=subprocess.PIPE)

    def __iter__(self):
        fsz = self.width * self.height
        while True:
            buf = self._proc.stdout.read(fsz)
            if len(buf) < fsz:
                return
            yield np.frombuffer(buf, np.uint8).reshape(self.height, self.width)

    def close(self):
        if self._proc.poll() is None:
            self._proc.kill()
