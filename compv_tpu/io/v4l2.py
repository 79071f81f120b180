"""Linux V4L2 camera capture — the OS camera backend.

Reference: the camera module + OS plugins (camera/compv_camera.cxx:47-105
dlopens MFoundation / DirectShow / Android capture plugins and exposes
caps {width, height, fps, subtype} plus `setCallbackOnNewFrame`). A TPU
host is a Linux box, so the native backend here is Video4Linux2, spoken
directly through stdlib ctypes ioctls + mmap — no shared-lib plugin, no
compiled dependency. Captured YUYV/UYVY frames feed the packed-422 TPU
conversions (ops/color.py) exactly like the reference's chroma-subtype
negotiation (camera/compv_camera.cxx bestSize/subType matching).

Typical use::

    cam = V4L2Camera("/dev/video0", 1280, 720, fps=30)
    src = cam.source()               # io.camera.FrameSource of raw frames
    for buf in src:                  # (H, W, 2) uint8 packed YUYV
        rgb = color.yuyv422_to_rgb(jnp.asarray(buf))

Everything below matches the V4L2 userspace ABI (linux/videodev2.h); the
struct layouts are pinned by tests against the known 64-bit ioctl codes.
"""
from __future__ import annotations

import ctypes
import fcntl
import glob
import mmap
import os
import select
from typing import List, Optional

import numpy as np

# ---- ioctl plumbing (linux/ioctl.h macros) ----
_IOC_WRITE, _IOC_READ = 1, 2


def _ioc(direction: int, nr: int, size: int, ioc_type: int = ord("V")) -> int:
    return (direction << 30) | (size << 16) | (ioc_type << 8) | nr


# ---- V4L2 structs (64-bit userspace ABI) ----
class v4l2_capability(ctypes.Structure):
    _fields_ = [("driver", ctypes.c_char * 16),
                ("card", ctypes.c_char * 32),
                ("bus_info", ctypes.c_char * 32),
                ("version", ctypes.c_uint32),
                ("capabilities", ctypes.c_uint32),
                ("device_caps", ctypes.c_uint32),
                ("reserved", ctypes.c_uint32 * 3)]


class v4l2_pix_format(ctypes.Structure):
    _fields_ = [("width", ctypes.c_uint32),
                ("height", ctypes.c_uint32),
                ("pixelformat", ctypes.c_uint32),
                ("field", ctypes.c_uint32),
                ("bytesperline", ctypes.c_uint32),
                ("sizeimage", ctypes.c_uint32),
                ("colorspace", ctypes.c_uint32),
                ("priv", ctypes.c_uint32),
                ("flags", ctypes.c_uint32),
                ("ycbcr_enc", ctypes.c_uint32),
                ("quantization", ctypes.c_uint32),
                ("xfer_func", ctypes.c_uint32)]


class _fmt_union(ctypes.Union):
    _fields_ = [("pix", v4l2_pix_format),
                ("raw_data", ctypes.c_uint8 * 200)]


class v4l2_format(ctypes.Structure):
    # the union holds pointer-bearing members in the kernel header, so the
    # struct is 8-aligned: 8 bytes of type+padding then the 200-byte union
    _fields_ = [("type", ctypes.c_uint32),
                ("_pad", ctypes.c_uint32),
                ("fmt", _fmt_union)]


class v4l2_requestbuffers(ctypes.Structure):
    _fields_ = [("count", ctypes.c_uint32),
                ("type", ctypes.c_uint32),
                ("memory", ctypes.c_uint32),
                ("capabilities", ctypes.c_uint32),
                ("flags", ctypes.c_uint8),
                ("reserved", ctypes.c_uint8 * 3)]


class _timeval(ctypes.Structure):
    _fields_ = [("tv_sec", ctypes.c_long), ("tv_usec", ctypes.c_long)]


class v4l2_timecode(ctypes.Structure):
    _fields_ = [("type", ctypes.c_uint32), ("flags", ctypes.c_uint32),
                ("frames", ctypes.c_uint8), ("seconds", ctypes.c_uint8),
                ("minutes", ctypes.c_uint8), ("hours", ctypes.c_uint8),
                ("userbits", ctypes.c_uint8 * 4)]


class _buf_m(ctypes.Union):
    _fields_ = [("offset", ctypes.c_uint32),
                ("userptr", ctypes.c_ulong),
                ("planes", ctypes.c_void_p),
                ("fd", ctypes.c_int32)]


class v4l2_buffer(ctypes.Structure):
    _fields_ = [("index", ctypes.c_uint32),
                ("type", ctypes.c_uint32),
                ("bytesused", ctypes.c_uint32),
                ("flags", ctypes.c_uint32),
                ("field", ctypes.c_uint32),
                ("_pad", ctypes.c_uint32),
                ("timestamp", _timeval),
                ("timecode", v4l2_timecode),
                ("sequence", ctypes.c_uint32),
                ("memory", ctypes.c_uint32),
                ("m", _buf_m),
                ("length", ctypes.c_uint32),
                ("reserved2", ctypes.c_uint32),
                ("request_fd", ctypes.c_uint32)]


class v4l2_captureparm(ctypes.Structure):
    _fields_ = [("capability", ctypes.c_uint32),
                ("capturemode", ctypes.c_uint32),
                ("tpf_numerator", ctypes.c_uint32),
                ("tpf_denominator", ctypes.c_uint32),
                ("extendedmode", ctypes.c_uint32),
                ("readbuffers", ctypes.c_uint32),
                ("reserved", ctypes.c_uint32 * 4)]


class _parm_union(ctypes.Union):
    _fields_ = [("capture", v4l2_captureparm),
                ("raw_data", ctypes.c_uint8 * 200)]


class v4l2_streamparm(ctypes.Structure):
    _fields_ = [("type", ctypes.c_uint32),
                ("parm", _parm_union)]


# ---- ioctl request codes, derived from the struct sizes above ----
VIDIOC_QUERYCAP = _ioc(_IOC_READ, 0, ctypes.sizeof(v4l2_capability))
VIDIOC_S_FMT = _ioc(_IOC_READ | _IOC_WRITE, 5, ctypes.sizeof(v4l2_format))
VIDIOC_REQBUFS = _ioc(_IOC_READ | _IOC_WRITE, 8,
                      ctypes.sizeof(v4l2_requestbuffers))
VIDIOC_QUERYBUF = _ioc(_IOC_READ | _IOC_WRITE, 9, ctypes.sizeof(v4l2_buffer))
VIDIOC_QBUF = _ioc(_IOC_READ | _IOC_WRITE, 15, ctypes.sizeof(v4l2_buffer))
VIDIOC_DQBUF = _ioc(_IOC_READ | _IOC_WRITE, 17, ctypes.sizeof(v4l2_buffer))
VIDIOC_STREAMON = _ioc(_IOC_WRITE, 18, 4)
VIDIOC_STREAMOFF = _ioc(_IOC_WRITE, 19, 4)
VIDIOC_S_PARM = _ioc(_IOC_READ | _IOC_WRITE, 22,
                     ctypes.sizeof(v4l2_streamparm))

V4L2_BUF_TYPE_VIDEO_CAPTURE = 1
V4L2_MEMORY_MMAP = 1
V4L2_CAP_VIDEO_CAPTURE = 0x00000001
V4L2_CAP_STREAMING = 0x04000000


def fourcc(code: str) -> int:
    a, b, c, d = (ord(ch) for ch in code)
    return a | (b << 8) | (c << 16) | (d << 24)


PIXEL_FORMATS = {
    "YUYV": fourcc("YUYV"),
    "UYVY": fourcc("UYVY"),
    "GREY": fourcc("GREY"),
    "RGB3": fourcc("RGB3"),   # packed RGB24
}


def list_devices() -> List[str]:
    """Enumerate /dev/video* capture nodes (reference
    CompVCamera::devices())."""
    return sorted(glob.glob("/dev/video*"))


class V4L2Camera:
    """Streaming-mmap V4L2 capture device.

    Mirrors the reference camera caps surface: negotiated width/height/fps
    and subtype are readable after open; frames arrive as numpy views
    shaped (H, W, 2) for packed 422, (H, W) for GREY, (H, W, 3) for RGB3.
    """

    def __init__(self, device: str = "/dev/video0", width: int = 640,
                 height: int = 480, fps: float = 30.0,
                 pixel_format: str = "YUYV", n_buffers: int = 4):
        if pixel_format not in PIXEL_FORMATS:
            raise ValueError(f"unsupported pixel_format {pixel_format!r}; "
                             f"one of {sorted(PIXEL_FORMATS)}")
        self.device = device
        self.pixel_format = pixel_format
        self._fd = os.open(device, os.O_RDWR | os.O_NONBLOCK)
        self._maps: List[mmap.mmap] = []
        self._streaming = False
        try:
            cap = v4l2_capability()
            fcntl.ioctl(self._fd, VIDIOC_QUERYCAP, cap)
            caps = (cap.device_caps or cap.capabilities)
            if not (caps & V4L2_CAP_VIDEO_CAPTURE
                    and caps & V4L2_CAP_STREAMING):
                raise OSError(f"{device} is not a streaming capture device")
            self.card = cap.card.decode(errors="replace")

            fmt = v4l2_format()
            fmt.type = V4L2_BUF_TYPE_VIDEO_CAPTURE
            fmt.fmt.pix.width = width
            fmt.fmt.pix.height = height
            fmt.fmt.pix.pixelformat = PIXEL_FORMATS[pixel_format]
            fmt.fmt.pix.field = 1  # V4L2_FIELD_NONE
            fcntl.ioctl(self._fd, VIDIOC_S_FMT, fmt)
            if fmt.fmt.pix.pixelformat != PIXEL_FORMATS[pixel_format]:
                raise OSError(f"{device} refused {pixel_format}")
            # the driver may clamp the size — report what it granted
            self.width = int(fmt.fmt.pix.width)
            self.height = int(fmt.fmt.pix.height)
            self.bytesperline = int(fmt.fmt.pix.bytesperline)
            self.sizeimage = int(fmt.fmt.pix.sizeimage)

            parm = v4l2_streamparm()
            parm.type = V4L2_BUF_TYPE_VIDEO_CAPTURE
            parm.parm.capture.tpf_numerator = 1
            parm.parm.capture.tpf_denominator = max(int(round(fps)), 1)
            try:
                fcntl.ioctl(self._fd, VIDIOC_S_PARM, parm)
                d = parm.parm.capture.tpf_denominator
                n = parm.parm.capture.tpf_numerator
                self.fps = (d / n) if n else fps
            except OSError:
                self.fps = fps  # fixed-rate devices reject S_PARM

            req = v4l2_requestbuffers()
            req.count = n_buffers
            req.type = V4L2_BUF_TYPE_VIDEO_CAPTURE
            req.memory = V4L2_MEMORY_MMAP
            fcntl.ioctl(self._fd, VIDIOC_REQBUFS, req)
            if req.count < 1:
                raise OSError(f"{device}: no mmap buffers granted")
            for i in range(req.count):
                buf = v4l2_buffer()
                buf.index = i
                buf.type = V4L2_BUF_TYPE_VIDEO_CAPTURE
                buf.memory = V4L2_MEMORY_MMAP
                fcntl.ioctl(self._fd, VIDIOC_QUERYBUF, buf)
                self._maps.append(mmap.mmap(
                    self._fd, buf.length, mmap.MAP_SHARED,
                    mmap.PROT_READ | mmap.PROT_WRITE,
                    offset=buf.m.offset))
                fcntl.ioctl(self._fd, VIDIOC_QBUF, buf)
        except BaseException:
            self.close()
            raise

    # -- streaming --
    def start(self) -> None:
        if not self._streaming:
            fcntl.ioctl(self._fd, VIDIOC_STREAMON,
                        ctypes.c_int(V4L2_BUF_TYPE_VIDEO_CAPTURE))
            self._streaming = True

    def stop(self) -> None:
        if self._streaming:
            fcntl.ioctl(self._fd, VIDIOC_STREAMOFF,
                        ctypes.c_int(V4L2_BUF_TYPE_VIDEO_CAPTURE))
            self._streaming = False

    def read(self, timeout: float = 2.0) -> Optional[np.ndarray]:
        """Dequeue one frame (blocking up to `timeout`); None on timeout."""
        self.start()
        r, _, _ = select.select([self._fd], [], [], timeout)
        if not r:
            return None
        buf = v4l2_buffer()
        buf.type = V4L2_BUF_TYPE_VIDEO_CAPTURE
        buf.memory = V4L2_MEMORY_MMAP
        fcntl.ioctl(self._fd, VIDIOC_DQBUF, buf)
        try:
            raw = np.frombuffer(self._maps[buf.index],
                                np.uint8)[: buf.bytesused].copy()
        finally:
            fcntl.ioctl(self._fd, VIDIOC_QBUF, buf)
        return self._shape(raw)

    def _shape(self, raw: np.ndarray) -> np.ndarray:
        h, w = self.height, self.width
        bpp = {"YUYV": 2, "UYVY": 2, "RGB3": 3}.get(self.pixel_format, 1)
        # the driver may grant a padded row stride (bytesperline > w*bpp,
        # legal per the V4L2 ABI): slice rows at the stride before packing
        stride = self.bytesperline or w * bpp
        rows = raw[: h * stride].reshape(h, stride)[:, : w * bpp]
        if bpp == 1:
            return np.ascontiguousarray(rows)
        return np.ascontiguousarray(rows.reshape(h, w, bpp))

    def frames(self):
        """Endless frame generator (drops timeouts)."""
        while True:
            f = self.read()
            if f is not None:
                yield f

    def source(self):
        """Wrap as io.camera.FrameSource — the reference run-loop entry."""
        from .camera import FrameSource
        return FrameSource(self.frames(), width=self.width,
                           height=self.height, fps=self.fps)

    def close(self) -> None:
        for m in self._maps:
            try:
                m.close()
            except BufferError:
                pass
        self._maps = []
        if self._fd >= 0:
            try:
                self.stop()
            except OSError:
                pass
            os.close(self._fd)
            self._fd = -1

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
