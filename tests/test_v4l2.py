"""V4L2 capture backend ABI tests.

No camera hardware exists in this environment, so these tests pin the part
that CAN break silently: the ctypes struct layouts must match the Linux
64-bit V4L2 userspace ABI. The ioctl request codes encode each struct's
size, so comparing our derived codes against the kernel's known constants
(from linux/videodev2.h on x86-64) verifies every field offset/padding
choice at once. Plus graceful-failure behavior on missing devices.
(Reference surface: camera/compv_camera.cxx:47-105 plugin loading + caps.)
"""
import os

import pytest

from compv_tpu.io import v4l2


class TestABI:
    def test_ioctl_codes_match_kernel(self):
        # authoritative values from linux/videodev2.h (64-bit)
        assert v4l2.VIDIOC_QUERYCAP == 0x80685600
        assert v4l2.VIDIOC_S_FMT == 0xC0D05605
        assert v4l2.VIDIOC_REQBUFS == 0xC0145608
        assert v4l2.VIDIOC_QUERYBUF == 0xC0585609
        assert v4l2.VIDIOC_QBUF == 0xC058560F
        assert v4l2.VIDIOC_DQBUF == 0xC0585611
        assert v4l2.VIDIOC_STREAMON == 0x40045612
        assert v4l2.VIDIOC_STREAMOFF == 0x40045613
        assert v4l2.VIDIOC_S_PARM == 0xC0CC5616

    def test_fourcc(self):
        assert v4l2.fourcc("YUYV") == 0x56595559
        assert v4l2.PIXEL_FORMATS["GREY"] == 0x59455247

    def test_buffer_m_union_offset(self):
        import ctypes
        # m sits at offset 64 in the 64-bit layout; a wrong timeval size
        # (the classic 32-bit-ABI mistake) shifts it
        assert v4l2.v4l2_buffer.m.offset == 64
        assert ctypes.sizeof(v4l2.v4l2_buffer) == 88


class TestShape:
    def _cam(self, fmt, bytesperline, w=8, h=4):
        cam = v4l2.V4L2Camera.__new__(v4l2.V4L2Camera)
        cam.pixel_format = fmt
        cam.width, cam.height = w, h
        cam.bytesperline = bytesperline
        return cam

    def test_padded_stride_yuyv(self):
        import numpy as np
        w, h, stride = 8, 4, 24   # driver grants 24 > w*2=16 (row padding)
        cam = self._cam("YUYV", stride, w, h)
        raw = np.arange(h * stride, dtype=np.uint8)
        out = cam._shape(raw)
        assert out.shape == (h, w, 2)
        # row r must start at r*stride, not r*w*2
        assert out[1, 0, 0] == stride
        assert out[3, 7, 1] == 3 * stride + 15

    def test_tight_stride_grey(self):
        import numpy as np
        cam = self._cam("GREY", 0)   # bytesperline 0: fall back to w*bpp
        raw = np.arange(4 * 8, dtype=np.uint8)
        out = cam._shape(raw)
        assert out.shape == (4, 8)
        assert out[2, 3] == 2 * 8 + 3


class TestGraceful:
    def test_missing_device_raises(self):
        with pytest.raises(FileNotFoundError):
            v4l2.V4L2Camera("/dev/video_does_not_exist")

    def test_list_devices_returns_list(self):
        devs = v4l2.list_devices()
        assert isinstance(devs, list)

    @pytest.mark.skipif(not os.path.exists("/dev/video0"),
                        reason="no camera hardware")
    def test_real_capture(self):  # pragma: no cover — HW-gated
        with v4l2.V4L2Camera("/dev/video0") as cam:
            frame = cam.read(timeout=5.0)
            assert frame is not None
            assert frame.shape == (cam.height, cam.width, 2)
