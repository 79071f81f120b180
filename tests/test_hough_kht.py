"""Hough KHT tests."""
import numpy as np
import jax.numpy as jnp

from compv_tpu.core.config import HoughConfig
from compv_tpu.features import hough_kht


class TestKHT:
    def test_detects_line_segments(self):
        edges = np.zeros((128, 128), np.uint8)
        edges[30, 20:100] = 255          # horizontal segment
        edges[20:110, 80] = 255          # vertical segment
        lines, gs = hough_kht.hough_lines_kht(
            jnp.asarray(edges), HoughConfig(threshold=20, max_lines=8))
        n = int(lines.count)
        assert n >= 2
        rho = np.asarray(lines.rho)[:n]
        theta = np.asarray(lines.theta)[:n]
        has_h = any(abs(t - np.pi / 2) < 0.1 and abs(r - 30) <= 2
                    for r, t in zip(rho, theta))
        has_v = any((abs(t) < 0.1 or abs(t - np.pi) < 0.1) and abs(abs(r) - 80) <= 2
                    for r, t in zip(rho, theta))
        assert has_h and has_v
        assert float(gs) > 0

    def test_diagonal_line(self):
        edges = np.zeros((96, 96), np.uint8)
        for i in range(10, 86):
            edges[i, i] = 255            # 45-degree line y=x
        lines, _ = hough_kht.hough_lines_kht(
            jnp.asarray(edges), HoughConfig(threshold=10, max_lines=4))
        n = int(lines.count)
        assert n >= 1
        t = float(lines.theta[0])
        # normal of y=x is at 135 degrees (3*pi/4); rho ~ 0
        assert abs(t - 3 * np.pi / 4) < 0.1
        assert abs(float(lines.rho[0])) < 3

    def test_empty(self):
        edges = np.zeros((64, 64), np.uint8)
        lines, gs = hough_kht.hough_lines_kht(jnp.asarray(edges),
                                              HoughConfig(threshold=5))
        assert int(lines.count) == 0

    def test_noise_votes_weaker_than_segments(self):
        rng = np.random.default_rng(0)
        edges = np.zeros((128, 128), np.uint8)
        # scattered noise: 200 random single pixels
        ys, xs = rng.integers(0, 128, 200), rng.integers(0, 128, 200)
        edges[ys, xs] = 255
        edges[64, 10:120] = 255          # one strong segment
        lines, _ = hough_kht.hough_lines_kht(
            jnp.asarray(edges), HoughConfig(threshold=20, max_lines=4))
        assert int(lines.count) >= 1
        # the top line is the segment
        assert abs(float(lines.theta[0]) - np.pi / 2) < 0.1
        assert abs(float(lines.rho[0]) - 64) <= 2
