"""Test configuration: run the whole suite on an 8-device virtual CPU mesh so
multi-chip sharding paths are exercised without TPU hardware (mirrors the
reference's CPU-flags kill-switch sweep strategy, unittests/main.cxx:89-94,
adapted: our sweep axis is 1-device vs 8-device mesh + interpret-mode Pallas).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the host env presets the TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# the axon site hook re-registers the TPU tunnel regardless of env; the
# config flag is authoritative
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is dominated by XLA compiles of the
# big RANSAC/LM/BA graphs; caching makes re-runs ~10x faster.
_cache_dir = os.environ.get("COMPV_TEST_CACHE_DIR") or os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def gray_image(rng):
    """Deterministic synthetic 8-bit test image with structure (gradients,
    corners, texture) — stands in for the reference's .yuv assets, which ship
    in a separate data repo not available here."""
    h, w = 240, 320
    yy, xx = np.mgrid[0:h, 0:w]
    img = (
        64.0
        + 64.0 * np.sin(xx / 11.0) * np.cos(yy / 7.0)
        + 48.0 * ((xx // 40 + yy // 40) % 2)   # checkerboard corners
    )
    img += rng.normal(0, 4.0, size=img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


@pytest.fixture(scope="session")
def rgb_image(rng):
    h, w = 120, 160
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
