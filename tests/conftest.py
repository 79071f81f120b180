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
#
# EXCEPT the VO-family modules: the XLA CPU executable (de)serializer
# segfaults/aborts on the big VO `_track_step` scan executables — on
# serialize (put_executable_and_time) in 5+ full-suite and isolated
# test_vo* runs, and on DEserialize (get_executable_and_time) once entries
# exist. Plain compilation of the same programs is fine (pre-cache suites
# were green), so the VO modules opt out of the persistent cache entirely
# via pytest_runtest_setup below; everything else keeps read+write caching.
_cache_dir = os.environ.get("COMPV_TEST_CACHE_DIR") or os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# Modules whose executables trip the XLA CPU (de)serializer crash above.
_CACHE_UNSAFE_PREFIXES = ("tests.test_vo", "tests.test_tum_e2e",
                          "test_vo", "test_tum_e2e")
_cache_off = False


def pytest_runtest_setup(item):
    global _cache_off
    if _cache_off:
        return
    mod = getattr(item, "module", None)
    name = getattr(mod, "__name__", "")
    if name.startswith(_CACHE_UNSAFE_PREFIXES):
        jax.config.update("jax_compilation_cache_dir", None)
        _cache_off = True


# ---- VO-family subprocess isolation -----------------------------------
# The XLA CPU compiler SEGFAULTS on the big VO `_track_step` scan programs
# when the process has already executed most of the suite (reproduced at
# the identical spot in 3 configurations: crash in executable serialize,
# in cache-entry deserialize, and — with the cache fully off — in
# backend_compile_and_load itself).  The same modules are green in a fresh
# process (cache off).  So in a FULL-SUITE session the VO-family modules
# are deferred to one fresh subprocess, launched by
# tests/test_zzz_vo_family.py (alphabetically last); small/targeted
# sessions (e.g. `pytest tests/test_vo_long.py`) run in-process as usual.
_VO_FILES = ("test_vo.py", "test_vo_geometry.py", "test_vo_long.py",
             "test_tum_e2e.py")


def pytest_collection_modifyitems(config, items):
    if os.environ.get("COMPV_VO_INNER"):
        return
    vo = [i for i in items
          if os.path.basename(str(i.fspath)) in _VO_FILES]
    rest = [i for i in items if os.path.basename(str(i.fspath))
            not in _VO_FILES]
    if vo and len(rest) > 40:
        config._compv_deferred_vo = sorted({str(i.fspath) for i in vo})
        items[:] = rest


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
