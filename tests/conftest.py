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

# NO persistent compilation cache: the XLA CPU executable (de)serializer
# in this jax build segfaults nondeterministically once the process has
# accumulated compiled executables — reproduced on SERIALIZE
# (put_executable_and_time, big VO scan programs, 5+ runs), on DESERIALIZE
# (get_executable_and_time — both the VO programs at 87% of the suite and
# a SMALL se3/BA program at 27%), while plain compilation of the same
# programs in a fresh process is green.  Cold compiles are slower but
# deterministic; a crashed suite is worth less than a slow one.  Opt back
# in explicitly with COMPV_TEST_CACHE_DIR (for bisecting, never CI).
_cache_dir = os.environ.get("COMPV_TEST_CACHE_DIR")
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


# ---- whole-suite subprocess sharding -----------------------------------
# The XLA CPU compiler in this jax build SEGFAULTS once one process has
# accumulated enough compiled executables — first seen on the big VO
# `_track_step` scan programs (~87% of a full run), then on a small se3/BA
# program (27%), then in test_mser (62%) after an unrelated CCL change
# shifted the program mix.  The crash follows cumulative compile count,
# not any specific module, so per-module quarantine is whack-a-mole.
# Mitigation: a FULL-SUITE session defers every test module into small
# fresh-subprocess groups launched by tests/test_zzz_isolated.py; each
# group stays far below the observed crash threshold.  Targeted sessions
# (e.g. `pytest tests/test_vo.py`) run in-process as usual.
_INNER_ENV = "COMPV_ISOLATED_INNER"

# Modules pinned into their own groups: the VO family holds the biggest
# programs (an all-VO process crashed at its 14th big compile), so it is
# split in two; everything else is chunked alphabetically.
_PINNED_GROUPS = (("test_vo.py", "test_vo_geometry.py"),
                  ("test_vo_long.py", "test_tum_e2e.py"),
                  ("test_kitti_e2e.py",))
_CHUNK = 3  # unpinned modules per subprocess group


def pytest_collection_modifyitems(config, items):
    if os.environ.get(_INNER_ENV) or os.environ.get("COMPV_NO_ISOLATION"):
        return
    launcher = "test_zzz_isolated.py"
    by_file = {}
    for i in items:
        by_file.setdefault(os.path.basename(str(i.fspath)), []).append(i)
    if launcher not in by_file or len(items) <= 40:
        return  # targeted session: run in-process
    pinned = {f for g in _PINNED_GROUPS for f in g}
    groups = [list(g) for g in _PINNED_GROUPS
              if any(f in by_file for f in g)]
    rest = sorted(f for f in by_file if f != launcher and f not in pinned)
    groups = [[f for f in g if f in by_file] for g in groups]
    groups += [rest[i:i + _CHUNK] for i in range(0, len(rest), _CHUNK)]
    config._compv_isolated_groups = [g for g in groups if g]
    items[:] = by_file[launcher]


import numpy as np
import pytest


def pytest_addoption(parser):
    """--real-data: run the full-ATE evaluations on downloaded TUM/KITTI
    sequences (tools/fetch_datasets.sh); skipped by default because no
    dataset ships in this image (round-2 VERDICT item 10)."""
    parser.addoption("--real-data", action="store_true", default=False,
                     help="run ATE tests against real TUM/KITTI data")
    parser.addoption("--data-dir", action="store", default="data",
                     help="dataset root (see tools/fetch_datasets.sh)")


@pytest.fixture(scope="session")
def real_data_dir(request):
    if not request.config.getoption("--real-data"):
        pytest.skip("real-data evaluation disabled (pass --real-data)")
    return request.config.getoption("--data-dir")


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
