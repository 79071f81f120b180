"""Runs the VO-family test modules in ONE fresh subprocess during
full-suite sessions (deferred by conftest.pytest_collection_modifyitems).

Why: the XLA CPU compiler segfaults on the big VO `_track_step` scan
programs once the host process has executed most of the suite — seen at
the identical collection point in three configurations (executable
serialize, cache deserialize, and plain backend_compile_and_load with the
persistent cache off) — while the same modules are green from a fresh
process.  Process isolation is the only reliable mitigation found; the
inner run uses the same interpreter, env, and flags.

Named test_zzz_* so the subprocess runs LAST, after the cheap modules.
"""
import os
import subprocess
import sys

import pytest


# One process per GROUP, not one for all four: the crash threshold is
# ~14 big VO compiles per process (a single all-VO subprocess reached it
# and segfaulted at test_vo_long after 14 green tests).  Each group below
# stays under it and has run green as a unit.
_GROUPS = (("test_vo.py", "test_vo_geometry.py"),
           ("test_vo_long.py", "test_tum_e2e.py"))


def _group_of(path):
    base = os.path.basename(path)
    for gi, g in enumerate(_GROUPS):
        if base in g:
            return gi
    return len(_GROUPS)  # future VO files: own group


def test_vo_family_subprocess(request):
    files = getattr(request.config, "_compv_deferred_vo", None)
    if not files:
        pytest.skip("VO-family modules ran in-process (targeted session)")
    env = dict(os.environ, COMPV_VO_INNER="1")
    groups = {}
    for f in files:
        groups.setdefault(_group_of(f), []).append(f)
    for gi in sorted(groups):
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "-x", *groups[gi]],
            env=env, capture_output=True, text=True, timeout=3000,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        sys.stdout.write(r.stdout[-6000:])
        sys.stderr.write(r.stderr[-3000:])
        assert r.returncode == 0, (
            f"VO subprocess group {groups[gi]} failed ({r.returncode})")
