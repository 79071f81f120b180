"""Runs every test module of a full-suite session in small fresh
subprocesses (deferred by conftest.pytest_collection_modifyitems).

Why: the XLA CPU compiler in this jax build segfaults once a process has
accumulated enough compiled executables — reproduced in executable
serialize, cache deserialize, AND plain backend_compile_and_load (cache
off), at moving locations (VO scans at 87%, a small se3/BA program at
27%, test_mser at 62%) while every module is green from a fresh process.
The crash follows cumulative compile count, so process isolation with a
bounded group size is the only reliable mitigation; the inner runs use
the same interpreter, env, and flags.

Named test_zzz_* so it sorts last; in a full-suite session it is the only
test the outer process executes (everything else is deferred into the
groups it launches), so the outer process compiles ~nothing.
"""
import os
import subprocess
import time
import sys

import pytest


def test_isolated_groups(request):
    groups = getattr(request.config, "_compv_isolated_groups", None)
    if not groups:
        pytest.skip("targeted session: modules ran in-process")
    env = dict(os.environ, COMPV_ISOLATED_INNER="1")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # pytest captures this test's stdout until it finishes, so progress
    # also goes to a side log one can `tail -f` during the ~30+ min run
    plog = open(os.path.join(root, ".isolated_progress.log"), "w")
    failures = []
    for gi, files in enumerate(groups):
        args = [os.path.join("tests", f) for f in files]
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", *args],
            env=env, capture_output=True, text=True, timeout=3000, cwd=root)
        tail = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        line = (f"[group {gi + 1}/{len(groups)}] {' '.join(files)}: "
                f"rc={r.returncode} {time.time() - t0:.0f}s {tail}")
        print(line, flush=True)
        plog.write(line + "\n")
        plog.flush()
        if r.returncode != 0:
            sys.stdout.write(r.stdout[-8000:])
            sys.stderr.write(r.stderr[-4000:])
            failures.append((files, r.returncode))
    plog.close()
    assert not failures, f"isolated groups failed: {failures}"
