"""Kernel dispatch policy.

The reference dispatches per-op between scalar C++ / intrinsics / hand asm
based on `CompVCpu` kill-switches (base/include/compv/base/compv_cpu.h:
101-137); unit tests sweep those switches. Our analogue: every hot op has a
jnp formulation (the "scalar reference") and a Pallas kernel; dispatch is by
backend, overridable via env for the test sweep:

  COMPV_TPU_PALLAS=0          force jnp everywhere (kill-switch)
  COMPV_TPU_PALLAS=interpret  run Pallas kernels in interpreter mode (CPU CI)
  COMPV_TPU_PALLAS=1          force Pallas (compiled) even off-TPU
"""
from __future__ import annotations

import os
from functools import lru_cache

import jax


@lru_cache(maxsize=None)
def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _env() -> str:
    return os.environ.get("COMPV_TPU_PALLAS", "auto")


def pallas_enabled() -> bool:
    """Should ops route to their Pallas kernel?"""
    e = _env()
    if e == "0":
        return False
    if e in ("1", "interpret"):
        return True
    return on_tpu()


def interpret_mode() -> bool:
    """Pass interpret=True to pallas_call (CPU testing of kernel logic)."""
    e = _env()
    if e == "interpret":
        return True
    if e == "1":
        return not on_tpu()
    return False
