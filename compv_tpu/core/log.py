"""Leveled logging, replacing CompVDebugMgr (base/include/compv/base/
compv_debug.h:50-94). Thin wrapper over the stdlib so host-side subsystems
share one logger; device-side debugging uses jax.debug.print / pl.debug_print.
"""
from __future__ import annotations

import logging
import os

_LOGGER = logging.getLogger("compv_tpu")
if not _LOGGER.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("[compv-tpu %(levelname)s] %(message)s"))
    _LOGGER.addHandler(_h)
    _LOGGER.setLevel(os.environ.get("COMPV_TPU_LOG", "WARNING").upper())


def set_level(level: str) -> None:
    _LOGGER.setLevel(level.upper())


def get_logger() -> logging.Logger:
    return _LOGGER
