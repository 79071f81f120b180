"""Pallas TPU kernels for the hot ops (SURVEY §2.6 "critical" group).

Each kernel has a jnp reference formulation elsewhere in the package; the
`dispatch` helpers pick the Pallas path on TPU and fall back to interpret
mode (tests) or the jnp path (CPU) otherwise.
"""
from .dispatch import on_tpu, pallas_enabled, interpret_mode  # noqa: F401
