"""Bitwise operations on images/arrays.

Re-design of CompVBits (base/compv_bits.cxx + compv_bits_x64_sse.s, ~1.5k
LoC asm: and/or/xor/not over u8 buffers, popcount): on TPU these are single
fused VPU ops; popcount uses lax.population_count.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bits_and(a: jax.Array, b: jax.Array) -> jax.Array:
    return a & b


def bits_or(a: jax.Array, b: jax.Array) -> jax.Array:
    return a | b


def bits_xor(a: jax.Array, b: jax.Array) -> jax.Array:
    return a ^ b


def bits_not(a: jax.Array) -> jax.Array:
    return ~a


def bits_not_and(a: jax.Array, b: jax.Array) -> jax.Array:
    """(~a) & b (reference CompVBits::logical_not_and)."""
    return (~a) & b


def popcount(a: jax.Array) -> jax.Array:
    """Per-element set-bit count (reference uses Mula's SIMD popcount for
    hamming; here it is a native VPU op)."""
    return jax.lax.population_count(a)


def popcount_total(a: jax.Array) -> jax.Array:
    """Total set bits of an integer array."""
    return jnp.sum(jax.lax.population_count(a).astype(jnp.int32))
