"""Frame-parallel (DP) frontend over a device mesh.

The reference's only throughput story is one process, N threads (SURVEY §2.2).
On TPU the serving scale-out is data-parallel frames: shard the batch across
the mesh's "data" axis with shard_map; each chip runs the batched Pallas
frontend on its shard, no collectives needed (embarrassingly parallel —
results stay sharded for downstream per-frame work or gather at the end).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..core.config import FastConfig, OrbConfig
from ..core.types import Points
from ..features.fast import fast_detect_batch


def fast_detect_frames(imgs: jax.Array, mesh: Mesh,
                       config: FastConfig = FastConfig(),
                       axis: str = "data") -> Points:
    """Batched FAST over frames sharded across the mesh: (B, H, W) with B a
    multiple of the axis size -> Points with leading dim B."""
    n = mesh.shape[axis]
    assert imgs.shape[0] % n == 0, f"pad batch to a multiple of {n}"

    def local(shard):
        return fast_detect_batch(shard, config)

    fn = shard_map(local, mesh=mesh, in_specs=P(axis, None, None),
                   out_specs=Points(xy=P(axis), strength=P(axis),
                                    angle=P(axis), level=P(axis),
                                    size=P(axis), count=P(axis)))
    return fn(imgs)


def orb_frames(imgs: jax.Array, mesh: Mesh,
               config: OrbConfig = OrbConfig(), axis: str = "data"):
    """ORB detect+describe over sharded frames (vmapped per shard)."""
    from ..features.orb import orb_detect_describe
    from ..core.types import Descriptors
    n = mesh.shape[axis]
    assert imgs.shape[0] % n == 0, f"pad batch to a multiple of {n}"

    def local(shard):
        return jax.vmap(lambda im: orb_detect_describe(im, config))(shard)

    fn = shard_map(
        local, mesh=mesh, in_specs=P(axis, None, None),
        out_specs=(Points(xy=P(axis), strength=P(axis), angle=P(axis),
                          level=P(axis), size=P(axis), count=P(axis)),
                   Descriptors(bits=P(axis), count=P(axis))))
    return fn(imgs)
