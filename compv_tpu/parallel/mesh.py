"""Device-mesh helpers.

The TPU-native replacement for the reference's whole parallel runtime
(base/parallel/, SURVEY §2.2): CompVThreadDispatcher::dispatchDividingAcrossY
row-slicing becomes SPMD sharding over a jax Mesh; invoke/wait joins become
XLA collectives. There is no cost-model heuristic to port — XLA owns
intra-chip parallelism; we own the inter-chip layout here.

Axis conventions used across compv_tpu.parallel:
  "data"  — observations / frames / query rows   (DP analogue)
  "map"   — landmarks / train descriptors / map blocks (the reference's
            closest concept is per-pyramid-level fan-out; for SLAM this is
            keyframe/map-block ownership — SP/CP analogue)
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (SURVEY §7 step 6: mesh over {hosts x chips}).
    On GCE TPU pods jax.distributed.initialize() autodetects everything;
    pass explicit args elsewhere. Safe to call once per process before any
    device use; no-op if already initialized."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError:
        pass  # already initialized


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axis_names: Sequence[str] = ("data",),
              devices=None) -> Mesh:
    """Build a mesh over the available devices (across ALL hosts when
    jax.distributed is initialized — jax.devices() is global). Default:
    1-D "data" mesh over all devices.

    For {hosts x chips} meshes pass shape=(n_hosts, chips_per_host) with
    axis_names=("dcn", "ici") and keep heavy collectives on the "ici" axis —
    jax orders jax.devices() host-major, so this reshape puts the fast
    interconnect on the inner axis."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (devs.size,)
    assert int(np.prod(shape)) == devs.size, (shape, devs.size)
    return Mesh(devs.reshape(shape), axis_names=tuple(axis_names))


def shard(mesh: Mesh, spec: P):
    return NamedSharding(mesh, spec)


def pad_to_multiple(x, multiple: int, axis: int = 0, fill=0):
    """Pad axis to a multiple so it divides evenly across a mesh axis."""
    import jax.numpy as jnp
    n = x.shape[axis]
    target = -(-n // multiple) * multiple
    if target == n:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - n)
    return jnp.pad(x, pad, constant_values=fill)
