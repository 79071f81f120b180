"""Worker process for the 2-process virtual-DCN smoke test
(tests/test_parallel.py::TestTwoProcessDCN). Launched twice by the test:

    python tests/dcn_worker.py <process_id> <coordinator_port> <out_dir>

Each process contributes 4 virtual CPU devices; jax.distributed stitches
them into one 8-device ("dcn", "ici") mesh (2 processes x 4 local chips —
the cross-process axis stands in for the data-center network, the local
axis for ICI). The worker runs the SAME sharded programs the single-process
tests run (dist_match over the train axis, dist_ba over observations) on
deterministic inputs and writes its replicated results; the test asserts
both processes agree with the single-process oracle. Closest honest
approximation of the >=0.8 two-host scaling north-star this 1-chip
environment allows (SURVEY section 7 step 6).
"""
import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
out_dir = sys.argv[3]

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from compv_tpu.core.types import Descriptors
from compv_tpu.parallel import dist_match

devs = np.asarray(jax.devices()).reshape(2, 4)
mesh = Mesh(devs, ("dcn", "ici"))
assert len(jax.devices()) == 8, jax.devices()

rng = np.random.default_rng(0)
qb = jnp.asarray(rng.integers(0, 2 ** 32, (64, 8), np.uint64)
                 .astype(np.uint32))
tb = jnp.asarray(rng.integers(0, 2 ** 32, (256, 8), np.uint64)
                 .astype(np.uint32))
q = Descriptors(bits=qb, count=jnp.asarray(64, jnp.int32))
t = Descriptors(bits=tb, count=jnp.asarray(250, jnp.int32))

# flatten both axes into one 8-way data axis (DCN x ICI hierarchical)
flat = Mesh(devs.reshape(-1), ("data",))
m = dist_match.match_sharded(q, t, flat, knn=2)
ti, dist = jax.device_get((m.train_idx, m.distance))

# observation-sharded bundle adjustment across both processes
from compv_tpu.core.config import BAConfig
from compv_tpu.parallel import dist_ba
from compv_tpu.slam import ba
from compv_tpu.slam.camera import Intrinsics, project

P, L, O = 4, 32, 256
poses = jnp.asarray(rng.normal(0, 0.05, (P, 6)), jnp.float32)
points = jnp.asarray(
    rng.uniform([-2, -2, 4], [2, 2, 8], (L, 3)), jnp.float32)
obs_pose = jnp.asarray(rng.integers(0, P, O), jnp.int32)
obs_point = jnp.asarray(rng.integers(0, L, O), jnp.int32)
intr = Intrinsics.make(100.0, 100.0, 64.0, 48.0)
uv = jax.vmap(lambda f, l: project(poses[f], intr, points[l]))(
    obs_pose, obs_point)
uv = uv + jnp.asarray(rng.normal(0, 0.3, uv.shape), jnp.float32)
prob = ba.BAProblem(
    poses=poses, points=points, obs_pose=obs_pose, obs_point=obs_point,
    obs_uv=uv, obs_valid=jnp.ones((O,), bool),
    fixed_poses=jnp.zeros((P,), bool).at[0].set(True))
new_poses, new_points, stats = dist_ba.bundle_adjust_sharded(
    prob, intr, flat, BAConfig(max_iters=5))
new_poses, new_points, c0, c1 = jax.device_get(
    (new_poses, new_points, stats.initial_cost, stats.final_cost))

np.savez(os.path.join(out_dir, f"worker_{pid}.npz"), ti=ti, dist=dist,
         ba_poses=new_poses, ba_points=new_points,
         ba_c0=c0, ba_c1=c1)
print(f"worker {pid} OK", flush=True)
