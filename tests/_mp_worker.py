"""Worker for test_multiprocess: one process of a 2-process jax.distributed
CPU fleet.  Run as:  python _mp_worker.py <coordinator> <n_procs> <pid>

Exercises the REAL multi-process init path (parallel/distributed.py) that
single-process tests can't: coordinator handshake, global device view,
cross-process collectives via a jitted global mean, host_shard disjointness
and make_array_from_process_local_data — the reference's torch.distributed
env init + all_reduce role (train_utils.py:39-51).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")

coord, n_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

# sitecustomize may have imported jax already with JAX_PLATFORMS=axon baked
# into config defaults — override AFTER import (same dance as conftest.py);
# config updates don't initialize the backend, so distributed.initialize
# below still runs first.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# initialize() must run before any backend query (see distributed.py doc)
from moss_speech_decoder_cosy_tpu.parallel import distributed  # noqa: E402

distributed.initialize(coordinator_address=coord, num_processes=n_procs,
                       process_id=pid)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

assert jax.process_count() == n_procs, jax.process_count()
assert jax.process_index() == pid, (jax.process_index(), pid)
assert jax.device_count() == 2 * n_procs, jax.device_count()
assert jax.local_device_count() == 2

mesh = distributed.global_mesh()
assert mesh.devices.size == 2 * n_procs

# per-host batch -> global array; value encodes the process id so the
# global mean proves real cross-process reduction: mean over
# [0,0,1,1] * 10 + local_dev_offset rows
local = np.full((2, 4), 10.0 * pid, np.float32)
local += np.arange(2, dtype=np.float32)[:, None]      # per-local-row offset
batch = distributed.global_batch(local, mesh)
assert batch.shape == (2 * n_procs, 4)


@jax.jit
def global_mean(x):
    return jnp.mean(x)


got = float(global_mean(batch))
rows = np.concatenate([np.full(2, 10.0 * p) + np.arange(2)
                       for p in range(n_procs)])
want = float(rows.mean())
assert abs(got - want) < 1e-6, (got, want)

# a parameter replicated across the fleet + a DP-style psum of per-host
# grads (the DDP all-reduce role)
rep = NamedSharding(mesh, P())
w = jax.device_put(jnp.ones((4,), jnp.float32), rep)


@jax.jit
def step(w, x):
    # per-example "grad" = x row mean; data-sharded -> mean reduces
    # across processes inside the jit (XLA inserts the collective)
    g = jnp.mean(x, axis=0)
    return w - 0.1 * g


w2 = step(w, batch)
want_g = rows.mean()
np.testing.assert_allclose(np.asarray(w2), 1.0 - 0.1 * want_g, rtol=1e-6)

# host_shard: disjoint round-robin coverage
mine = distributed.host_shard(list(range(10)))
assert mine == list(range(10))[pid::n_procs]

print(f"MP_OK pid={pid} mean={got}", flush=True)
