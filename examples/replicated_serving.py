"""DCN-replicated serving: the multi-host surface, runnable locally.

Each process (= TPU slice / host) holds a FULL copy of a ShardedHNSW; a
query batch fans out 1/R per replica and one all_gather over the replica
axis reassembles the answers — only [B/R, k] tops ever cross DCN
(parallel/distributed.py; DOCUMENTATION.md "Multi-host deployment").

This example runs SINGLE-process on 8 virtual CPU devices (2 replicas x
4 shards) so it works anywhere; on a real cluster the only change is the
boot block at the top (uncomment init_distributed and launch one copy
per host — replica_mesh() then spans processes automatically).
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))   # run from anywhere

import os

# force the 8-virtual-CPU-device simulation so the example runs anywhere
# (even on a 1-chip box); delete this block on a real cluster
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
import jax                               # noqa: E402
jax.config.update("jax_platforms", "cpu")   # wins over exported plugins

# Real cluster boot (one process per host; MUST precede other imports):
# from kektordb_tpu.distboot import init_distributed
# init_distributed("host0:12345", num_processes=R, process_id=r,
#                  num_cpu_devices=4)        # cpu rigs; omit on TPU pods

import numpy as np

from kektordb_tpu.index import HNSWConfig
from kektordb_tpu.ops import distance as dist
from kektordb_tpu.parallel import ShardedHNSW
from kektordb_tpu.parallel import distributed as dlib

# (R, S) mesh: replica axis over processes (or factored locally), shard
# axis over each process's devices
mesh = dlib.replica_mesh(2)

# every replica builds the SAME index from the same write stream —
# deterministic replication (crc32 shard routing, not Python hash)
rng = np.random.default_rng(0)
X = rng.normal(size=(4000, 32)).astype(np.float32)
sh = ShardedHNSW(32, dist.L2, config=HNSWConfig(m=8, ef_construction=64),
                 mesh=dlib.local_shard_mesh(mesh))
sh.add_batch([f"doc{i}" for i in range(4000)], X)

rep = dlib.ReplicatedServing(sh, mesh)

# fan a batch over the replicas (all processes call collectively)
q = X[:6] + 0.01 * rng.normal(size=(6, 32)).astype(np.float32)
hits = rep.search_ids(q, k=3)
for i, row in enumerate(hits):
    print(f"q{i}: {row}")
assert all(row[0][0] == f"doc{i}" for i, row in enumerate(hits))

# health: cross-replica state hash (divergence detector)
vr = rep.verify_replicas()
print("replicas equal:", vr["equal"], " crc:", vr["fingerprint_crc32"])

# degraded mode: if a peer replica dies, collectives would hang — every
# replica holds a full copy, so serve locally until the cluster re-forms
d_local, rows_local = rep.search_local(q, k=3)
print("local (degraded-mode) top1 ids match:",
      [sh.ids.row_to_ext[r] for r in rows_local[:, 0]])
