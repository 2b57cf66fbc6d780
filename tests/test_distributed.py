"""Multi-host / DCN-replica surface (parallel/distributed.py).

Two layers of evidence (SURVEY §5 "Distributed communication backend"):

1. Single-process: a (2 replicas × 4 shards) mesh factored from the 8
   virtual CPU devices — replicated serving must return the SAME hits as
   the plain sharded search (the replica axis is a pure fan-out).
2. Multi-process: two spawned Python processes form a REAL
   process-spanning JAX cluster (gloo CPU collectives), build identical
   replicas, and run the fanout program — cross-process collectives for
   real, not simulated.
"""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

import jax

from kektordb_tpu.index import BruteForceIndex, HNSWConfig
from kektordb_tpu.ops import distance as dist
from kektordb_tpu.parallel import (ReplicatedServing, ShardedHNSW,
                                   make_mesh, replica_mesh)


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 8
    mesh = make_mesh(4)                      # shard axis: first 4 devices
    rng = np.random.default_rng(7)
    X = rng.normal(size=(2000, 24)).astype(np.float32)
    sh = ShardedHNSW(24, dist.L2,
                     config=HNSWConfig(m=8, ef_construction=64,
                                       ef_search=64, chunk=256),
                     mesh=mesh)
    sh.add_batch([f"v{i}" for i in range(2000)], X)
    oracle = BruteForceIndex(24, dist.L2)
    oracle.add_batch([f"v{i}" for i in range(2000)], X)
    return sh, oracle, X, rng


class TestReplicatedServing:
    def test_parity_with_sharded_search(self, setup):
        sh, oracle, X, rng = setup
        rep = ReplicatedServing(sh, replica_mesh(2))
        q = rng.normal(size=(48, 24)).astype(np.float32)
        d_r, g_r = rep.search(q, 10)
        d_s, g_s = sh.search(q, 10)
        # same result set per query (order ties may swap)
        for b in range(48):
            assert set(map(int, g_r[b])) == set(map(int, g_s[b]))
        assert np.allclose(np.sort(d_r, 1), np.sort(d_s, 1), atol=1e-4)

    def test_recall_vs_oracle(self, setup):
        sh, oracle, X, rng = setup
        rep = ReplicatedServing(sh, replica_mesh(2))
        q = X[:64] + 0.01 * rng.normal(size=(64, 24)).astype(np.float32)
        hits = rep.search_ids(q, 1)
        top1 = sum(1 for b in range(64) if hits[b]
                   and hits[b][0][0] == f"v{b}")
        assert top1 >= 60

    def test_write_then_serve_invalidates_lift(self, setup):
        sh, oracle, X, rng = setup
        rep = ReplicatedServing(sh, replica_mesh(2))
        q = rng.normal(size=(16, 24)).astype(np.float32)
        rep.search(q, 5)                          # warm the lifted cache
        v = rng.normal(size=(24,)).astype(np.float32)
        sh.add("fresh", v)
        hits = rep.search_ids(v[None], 1)
        assert hits[0] and hits[0][0][0] == "fresh"

    def test_mesh_shape_validation(self, setup):
        sh, *_ = setup
        with pytest.raises(ValueError):
            ReplicatedServing(sh, replica_mesh(8))   # 8x1: shard axis 1 != 4


_WORKER = textwrap.dedent("""
    import sys
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    import jax
    jax.config.update("jax_platforms", "cpu")
    # distboot first: backend flags must precede any package import
    from kektordb_tpu.distboot import init_distributed
    init_distributed(f"localhost:{port}", num_processes=nproc,
                     process_id=pid, num_cpu_devices=4)
    from kektordb_tpu.parallel import distributed as dlib
    import numpy as np
    from kektordb_tpu.index import HNSWConfig
    from kektordb_tpu.ops import distance as dist
    from kektordb_tpu.parallel import ShardedHNSW, make_mesh
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc
    # every replica builds the SAME index (deterministic replication)
    rng = np.random.default_rng(11)
    X = rng.normal(size=(600, 16)).astype(np.float32)
    mesh2d = dlib.replica_mesh()               # replica axis = processes
    sh = ShardedHNSW(16, dist.L2,
                     config=HNSWConfig(m=8, ef_construction=48, chunk=128),
                     mesh=dlib.local_shard_mesh(mesh2d))
    sh.add_batch([f"v{i}" for i in range(600)], X)
    rep = dlib.ReplicatedServing(sh, mesh2d)
    assert rep.n_replicas == nproc
    q = X[:32] + 0.01 * rng.normal(size=(32, 16)).astype(np.float32)
    hits = rep.search_ids(q, 1)
    top1 = sum(1 for b in range(32) if hits[b] and hits[b][0][0] == f"v{b}")
    print(f"TOP1={top1}", flush=True)
    assert top1 >= 30, top1
""")


@pytest.mark.slow
def test_two_process_cpu_cluster(tmp_path):
    """Spawn a real 2-process JAX cluster (gloo) and run replicated
    serving through cross-process collectives."""
    wf = tmp_path / "worker.py"
    wf.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)       # worker sets platform itself
    env.pop("XLA_FLAGS", None)           # device count via jax config
    import socket
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, str(wf), str(pid), "2", port],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process cluster deadlocked:\n"
                    + "\n".join(outs))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
        assert "TOP1=" in out, out[-3000:]
    # both replicas must agree on the answers (replicated SPMD)
    t0 = [line for line in outs[0].splitlines() if line.startswith("TOP1=")]
    t1 = [line for line in outs[1].splitlines() if line.startswith("TOP1=")]
    assert t0 == t1


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-q"]))
