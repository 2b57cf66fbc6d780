"""Multi-device sharding on the 8-virtual-device CPU mesh.

This is the rebuild's replacement for the reference's Go concurrency tests
(SURVEY §4.2): correctness of the SPMD sharded search/build path under
jax.sharding, validated without real multi-chip hardware."""

import numpy as np
import pytest

import jax

from kektordb_tpu.index import BruteForceIndex, HNSWConfig, HNSWIndex
from kektordb_tpu.ops import distance as dist
from kektordb_tpu.parallel import ShardedHNSW, make_mesh


@pytest.fixture(scope="module")
def sharded():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    X = rng.normal(size=(4000, 24)).astype(np.float32)
    sh = ShardedHNSW(24, dist.L2,
                     config=HNSWConfig(m=8, ef_construction=64,
                                       ef_search=64, chunk=256),
                     mesh=mesh)
    sh.add_batch([f"v{i}" for i in range(4000)], X)
    oracle = BruteForceIndex(24, dist.L2)
    oracle.add_batch([f"v{i}" for i in range(4000)], X)
    return sh, oracle, X


def test_sharded_recall(sharded):
    sh, oracle, X = sharded
    rng = np.random.default_rng(1)
    Q = rng.normal(size=(64, 24)).astype(np.float32)
    hits = sh.search_ids(Q, 10)
    gd, gi = oracle.search(Q, 10)
    total = 0
    for b in range(64):
        want = {f"v{int(r)}" for r in gi[b] if r >= 0}
        got = {h[0] for h in hits[b]}
        total += len(want & got)
    assert total / (64 * 10) >= 0.9


def test_shard_distribution(sharded):
    sh, _, _ = sharded
    sizes = [len(s) for s in sh.shards]
    assert sum(sizes) == 4000
    assert min(sizes) > 0  # every device holds a shard


def test_sharded_delete(sharded):
    sh, oracle, X = sharded
    assert sh.delete("v7")
    hits = sh.search_ids(X[7][None], 1)
    assert hits[0][0][0] != "v7"
    assert not sh.delete("v7")


def test_sharded_streaming_add(sharded):
    sh, _, X = sharded
    v = X[0] * 0.5 + 10.0
    sh.add("fresh1", v)
    hits = sh.search_ids(v[None], 1)
    assert hits[0][0][0] == "fresh1"
