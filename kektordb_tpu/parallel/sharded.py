"""Multi-chip index sharding — the distribution surface the reference lacks.

The reference is explicitly single-node ("KektorDB does not support
clustering. It scales vertically", README.md:236); its only parallelism is Go
shared-memory concurrency (SURVEY §2.7). The TPU rebuild adds true SPMD
scaling: vectors are row-sharded into one sub-index per device, every query
searches all shards in lockstep under `shard_map`, and the per-shard top-ef
results merge with an `all_gather` over ICI. Build is embarrassingly parallel:
each device runs the chunk-insert kernels on its own shard. Max index size
therefore scales linearly with chip count (SURVEY §5 "long context"
equivalent).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..index import hnsw_kernels as K
from ..index.hnsw import HNSWConfig, HNSWIndex
from ..ops import distance as dist


def make_mesh(n_devices: Optional[int] = None, axis: str = "shards") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def _stack_states(states: Sequence[K.GraphState]) -> K.GraphState:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


class ShardedHNSW:
    """Row-sharded HNSW over a device mesh.

    Each shard is a full HNSWIndex (hosting its own ID map); global external
    IDs are assigned round-robin to shards. `search` runs one SPMD program:
    per-shard beam search + cross-shard top-k merge over the mesh axis.
    """

    def __init__(self, dim: int, metric: str = dist.L2,
                 precision: str = dist.F32,
                 config: Optional[HNSWConfig] = None,
                 mesh: Optional[Mesh] = None):
        self.mesh = mesh or make_mesh()
        self.axis = self.mesh.axis_names[0]
        self.n_shards = self.mesh.devices.size
        self.dim = dim
        self.metric = metric
        self.precision = precision
        cfg = config or HNSWConfig()
        self.shards = [
            HNSWIndex(dim, metric, precision,
                      HNSWConfig(**{**cfg.__dict__, "seed": cfg.seed + s}))
            for s in range(self.n_shards)
        ]
        self._shard_of: dict[str, int] = {}

    def __len__(self) -> int:
        return sum(len(s) for s in self.shards)

    # -- write path: round-robin scatter, per-shard chunked build ------------

    def add_batch(self, ext_ids: Sequence[str], vectors: np.ndarray,
                  fast: bool = False) -> None:
        vectors = np.asarray(vectors, np.float32)
        buckets: list[list[int]] = [[] for _ in range(self.n_shards)]
        for j, e in enumerate(ext_ids):
            s = hash(e) % self.n_shards
            self._shard_of[e] = s
            buckets[s].append(j)
        for s, rows in enumerate(buckets):
            if rows:
                self.shards[s].add_batch([ext_ids[j] for j in rows],
                                         vectors[rows], fast=fast)

    def add(self, ext_id: str, vector: np.ndarray) -> None:
        s = hash(ext_id) % self.n_shards
        self._shard_of[ext_id] = s
        self.shards[s].add(ext_id, vector)

    def delete(self, ext_id: str) -> bool:
        s = self._shard_of.pop(ext_id, None)
        if s is None:
            return False
        return self.shards[s].delete(ext_id)

    # -- query path: one SPMD program over the mesh ---------------------------

    def _equalize_caps(self) -> None:
        cap = max(s._cap for s in self.shards)
        ucap = max(s._ucap for s in self.shards)
        for s in self.shards:
            if s._cap < cap or s._ucap < ucap:
                s.state = K.grow_state(s.state, cap, ucap)
                s._cap, s._ucap = cap, ucap

    def search(self, queries: np.ndarray, k: int, *,
               ef: Optional[int] = None) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Returns (dists [B,k], shard [B,k], row [B,k]); -1 pads."""
        for s in self.shards:
            s.flush()
        self._equalize_caps()
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        ef = max(ef or self.shards[0].config.ef_search, k)
        q, qn = self.shards[0]._encode(queries)
        stacked = _stack_states([s.state for s in self.shards])
        dual = any(s._deleted_rows for s in self.shards)
        d, sh, rows = _sharded_search(
            self.mesh, self.axis, stacked, q, qn,
            metric=self.metric, ef=ef, k=k, dual=dual)
        return np.asarray(d), np.asarray(sh), np.asarray(rows)

    def search_ids(self, queries: np.ndarray, k: int, **kw):
        d, sh, rows = self.search(queries, k, **kw)
        out = []
        for b in range(rows.shape[0]):
            hits = []
            for j in range(rows.shape[1]):
                s, r = int(sh[b, j]), int(rows[b, j])
                if r >= 0:
                    ext = self.shards[s].ids.row_to_ext[r]
                    if ext is not None:
                        hits.append((ext, float(d[b, j])))
            out.append(hits)
        return out


def _sharded_search(mesh: Mesh, axis: str, stacked: K.GraphState,
                    q: jax.Array, qn: jax.Array, *, metric: str,
                    ef: int, k: int, dual: bool = False):
    """shard_map body: local beam search → all_gather → global top-k merge."""

    def body(state_blk: K.GraphState, q, qn):
        state = jax.tree.map(lambda x: x[0], state_blk)
        d, i = K.beam_search(state, q, qn, metric=metric, ef=ef, dual=dual)
        sid = jax.lax.axis_index(axis)
        d_all = jax.lax.all_gather(d[:, :k], axis)          # [S, B, k]
        i_all = jax.lax.all_gather(i[:, :k], axis)
        S, B, _ = d_all.shape
        sids = jnp.broadcast_to(
            jnp.arange(S, dtype=jnp.int32)[:, None, None], (S, B, k))
        dm = jnp.moveaxis(d_all, 0, 1).reshape(B, S * k)
        im = jnp.moveaxis(i_all, 0, 1).reshape(B, S * k)
        sm = jnp.moveaxis(sids, 0, 1).reshape(B, S * k)
        td, tp = jax.lax.top_k(-dm, k)
        return (-td, jnp.take_along_axis(sm, tp, 1),
                jnp.take_along_axis(im, tp, 1))

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False)
    return fn(stacked, q, qn)
