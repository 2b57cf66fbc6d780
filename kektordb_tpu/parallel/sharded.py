"""Multi-chip index sharding — the distribution surface the reference lacks.

The reference is explicitly single-node ("KektorDB does not support
clustering. It scales vertically", README.md:236); its only parallelism is Go
shared-memory concurrency (SURVEY §2.7). The TPU rebuild adds true SPMD
scaling: vectors are row-sharded into one sub-index per device, every query
searches all shards in lockstep under `shard_map`, and the per-shard top-k
results merge with an `all_gather` over ICI. Build is embarrassingly parallel:
each device runs the chunk-insert kernels on its own shard. Max index size
therefore scales linearly with chip count (SURVEY §5 "long context"
equivalent).

Engine-facing surface: ShardedHNSW exposes the same contract as HNSWIndex
(global IDMap `ids`, `search(q, k, allow_rows=...) -> (dists, rows)` with
*global* rows) so `Engine.create_index(..., shards=N)` can serve a sharded
index through the ordinary HTTP/metadata/filter machinery.

Serving runs the fused MXU scan per shard by default (ops/scan.py) — the
per-shard arena is scanned locally and only [B, k] tops cross ICI; beam
traversal remains available via mode="beam".
"""

from __future__ import annotations

import functools
import zlib
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from jax.sharding import NamedSharding

from ..index import hnsw_kernels as K
from ..index.base import IDMap
from ..index.hnsw import HNSWConfig, HNSWIndex, encode_block
from ..ops import distance as dist
from ..ops import quantize as quant
from ..ops import scan as scanlib


def make_mesh(n_devices: Optional[int] = None, axis: str = "shards") -> Mesh:
    """The shard-axis mesh for one ShardedHNSW: this PROCESS's devices.

    Arenas are staged host→device, so the shard axis can only span
    addressable devices; in a multi-process world (jax.distributed
    initialized) that is `jax.local_devices()`, and the cross-process
    axis is the REPLICA axis instead — see parallel/distributed.py
    (replica_mesh / ReplicatedServing) for the process-spanning mesh."""
    devs = jax.local_devices() if jax.process_count() > 1 else jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(
            f"requested {n} shards but only {len(devs)} devices are "
            "visible (set XLA_FLAGS=--xla_force_host_platform_device_count)")
    return Mesh(np.array(devs[:n]), (axis,))


def _route(ext_id: str) -> int:
    """Stable id→shard routing hash. Python's builtin hash() is
    randomized per process (PYTHONHASHSEED), which would route the same
    id to DIFFERENT shards on different replicas — DCN-replicated
    serving (parallel/distributed.py) requires every process to build
    the identical layout from the identical write stream."""
    return zlib.crc32(ext_id.encode("utf-8", "surrogatepass"))


def _stack_states(states: Sequence[K.GraphState]) -> K.GraphState:
    """Legacy gather-stack (single-device collect). The resident path is
    ShardedHNSW._get_stacked, which assembles the [S, ...] serving state
    from the per-device shard arrays with ZERO cross-device copies."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


class ShardedHNSW:
    """Row-sharded HNSW/scan index over a device mesh.

    Each shard is a full HNSWIndex with its own local ID map; a global IDMap
    assigns stable *global rows* (gids) used by the engine for metadata and
    filters. `search` runs one SPMD program per batch: per-shard fused scan
    (or beam) + cross-shard top-k merge over the mesh axis.
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
        self.config = config or HNSWConfig()
        devs = list(self.mesh.devices.flat)
        self.shards = [
            HNSWIndex(dim, metric, precision,
                      HNSWConfig(**{**self.config.__dict__,
                                    "seed": self.config.seed + s}),
                      device=devs[s])
            for s in range(self.n_shards)
        ]
        self.ids = IDMap()                      # global ext -> gid
        self._loc_shard = np.full(4096, -1, np.int8)   # gid -> shard
        self._loc_row = np.full(4096, -1, np.int32)    # gid -> local row
        # inverse map for vectorized result translation: [shard, row] -> gid
        self._rev = np.full((self.n_shards, 4096), -1, np.int32)
        self.quantizer = self.shards[0].quantizer
        self.needs_refine = False
        # resident serving state: the [S, ...] mesh-sharded stack of the
        # per-shard pytrees, cached across queries and invalidated by the
        # per-shard version counters — queries dispatch ZERO arena-sized
        # transfers (VERDICT r2 #1). _rev_dev mirrors _rev on device so
        # filtered queries translate gid→(shard,row) inside the program.
        self._stacked: Optional[K.GraphState] = None
        self._stacked_key = None
        self._fp_cache = None            # (stacked_key, fingerprint dict)
        self._rev_dev = None
        self._rev_dirty = True
        # projected-arena stack for serve_proj_dim (see _get_proj):
        # per-shard [cap, p] bf16 + [cap] f32 proj norms, device-resident,
        # version-keyed like _stacked; basis shared across shards so
        # projected scores are comparable at the merge
        self._proj_stacked = None
        self._proj_key = None
        self._proj_parts = None
        self._proj_basis: Optional[jax.Array] = None

    def __len__(self) -> int:
        return len(self.ids)

    @property
    def deleted_count(self) -> int:
        return sum(s.deleted_count for s in self.shards)

    def memory_report(self) -> dict:
        """Per-chip HBM accounting. Each shard holds ~1/S of the arena on
        its own device, so max index size scales linearly with chip count
        (SURVEY §5 'long context' equivalent) — per_shard_bytes is the
        evidence: every entry is the full state footprint of one device."""
        per = [s.memory_report() for s in self.shards]
        return {
            "shards": self.n_shards,
            "per_shard_bytes": [p["device_bytes"] for p in per],
            "device_bytes": int(sum(p["device_bytes"] for p in per)),
            "capacity_rows": int(sum(p["capacity_rows"] for p in per)),
            "rows_used": len(self.ids),
        }

    @property
    def _cap(self) -> int:
        """Global-row (gid) capacity — engine allow-masks size to this."""
        return self._loc_shard.size

    def _grow_loc(self, need: int) -> None:
        if need <= self._loc_shard.size:
            return
        n = self._loc_shard.size
        while n < need:
            n *= 2
        self._loc_shard = np.concatenate(
            [self._loc_shard, np.full(n - self._loc_shard.size, -1, np.int8)])
        self._loc_row = np.concatenate(
            [self._loc_row, np.full(n - self._loc_row.size, -1, np.int32)])

    def _register(self, ext_id: str, shard: int) -> None:
        gid = self.ids.alloc(ext_id)
        self._grow_loc(gid + 1)
        row = self.shards[shard].ids.ext_to_row[ext_id]
        self._loc_shard[gid] = shard
        self._loc_row[gid] = row
        if row >= self._rev.shape[1]:
            n = self._rev.shape[1]
            while n <= row:
                n *= 2
            self._rev = np.concatenate(
                [self._rev, np.full((self.n_shards, n - self._rev.shape[1]),
                                    -1, np.int32)], axis=1)
        self._rev[shard, row] = gid
        self._rev_dirty = True

    # -- resident stacked serving state --------------------------------------

    def _get_stacked(self) -> K.GraphState:
        """The [S, ...] mesh-sharded serving state. Cached across queries;
        rebuilt only after writes (version key) — and even a rebuild moves
        no arena data: each per-shard array already lives on its mesh
        device, so the global array is assembled from the device-local
        buffers (make_array_from_single_device_arrays)."""
        self._equalize_caps()
        key = tuple(s._version for s in self.shards)
        if self._stacked is not None and self._stacked_key == key:
            return self._stacked
        devs = list(self.mesh.devices.flat)
        leaves = []
        for f in K.GraphState._fields:
            leaves.append(self._stack_leaf(
                [getattr(s.state, f) for s in self.shards], devs))
        self._stacked = K.GraphState(*leaves)
        self._stacked_key = key
        return self._stacked

    def _get_proj(self):
        """([S, cap, p] bf16 stacked projections, [S, cap] f32 proj
        norms) for the serve_proj_dim SPMD scan, or None. Each shard's
        projection is computed ON its own device (one [cap,D]x[D,p]
        matmul) and assembled without copies like _get_stacked."""
        p = self.config.serve_proj_dim
        if (not p or p >= self.dim or self._serve_quantized
                or self.shards[0].state.vectors.dtype != jnp.float32):
            return None
        key = tuple(s._version for s in self.shards)
        if self._proj_stacked is not None and self._proj_key == key:
            return self._proj_stacked
        if self._proj_basis is None:
            s0 = self.shards[0]
            used = max(s0.ids.capacity_used, 1)
            sample = np.asarray(
                s0.state.vectors[:min(used, 65536)], np.float32)
            self._proj_basis = jnp.asarray(
                quant.fit_pca_basis(sample, p), jnp.float32)
        devs = list(self.mesh.devices.flat)
        # re-project only shards whose version moved since the last stack
        # (a single streaming add must not trigger S full arena matmuls)
        old = dict(zip(self._proj_key or (), self._proj_parts or ()))             if False else None  # parts tracked positionally below
        parts = self._proj_parts if self._proj_parts is not None             and self._proj_key is not None else [None] * self.n_shards
        old_key = self._proj_key or (None,) * self.n_shards
        for i, (s, d) in enumerate(zip(self.shards, devs)):
            if parts[i] is not None and old_key[i] == s._version                     and parts[i][0].shape[0] == s._cap:
                continue
            basis_d = jax.device_put(self._proj_basis, d)
            pa = s.state.vectors.astype(jnp.float32) @ basis_d
            parts[i] = (pa.astype(jnp.bfloat16),
                        jnp.sum(pa * pa, axis=-1))
        self._proj_parts = parts
        self._proj_stacked = (
            self._stack_leaf([x[0] for x in parts], devs),
            self._stack_leaf([x[1] for x in parts], devs))
        self._proj_key = key
        return self._proj_stacked

    def _stack_leaf(self, xs, devs):
        shape = (self.n_shards,) + tuple(xs[0].shape)
        sharding = NamedSharding(
            self.mesh, P(self.axis, *([None] * xs[0].ndim)))
        parts = [jax.device_put(x.reshape((1,) + tuple(x.shape)), d)
                 for x, d in zip(xs, devs)]
        return jax.make_array_from_single_device_arrays(
            shape, sharding, parts)

    def _unstack_into_shards(self, stacked: K.GraphState) -> None:
        """Scatter a new stacked state back into the per-shard indexes
        without copies (each addressable shard IS the per-device array),
        and prime the cache so the next query restacks nothing."""
        by_dev: dict = {}
        for f in K.GraphState._fields:
            for piece in getattr(stacked, f).addressable_shards:
                by_dev.setdefault(f, {})[piece.device] = piece.data
        for s, d in enumerate(self.mesh.devices.flat):
            leaves = {f: by_dev[f][d].reshape(by_dev[f][d].shape[1:])
                      for f in K.GraphState._fields}
            sh = self.shards[s]
            sh._state = K.GraphState(**leaves)
            sh._version += 1
        self._stacked = stacked
        self._stacked_key = tuple(s._version for s in self.shards)

    def _get_rev_dev(self) -> jax.Array:
        """[S, cap] int32, mesh-sharded: gid of each (shard, local row)."""
        cap = self.shards[0]._cap
        if (not self._rev_dirty and self._rev_dev is not None
                and self._rev_dev.shape[1] == cap):
            return self._rev_dev
        w = self._rev.shape[1]
        if w < cap:
            rev = np.concatenate(
                [self._rev,
                 np.full((self.n_shards, cap - w), -1, np.int32)], axis=1)
        else:
            rev = np.ascontiguousarray(self._rev[:, :cap])
        self._rev_dev = jax.device_put(
            rev, NamedSharding(self.mesh, P(self.axis, None)))
        self._rev_dirty = False
        return self._rev_dev

    def prepare_allow(self, mask: np.ndarray) -> jax.Array:
        """Host bool mask over gids → replicated device [G] bool reusable
        across searches (engine mask cache)."""
        return self._allow_global(mask)

    def _allow_global(self, allow_rows: np.ndarray) -> jax.Array:
        """Global allow (bool [G] over gids, or gid list) → replicated
        device bool [G]; per-shard masks are derived INSIDE the SPMD
        program via the sharded gid map (no [S, cap] host scatter)."""
        G = self._loc_shard.size
        a = np.asarray(allow_rows)
        out = np.zeros(G, bool)
        if a.dtype == bool:
            out[: min(a.size, G)] = a[:G]
        else:
            sel = a[a >= 0].astype(np.int64)
            out[sel[sel < G]] = True
        return jnp.asarray(out)

    # -- write path: hash scatter, SPMD per-device chunked build -------------

    def add_batch(self, ext_ids: Sequence[str], vectors: np.ndarray,
                  fast: bool = False, link: Optional[bool] = None) -> None:
        vectors = np.asarray(vectors, np.float32)
        seen = set()
        for e in ext_ids:
            if e in self.ids or e in seen:
                raise KeyError(f"id already present: {e}")
            seen.add(e)
        buckets: list[list[int]] = [[] for _ in range(self.n_shards)]
        for j, e in enumerate(ext_ids):
            buckets[_route(e) % self.n_shards].append(j)
        if self.n_shards == 1 or len(ext_ids) < self.n_shards:
            for s, rows in enumerate(buckets):
                if rows:
                    block = [ext_ids[j] for j in rows]
                    self.shards[s].add_batch(block, vectors[rows], fast=fast,
                                             link=link)
                    for e in block:
                        self._register(e, s)
            return
        self._spmd_add_batch(ext_ids, vectors, buckets, fast, link)

    def _spmd_add_batch(self, ext_ids: Sequence[str], vectors: np.ndarray,
                        buckets: list[list[int]], fast: bool,
                        link: Optional[bool]) -> None:
        """Build all shards in ONE shard_map program per chunk step: every
        device inserts its own chunk into its own resident sub-index
        simultaneously (the __graft_entry__ step shape as the production
        write path — reference AddBatch parallelism, hnsw_index.go:1457,
        re-expressed as SPMD instead of worker goroutines)."""
        if link is None:
            link = self.config.serve_mode != "scan"
        S = self.n_shards
        C = self.config.chunk if link else max(self.config.chunk, 4096)
        for s in self.shards:
            if link:
                s.flush()
            else:
                s._stage_pending()
        # int8 trains ONE quantizer over the incoming batch and shares it
        # (per-shard scales would make cross-shard scores incommensurable)
        quantized = (self.precision == dist.INT8 or self._serve_quantized)
        if quantized and not bool(self.quantizer.trained):
            v = jnp.asarray(vectors[:25000], jnp.float32)
            if self.metric == dist.COSINE:
                v = dist.normalize(v)
            qs = quant.train(v)
            self.quantizer = qs
            for s in self.shards:
                s.quantizer = qs

        # host phase: allocate local rows, sample levels, pre-grow caps
        rows_s: list[np.ndarray] = []
        lvls_s: list[np.ndarray] = []
        for s, bidx in enumerate(buckets):
            sh = self.shards[s]
            sh._grow_for(len(bidx))
            rows = np.fromiter((sh.ids.alloc(ext_ids[j]) for j in bidx),
                               np.int32, len(bidx))
            lvls = sh._sample_levels(len(bidx))
            rows_s.append(rows)
            lvls_s.append(lvls)
            if link:
                n_up = int((lvls >= 1).sum())
                need = sh._up_next + max(0, n_up - len(sh._up_free))
                while need > sh._ucap:
                    sh.state = K.grow_state(sh.state, sh._cap, sh._ucap * 2)
                    sh._ucap *= 2

        stacked = self._get_stacked()       # equalizes caps first
        # the step loop DONATES the stacked buffers — drop the cache now so
        # a mid-loop failure can't leave a deleted-buffer state cached
        self._stacked = None
        self._stacked_key = None
        dual = any(s._deleted_rows for s in self.shards)
        ef = max(self.config.fast_ef, 2 * self.config.m) if fast \
            else self.config.ef_construction
        steps = max((len(b) + C - 1) // C for b in buckets)
        for t in range(steps):
            rows_t = np.full((S, C), -1, np.int32)
            lvls_t = np.full((S, C), -1, np.int32)
            v_t = np.zeros((S, C, self.dim), np.float32)
            un_t = np.full((S, C), -1, np.int32)
            us_t = np.full((S, C), -1, np.int32)
            any_up = False
            for s in range(S):
                r = rows_s[s][t * C:(t + 1) * C]
                if r.size == 0:
                    continue
                l = lvls_s[s][t * C:(t + 1) * C]
                rows_t[s, : r.size] = r
                lvls_t[s, : r.size] = l
                v_t[s, : r.size] = vectors[buckets[s][t * C:(t + 1) * C]]
                if link:
                    sh = self.shards[s]
                    j = 0
                    for rr, ll in zip(r.tolist(), l.tolist()):
                        if ll >= 1:
                            un_t[s, j] = rr
                            us_t[s, j] = sh._alloc_up_slot()
                            j += 1
                            sh._max_level = max(sh._max_level, ll)
                            any_up = True
            fn = _spmd_insert_fn(
                self.mesh, self.axis, metric=self.metric,
                quantized=quantized, link=link, ef=ef, m=self.config.m,
                intra_k=self.config.intra_k, dual=dual,
                expand=self.config.expand, any_up=any_up,
                out_dtype=str(stacked.vectors.dtype))
            stacked = fn(stacked, rows_t, lvls_t, v_t, un_t, us_t,
                         self.quantizer)
        self._unstack_into_shards(stacked)

        for s, bidx in enumerate(buckets):
            for j in bidx:
                self._register(ext_ids[j], s)
        if link:
            if fast:
                self.needs_refine = True
                for s in self.shards:
                    s.needs_refine = True
        elif self.config.serve_mode != "scan":
            # staged-but-unlinked rows join each shard's link backlog
            # (mirrors HNSWIndex._stage_block)
            for s in range(S):
                self.shards[s]._unlinked.extend(
                    zip(rows_s[s].tolist(), lvls_s[s].tolist()))

    def add(self, ext_id: str, vector: np.ndarray) -> None:
        if ext_id in self.ids:
            raise KeyError(f"id already present: {ext_id}")
        s = _route(ext_id) % self.n_shards
        self.shards[s].add(ext_id, vector)
        self._register(ext_id, s)

    def delete(self, ext_id: str) -> bool:
        gid = self.ids.get(ext_id)
        if gid is None:
            return False
        s = int(self._loc_shard[gid])
        row = int(self._loc_row[gid])
        ok = self.shards[s].delete(ext_id)
        if ok:
            self.ids.release(ext_id)
            self._loc_shard[gid] = -1
            self._loc_row[gid] = -1
            if 0 <= row < self._rev.shape[1]:
                self._rev[s, row] = -1
            self._rev_dirty = True
        return ok

    def get_vector(self, ext_id: str):
        gid = self.ids.get(ext_id)
        if gid is None:
            return None
        return self.shards[int(self._loc_shard[gid])].get_vector(ext_id)

    def flush(self) -> None:
        for s in self.shards:
            s.flush()

    def _stage_pending(self) -> None:
        for s in self.shards:
            s._stage_pending()

    def settle_for_serving(self, mode: Optional[str] = None) -> None:
        """See HNSWIndex.settle_for_serving — plus cap equalization and the
        stacked-state rebuild, so shared-side searches mutate nothing."""
        for s in self.shards:
            s.settle_for_serving(mode)
        self._get_stacked()

    def serving_dirty(self, mode: Optional[str] = None) -> bool:
        if any(s.serving_dirty(mode) for s in self.shards):
            return True
        return self._stacked_key != tuple(s._version for s in self.shards)

    def state_fingerprint(self, settle: bool = True) -> dict:
        """Per-shard state checksum (crc32 of the [S, n_leaves, 2]
        sum/sumsq matrix) — exposed through /system/stats so operators of
        a replicated deployment can compare replicas out-of-band; the
        in-band collective check is ReplicatedServing.verify_replicas().

        settle=False (the engine's read-locked stats path) never mutates:
        it fingerprints the cached stacked state, or reports stale when
        pending writes haven't settled yet."""
        import zlib
        from . import distributed as dlib
        if settle:
            self.settle_for_serving()
            stacked = self._get_stacked()
        elif self.serving_dirty() or self._stacked is None:
            return {"stale": True}
        else:
            stacked = self._stacked
        # the stats endpoint polls this (TUI every 5 s, bench scrapes):
        # cache by the stacked version key so repeat calls don't dispatch
        # a full-HBM sum/sumsq sweep + blocking fetch against live serving
        key = self._stacked_key
        if self._fp_cache is not None and self._fp_cache[0] == key:
            return self._fp_cache[1]
        fp = np.asarray(jax.device_get(dlib._fingerprint(stacked)),
                        np.float32)
        out = {
            "crc32": zlib.crc32(
                np.ascontiguousarray(fp).tobytes()) & 0xffffffff,
            "shards": fp.shape[0],
            "per_shard_crc32": [
                zlib.crc32(np.ascontiguousarray(fp[s]).tobytes())
                & 0xffffffff for s in range(fp.shape[0])],
        }
        self._fp_cache = (key, out)
        return out

    def run_maintenance_cycle(self) -> str:
        return ";".join(s.run_maintenance_cycle() for s in self.shards)

    def ensure_linked(self, limit: Optional[int] = None) -> None:
        for s in self.shards:
            s.ensure_linked(limit)

    def turbo_refine(self, passes: int = 1) -> None:
        """RunTurboRefine across all shards (VImport commit path); each
        shard's refine dispatches to its own device, so passes overlap
        across the mesh."""
        for s in self.shards:
            s.turbo_refine(passes)
        self.needs_refine = False

    def compress_serving(self, dtype: str = "bfloat16") -> None:
        """int8 trains ONE quantizer over a cross-shard sample and shares it
        — per-shard scales would make cross-shard scores incommensurable."""
        if dtype == "int8":
            import jax.numpy as jnp

            from ..ops import quantize as quant
            samples = []
            for s in self.shards:
                s._stage_pending()
                used = s.ids.capacity_used
                if used:
                    samples.append(np.asarray(
                        s.state.vectors[: min(used, 8192)], np.float32))
            if not samples:
                return
            qs = quant.train(jnp.asarray(np.concatenate(samples)))
            for s in self.shards:
                s.quantizer = qs
                s.compress_serving("int8", _pretrained=True)
            self.quantizer = qs
            return
        for s in self.shards:
            s.compress_serving(dtype)

    @property
    def _serve_quantized(self) -> bool:
        return self.shards[0]._serve_quantized

    def vacuum(self) -> int:
        return sum(s.vacuum() for s in self.shards)

    # -- query path: one SPMD program over the mesh --------------------------

    def _equalize_caps(self) -> None:
        cap = max(s._cap for s in self.shards)
        ucap = max(s._ucap for s in self.shards)
        for s in self.shards:
            if s._cap < cap or s._ucap < ucap:
                s.state = K.grow_state(s.state, cap, ucap)
                s._cap, s._ucap = cap, ucap

    def search(self, queries: np.ndarray, k: int, *,
               ef: Optional[int] = None,
               allow_rows: Optional[np.ndarray] = None,
               mode: Optional[str] = None,
               ) -> tuple[np.ndarray, np.ndarray]:
        """Engine-facing: (dists [B,k], global rows [B,k]; -1 pads)."""
        d, sh, rows = self._search_raw(queries, k, ef=ef,
                                       allow_rows=allow_rows, mode=mode)
        # vectorized (shard, local row) -> gid translation via the inverse
        # map (a per-hit Python loop costs ~30us/query at B=4096)
        valid = (rows >= 0) & (rows < self._rev.shape[1])
        gids = np.where(valid,
                        self._rev[np.where(valid, sh, 0),
                                  np.where(valid, rows, 0)],
                        -1).astype(np.int32)
        return d, gids

    def search_device(self, queries: np.ndarray, k: int, *,
                      allow_rows: Optional[np.ndarray] = None):
        """Device-resident (d [B,k] f32, GLOBAL rows [B,k] i32, scale) —
        the sharded analog of HNSWIndex.search_device, so the engine can
        chain the fused hybrid/decay epilogue (ops/fuse.py) onto the SPMD
        merge output with zero extra round trips. Returns None when this
        index can't serve in one dispatch (beam mode, empty, or a batch
        beyond the pass-B intermediate budget) — the engine then falls
        back to the host fusion path via search()."""
        if self.config.serve_mode == "beam":
            return None
        self._stage_pending()
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        B = queries.shape[0]
        if len(self.ids) == 0:
            return None
        q, qn = self.shards[0]._encode_query(queries, True)
        stacked = self._get_stacked()
        allow_j = None
        rev = None
        if allow_rows is not None:
            if isinstance(allow_rows, jax.Array) \
                    and allow_rows.dtype == jnp.bool_:
                allow_j = allow_rows
            else:
                allow_j = self._allow_global(allow_rows)
            rev = self._get_rev_dev()
        min_b = 32 if stacked.vectors.dtype == jnp.int8 else 16
        cap0 = self.shards[0]._cap
        row_bytes = (cap0 // scanlib.g_for(cap0)) * 8
        b_max = max(min_b, HNSWIndex.SCAN_INTERMEDIATE_BYTES
                    // max(row_bytes, 1))
        bp2 = min_b
        while bp2 * 2 <= b_max:
            bp2 *= 2
        Bp = min_b
        while Bp < B:
            Bp *= 2
        if Bp > bp2:
            return None         # needs batch chunking: host path handles
        if Bp != B:
            q = jnp.concatenate(
                [q, jnp.zeros((Bp - B, q.shape[1]), q.dtype)])
            qn = jnp.concatenate([qn, jnp.zeros((Bp - B,), jnp.float32)])
        pj = None if self.config.scan_exact else self._get_proj()
        if pj is not None:
            C = min(max(self.config.serve_proj_rerank, 2 * k),
                    cap0 // scanlib.g_for(cap0))
            d, sh, rows = _sharded_proj_scan(
                self.mesh, self.axis, stacked, pj[0], pj[1],
                self._proj_basis, rev, allow_j, q, qn,
                k=k, C=C, metric=self.metric,
                has_allow=allow_j is not None,
                quantum=self._shared_quantum())
        else:
            d, sh, rows = _sharded_scan(
                self.mesh, self.axis, stacked, rev, allow_j, q, qn,
                k=k, metric=self.metric,
                mode="exact" if self.config.scan_exact else "approx",
                has_allow=allow_j is not None,
                fast=self.config.scan_precision == "fast",
                quantum=self._shared_quantum())
        gid = _gid_device(self._get_rev_dev(), sh, rows)
        # asym int8 (default) folds the quantum into the serving bias so
        # scan distances are real-domain; the int8_symmetric operating
        # point scores L2 in the quantized domain — hand the fuser the
        # quantum^2 rescale (HNSWIndex.search_device parity)
        scale = 1.0
        if self._serve_quantized and self.metric == dist.L2 \
                and self.config.int8_symmetric:
            scale = (float(self.shards[0].quantizer.abs_max) / 127.0) ** 2
        return d[:B], gid[:B], scale

    def _shared_quantum(self) -> Optional[float]:
        """abs_max/127 of the cross-shard shared quantizer as a host float
        (baked into the SPMD program as a constant — retrain is rare), or
        None when the arenas aren't int8."""
        if self._get_stacked().vectors.dtype != jnp.int8:
            return None
        return float(self.shards[0].quantizer.abs_max) / 127.0

    def _search_raw(self, queries: np.ndarray, k: int, *,
                    ef: Optional[int] = None,
                    allow_rows: Optional[np.ndarray] = None,
                    mode: Optional[str] = None,
                    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Returns (dists [B,k], shard [B,k], local row [B,k]); -1 pads."""
        use_scan = (mode or self.config.serve_mode) != "beam"
        if use_scan:
            self._stage_pending()
        else:
            self.flush()
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        B = queries.shape[0]
        if len(self.ids) == 0:
            return (np.full((B, k), np.inf, np.float32),
                    np.full((B, k), -1, np.int32),
                    np.full((B, k), -1, np.int32))
        # asym int8 on the scan path: query stays float, shared quantizer's
        # quantum folds into each shard's serving bias (HNSWIndex parity)
        q, qn = self.shards[0]._encode_query(queries, use_scan)
        stacked = self._get_stacked()       # cached; no restack per batch
        allow_j = None
        rev = None
        if allow_rows is not None:
            if isinstance(allow_rows, jax.Array) \
                    and allow_rows.dtype == jnp.bool_:
                allow_j = allow_rows       # prepared via prepare_allow()
            else:
                allow_j = self._allow_global(allow_rows)  # [G] replicated
            rev = self._get_rev_dev()                     # [S, cap] sharded

        if use_scan:
            min_b = 32 if stacked.vectors.dtype == jnp.int8 else 16
            # bound per-shard pass-B intermediates ([B, cap/G] f32+i32)
            # like HNSWIndex._scan_search does for the single-device path
            cap0 = self.shards[0]._cap
            row_bytes = (cap0 // scanlib.g_for(cap0)) * 8
            b_max = max(min_b,
                        HNSWIndex.SCAN_INTERMEDIATE_BYTES
                        // max(row_bytes, 1))
            bp2 = min_b
            while bp2 * 2 <= b_max:
                bp2 *= 2
            Bp = min_b
            while Bp < B:
                Bp *= 2
            if Bp > bp2:
                outs = [self._search_raw(queries[i:i + bp2], k, ef=ef,
                                         allow_rows=allow_rows, mode=mode)
                        for i in range(0, B, bp2)]
                return (np.concatenate([o[0] for o in outs]),
                        np.concatenate([o[1] for o in outs]),
                        np.concatenate([o[2] for o in outs]))
            if Bp != B:
                q = jnp.concatenate(
                    [q, jnp.zeros((Bp - B, q.shape[1]), q.dtype)])
                qn = jnp.concatenate([qn, jnp.zeros((Bp - B,), jnp.float32)])
            pj = None if self.config.scan_exact else self._get_proj()
            if pj is not None:
                cap0 = self.shards[0]._cap
                C = min(max(self.config.serve_proj_rerank, 2 * k),
                        cap0 // scanlib.g_for(cap0))
                d, sh, rows = _sharded_proj_scan(
                    self.mesh, self.axis, stacked, pj[0], pj[1],
                    self._proj_basis, rev, allow_j, q, qn,
                    k=k, C=C, metric=self.metric,
                    has_allow=allow_j is not None,
                    quantum=self._shared_quantum())
            else:
                d, sh, rows = _sharded_scan(
                    self.mesh, self.axis, stacked, rev, allow_j, q, qn,
                    k=k, metric=self.metric,
                    mode="exact" if self.config.scan_exact else "approx",
                    has_allow=allow_j is not None,
                    fast=self.config.scan_precision == "fast",
                    quantum=self._shared_quantum())
            d, sh, rows = d[:B], sh[:B], rows[:B]
            if self._serve_quantized and self.metric == dist.L2 \
                    and self.config.int8_symmetric:
                # symmetric int8 scan scores L2 in the quantized domain
                quantum = float(self.shards[0].quantizer.abs_max) / 127.0
                d = np.asarray(d) * (quantum * quantum)
        else:
            ef = max(ef or self.config.ef_search, k)
            dual = any(s._deleted_rows for s in self.shards) \
                or allow_j is not None
            d, sh, rows = _sharded_search(
                self.mesh, self.axis, stacked, rev, allow_j, q, qn,
                metric=self.metric, ef=ef, k=k, dual=dual,
                has_allow=allow_j is not None)
            if self._serve_quantized and self.metric == dist.L2:
                # BEAM scores in the quantized domain; rescale so both
                # serve modes return real-domain distances (the scan path
                # is asym — quantum already folded into its bias)
                quantum = float(self.shards[0].quantizer.abs_max) / 127.0
                d = np.asarray(d) * (quantum * quantum)
        return np.asarray(d), np.asarray(sh), np.asarray(rows)

    def search_ids(self, queries: np.ndarray, k: int, **kw):
        d, sh, rows = self._search_raw(queries, k, **kw)
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


@functools.lru_cache(maxsize=None)
def _spmd_insert_fn(mesh: Mesh, axis: str, *, metric: str, quantized: bool,
                    link: bool, ef: int, m: int, intra_k: int, dual: bool,
                    expand: int, any_up: bool, out_dtype: str):
    """One compiled SPMD write step: encode + insert (or stage) the local
    chunk on every device at once. Donates the stacked state so HBM holds
    one copy. lru_cache keyes the shard_map wrapper; jit keyes shapes."""
    dt = jnp.dtype(out_dtype)

    def body(state_blk, rows, lvls, v32, un, us, qstate):
        state = jax.tree.map(lambda x: x[0], state_blk)
        enc, norms = encode_block(v32[0], metric=metric, out_dtype=dt,
                                  quantized=quantized, quantizer=qstate)
        if link:
            state = K.insert_chunk(state, rows[0], enc, norms, lvls[0],
                                   metric=metric, ef=ef, m=m,
                                   intra_k=intra_k, dual=dual, expand=expand)
            if any_up:
                state = K.update_upper(state, un[0], us[0], metric=metric)
        else:
            state = K.stage_vectors(state, rows[0], enc, norms, lvls[0])
        return jax.tree.map(lambda x: x[None], state)

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P()),
        out_specs=P(axis), check_vma=False)
    return jax.jit(fn, donate_argnums=(0,))


def _merge_tops(axis, d, i, k):
    """all_gather + global top-k merge; returns (d, shard, row) [B, k]."""
    d_all = jax.lax.all_gather(d[:, :k], axis)              # [S, B, k]
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


def _local_allow(rev_blk, allow_g):
    """Per-shard allow mask derived inside the program: gid map slice
    [cap] → bool [cap]. allow_g is the replicated global bool [G]."""
    g = rev_blk[0]
    G = allow_g.shape[0]
    return (g >= 0) & (g < G) & allow_g[jnp.clip(g, 0, G - 1)]


def _sharded_search(mesh: Mesh, axis: str, stacked: K.GraphState,
                    rev: Optional[jax.Array], allow: Optional[jax.Array],
                    q: jax.Array, qn: jax.Array,
                    *, metric: str, ef: int, k: int, dual: bool = False,
                    has_allow: bool = False):
    """shard_map body: local beam search → all_gather → global top-k merge."""

    def body(state_blk: K.GraphState, rev_blk, allow_g, q, qn):
        state = jax.tree.map(lambda x: x[0], state_blk)
        a = _local_allow(rev_blk, allow_g) if has_allow else None
        d, i = K.beam_search(state, q, qn, metric=metric, ef=ef,
                             allow=a, dual=dual)
        return _merge_tops(axis, d, i, k)

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False)
    if not has_allow:
        S = mesh.devices.size
        rev = jnp.zeros((S, 1), jnp.int32)   # unused placeholders
        allow = jnp.zeros((1,), bool)
    return fn(stacked, rev, allow, q, qn)


def _sharded_proj_scan(mesh: Mesh, axis: str, stacked: K.GraphState,
                       proj_stk, pn_stk, basis,
                       rev: Optional[jax.Array],
                       allow: Optional[jax.Array],
                       q: jax.Array, qn: jax.Array,
                       *, k: int, C: int, metric: str, has_allow: bool,
                       quantum: Optional[float] = None):
    """shard_map body for serve_proj_dim: local [cap, p] projected scan
    finds C candidates, a LOCAL exact full-dim re-rank fixes their order,
    and only then do [B, k] exact tops cross ICI in the merge — the
    collective sees final distances, so cross-shard comparability doesn't
    depend on the projection at all."""

    def body(state_blk, proj_blk, pn_blk, basis_r, rev_blk, allow_g,
             q, qn):
        state = jax.tree.map(lambda x: x[0], state_blk)
        pa, pn = proj_blk[0], pn_blk[0]
        a = _local_allow(rev_blk, allow_g) if has_allow else None
        qp = (q.astype(jnp.float32) @ basis_r).astype(jnp.bfloat16)
        _, rows = scanlib.scan_search(
            pa, pn, state.levels, state.deleted, a, qp,
            jnp.zeros_like(qn), C, metric=metric, mode="approx",
            has_allow=has_allow, fast=True)
        d = dist.gathered(state.vectors, rows.astype(jnp.int32), q,
                          metric, corpus_norms=state.norms,
                          query_norms=qn,
                          quantum=None if quantum is None
                          else jnp.float32(quantum))
        d = jnp.where(rows < 0, jnp.inf, d)
        order = jnp.argsort(d, axis=1)
        d = jnp.take_along_axis(d, order, 1)
        rows = jnp.take_along_axis(rows, order, 1)
        rows = jnp.where(jnp.isinf(d), -1, rows)
        return _merge_tops(axis, jnp.maximum(d, 0.0), rows, k)

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(), P(axis), P(), P(),
                  P()),
        out_specs=(P(), P(), P()),
        check_vma=False)
    if not has_allow:
        S = mesh.devices.size
        rev = jnp.zeros((S, 1), jnp.int32)
        allow = jnp.zeros((1,), bool)
    return fn(stacked, proj_stk, pn_stk, basis, rev, allow, q, qn)


@jax.jit
def _gid_device(rev, sh, rows):
    """(shard, local row) → global id on device ([S, cap] sharded rev;
    XLA inserts the cross-shard gather). -1 pads pass through."""
    ok = (rows >= 0) & (rows < rev.shape[1])
    return jnp.where(
        ok, rev[jnp.where(ok, sh, 0), jnp.where(ok, rows, 0)],
        -1).astype(jnp.int32)


def _sharded_scan(mesh: Mesh, axis: str, stacked: K.GraphState,
                  rev: Optional[jax.Array], allow: Optional[jax.Array],
                  q: jax.Array, qn: jax.Array,
                  *, k: int, metric: str, mode: str, has_allow: bool,
                  fast: bool = False, quantum: Optional[float] = None):
    """shard_map body: local fused scan → all_gather → global top-k merge.
    Only [B, k] tops cross ICI; the arenas never move."""

    def body(state_blk: K.GraphState, rev_blk, allow_g, q, qn):
        state = jax.tree.map(lambda x: x[0], state_blk)
        a = _local_allow(rev_blk, allow_g) if has_allow else None
        d, rows = scanlib.scan_search(
            state.vectors, state.norms, state.levels, state.deleted, a,
            q, qn, k, metric=metric, mode=mode, has_allow=has_allow,
            fast=fast,
            quantum=None if quantum is None else jnp.float32(quantum))
        return _merge_tops(axis, d, rows, k)

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False)
    if not has_allow:
        S = mesh.devices.size
        rev = jnp.zeros((S, 1), jnp.int32)
        allow = jnp.zeros((1,), bool)
    return fn(stacked, rev, allow, q, qn)
