"""Host-side HNSW index: orchestrates the jitted kernels in hnsw_kernels.py.

Mirrors the public surface of the reference hnsw.Index (pkg/core/hnsw/
hnsw_index.go:123,456,1457,327,2292): New / Add / AddBatch / AddBatchFast /
SearchWithScores / Delete / snapshot hooks / optimizer hooks — but batch-first
and functionally pure on device. The host side owns only: string↔row ID maps
(hnsw_index.go:74-75), level sampling RNG, free lists, capacity tiers, and the
maintenance cursor.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import distance as dist
from ..ops import quantize as quant
from . import hnsw_kernels as K
from .base import IDMap


@dataclass
class HNSWConfig:
    """Build/search parameters (reference config, hnsw_index.go:42-120)."""
    m: int = 16
    ef_construction: int = 200
    ef_search: int = 100
    ml: float = 0.0                  # 0 → 1/ln(m) (hnsw_index.go:2605-2614)
    seed: int = 42
    chunk: int = 512                 # batched build chunk (AddBatch shape)
    flush_chunk: int = 64            # streaming insert micro-batch
    lmax: int = 8
    refine_ef: int = 0               # 0 → ef_construction
    refine_batch: int = 512          # optimizer.go default 500
    intra_k: int = 16                # intra-chunk brute-force candidates
    expand: int = 8                  # beam width expanded per iter (build)
    # serving beam expands fewer candidates per iter: at 1M rows the beam
    # is XLA-gather row-rate bound (~42 Mrows/s measured), so halving the
    # per-iter gather (E*M0 rows) buys ~+20% QPS at ~-0.002 recall
    # (measured 1M: e8 5.5k @ 0.9979 vs e4 6.6k @ 0.9960)
    serve_expand: int = 4
    # opt-in: serving beam navigates via a contiguous [cap, W] copy of the
    # first W (distance-sorted) level-0 neighbor slots — halves the gather
    # rows per pop (a separate narrow array is required: the wide table's
    # minor-dim slice hits a slow strided-gather path on TPU). Measured at
    # 1M SIFT-like: W=16 +44% QPS but recall@10 0.996→0.891 (the link
    # long-tail carries navigation on clustered data), so default OFF —
    # a latency-over-recall knob, not a free win. Builds/refines always
    # use the full-width table.
    serve_nav_width: int = 0
    vacuum_deleted_ratio: float = 0.10   # optimizer.go:49-126 default
    fast_ef: int = 40                # AddBatchFast floor (hnsw_index.go:1461-1467)
    # Serving path (ops/scan.py rationale): "auto" links the graph on insert
    # and serves queries via the fused MXU scan; "scan" skips graph linking
    # entirely (pure scan index — fastest build/stream); "beam" serves via
    # graph beam search — the gather-bound path, for low-latency SMALL
    # batches where a full scan wastes HBM bandwidth (beam still needs the
    # arena RESIDENT in HBM; the beyond-HBM axis is kind="host", the
    # chunk-streamed host arena in index/hostarena.py). Operating
    # envelope with measured numbers: DOCUMENTATION.md "When to use beam
    # serving".
    serve_mode: str = "auto"
    # serve_mode=auto backpressure: when the staged-but-unlinked backlog
    # exceeds this, add() drains one link chunk inline so sustained writes
    # cannot grow host memory unboundedly (VERDICT r2 weak #5)
    max_unlinked: int = 32768
    scan_exact: bool = False         # exact top-k pass B (vs approx_min_k)
    # "high": f32 arenas use HIGHEST-precision MXU dots (bf16x3) — honest
    # near-exact recall; "fast": single bf16 pass, ~2x QPS, near-tie
    # reordering on clustered data (measured recall 0.86-0.98 vs 0.997)
    scan_precision: str = "high"
    # int8 arenas: False (default) scores ASYMMETRICALLY — float query x
    # int8 codes, +0.014 recall (0.9784 vs 0.9648 measured at 400kx384)
    # for one extra matmul pass; True quantizes the query too (the
    # reference's symmetric int-domain scoring, hnsw_index.go:2396-2443)
    # — the max-QPS operating point (~237k vs ~174k, NOTES.md "int8
    # operating points")
    int8_symmetric: bool = False
    # opt-in PCA-projected pass A (pHNSW-style, arXiv:2602.19242): scan a
    # cached [cap, p] bf16 projection of the arena (p ≪ D → proportionally
    # less HBM traffic in the scan, the serving bottleneck), then re-rank
    # the top serve_proj_rerank candidates exactly in full-dim f32. The
    # projection basis is the top-p PCA directions of a staged-row sample;
    # the projected arena is a derived cache (rebuilt lazily per state
    # version, never checkpointed). f32 arenas, scan paths (both the
    # single-device path and the sharded SPMD program, which re-ranks
    # locally per shard before the ICI merge so the collective sees
    # exact distances).
    serve_proj_dim: int = 0
    serve_proj_rerank: int = 128

    def resolved_ml(self) -> float:
        return self.ml if self.ml > 0 else 1.0 / math.log(max(self.m, 2))


def encode_block(v32: jnp.ndarray, *, metric: str, out_dtype,
                 quantized: bool, quantizer) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Jittable encode: raw f32 block → (arena-dtype codes, serving norms).
    Shared by HNSWIndex._encode and the SPMD sharded build (which encodes
    inside the shard_map program so only raw f32 chunks cross host→device).
    For L2, norms hold |x|^2 in the STORED precision so the scan's
    serving bias and its dots agree."""
    v = v32.astype(jnp.float32)
    if metric == dist.COSINE:
        v = dist.normalize(v)
    if quantized:
        if metric == dist.COSINE:
            # per-row scale: free for cosine (scoring normalizes by
            # |x_int| so the scale cancels) and ~1.3 recall points finer
            # than one global abs_max — see quant.quantize_rowwise
            return quant.quantize_rowwise(v)
        return quant.quantize(quantizer, v)
    enc = v.astype(out_dtype)
    if metric == dist.L2:
        norms = jnp.sum(enc.astype(jnp.float32) ** 2, axis=-1)
    else:
        norms = jnp.zeros((v.shape[0],), jnp.float32)
    return enc, norms


class HNSWIndex:
    MIN_CAP = 4096

    def __init__(self, dim: int, metric: str = dist.L2,
                 precision: str = dist.F32,
                 config: Optional[HNSWConfig] = None,
                 device=None):
        if metric not in dist.METRICS:
            raise ValueError(f"unknown metric {metric!r}")
        if precision not in dist.PRECISIONS:
            raise ValueError(f"unknown precision {precision!r}")
        # precision constraint matrix (hnsw_index.go:187-213): half precision
        # is euclidean-only, int8 is cosine-only
        if precision == dist.BF16 and metric != dist.L2:
            raise ValueError("bfloat16 precision supports only euclidean")
        if precision == dist.INT8 and metric != dist.COSINE:
            raise ValueError("int8 precision supports only cosine")
        self.dim = dim
        self.metric = metric
        self.precision = precision
        self.config = config or HNSWConfig()
        self.ids = IDMap()
        self.quantizer = quant.empty_state()
        self.rng = np.random.default_rng(self.config.seed)

        # _version counts state re-assignments so callers (ShardedHNSW's
        # stacked-state cache) can detect writes without comparing arrays;
        # _device, when set, pins the whole pytree to one chip — kernel
        # outputs then stay resident there (committed-input placement)
        self._version = 0
        self._device = device
        self._cap = self.MIN_CAP
        self._ucap = self._ucap_for(self.MIN_CAP)
        self.state = K.init_state(
            self._cap, dim, dist.storage_dtype(precision),
            m0=2 * self.config.m, lmax=self.config.lmax,
            mu=self.config.m, ucap=self._ucap)
        if device is not None:
            self.pin_device(device)

        # host mirrors
        self._serve_quantized = False
        self._max_level = 0
        self._deleted_rows: set[int] = set()
        self._up_free: list[int] = []
        self._up_next = 0
        self._refine_cursor = 0
        self.needs_refine = False
        # two-stage insert: _pending rows have ids allocated but vectors not
        # yet staged to the arena; _unlinked rows are staged (scan-visible)
        # but not yet graph-linked
        self._pending: list[tuple[int, np.ndarray]] = []
        self._pending_rows: set[int] = set()
        self._unlinked: list[tuple[int, int]] = []   # (row, level)
        # serving nav table cache (see _nav_table)
        self._nav: Optional[jnp.ndarray] = None
        self._nav_version = -1
        # projected-arena cache for serve_proj_dim (see _proj_arena)
        self._proj: Optional[tuple[jnp.ndarray, jnp.ndarray]] = None
        self._proj_version = -1
        self._proj_basis: Optional[jnp.ndarray] = None

    # -- basic accessors -------------------------------------------------

    @property
    def state(self) -> K.GraphState:
        return self._state

    @state.setter
    def state(self, st: K.GraphState) -> None:
        self._state = st
        self._version += 1

    def pin_device(self, device) -> None:
        """Place the index's arrays on one device and keep them there.
        ShardedHNSW pins shard s to mesh device s so per-shard builds run
        in parallel across chips (async dispatch) and the stacked serving
        state can be assembled without cross-device copies."""
        import jax
        self._device = device
        self.state = jax.device_put(self._state, device)

    def _nav_table(self) -> Optional[jnp.ndarray]:
        """Contiguous [cap, W] device copy of the first W (distance-sorted)
        level-0 neighbor slots, rebuilt lazily per state version. The beam
        navigates from it instead of the wide nbrs table: halves the rows
        gathered per pop (the dominant serving-beam cost) — and a SEPARATE
        narrow array is required because slicing the minor dim of a gathered
        wide row hits a slow strided-gather path on TPU (measured round 1).
        Builds/refines keep the full-width table for graph quality."""
        W = self.config.serve_nav_width
        M0 = self.state.nbrs.shape[1]
        if not W or W >= M0:
            return None
        if self._nav is None or self._nav_version != self._version:
            self._nav = self.state.nbrs[:, :W]   # eager slice → fresh
            self._nav_version = self._version    # dense [cap, W] buffer
        return self._nav

    def _proj_arena(self) -> Optional[tuple[jnp.ndarray, jnp.ndarray]]:
        """Lazy ([cap, p] bf16 projected arena, [cap] f32 proj-space
        norms) for the serve_proj_dim pass-A scan. Derived data: one
        [cap,D]x[D,p] matmul per state version, never persisted. The PCA
        basis is computed once from a staged-row sample (top-p
        eigenvectors of the D x D gram — distances between projections
        under an orthonormal basis lower-bound true distances, and the
        exact full-dim re-rank recovers the ordering)."""
        p = self.config.serve_proj_dim
        if (not p or p >= self.dim
                or self.state.vectors.dtype == jnp.int8):
            return None
        if self._proj is not None and self._proj_version == self._version:
            return self._proj
        if self._proj_basis is None:
            used = max(self.ids.capacity_used, 1)
            sample = np.asarray(
                self.state.vectors[:min(used, 65536)], np.float32)
            self._proj_basis = jnp.asarray(
                quant.fit_pca_basis(sample, p), jnp.float32)
        V = self.state.vectors.astype(jnp.float32)
        P = V @ self._proj_basis
        pn = jnp.sum(P * P, axis=-1)
        self._proj = (P.astype(jnp.bfloat16), pn)
        self._proj_version = self._version
        return self._proj

    def __len__(self) -> int:
        return len(self.ids)

    @property
    def deleted_count(self) -> int:
        return len(self._deleted_rows)

    def memory_report(self) -> dict:
        """Device-memory accounting: HBM bytes held by the index state
        (arena + adjacency + masks), capacity and occupancy. The mmap
        analog of the reference's arena stats (arena.go:33-37); on a
        sharded index this is the per-chip figure behind the 'capacity
        scales linearly with chip count' claim (SURVEY §5)."""
        return {
            "device_bytes": int(sum(
                getattr(x, "nbytes", 0) for x in self.state)),
            "capacity_rows": int(self._cap),
            "rows_used": len(self.ids),
        }

    # -- encoding ----------------------------------------------------------

    def _ensure_quantizer(self, v32: jnp.ndarray) -> None:
        if self.precision == dist.INT8 and not bool(self.quantizer.trained):
            self.quantizer = quant.train(v32)

    def _encode(self, vectors: np.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        v = jnp.asarray(vectors, jnp.float32)
        quantized = self.precision == dist.INT8 or self._serve_quantized
        if quantized and not bool(self.quantizer.trained):
            vt = dist.normalize(v) if self.metric == dist.COSINE else v
            self._ensure_quantizer(vt)
        return encode_block(v, metric=self.metric,
                            out_dtype=self.state.vectors.dtype,
                            quantized=quantized, quantizer=self.quantizer)

    def _encode_query(self, queries,
                      scan: bool) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Serving-side query encode. int8 arenas on the SCAN path keep the
        query float (cosine-normalized f32) — ASYMMETRIC scoring: the
        corpus's quantization becomes the only error source, recovering
        the ~2-3 recall points the symmetric path loses to query
        quantization (reference scores symmetrically in the int domain,
        hnsw_index.go:2396-2443). The beam path keeps the symmetric
        int-domain encode its gather kernels expect."""
        quantized = self.precision == dist.INT8 or self._serve_quantized
        if quantized and scan and not self.config.int8_symmetric:
            v = jnp.asarray(queries, jnp.float32)
            if self.metric == dist.COSINE:
                v = dist.normalize(v)
                return v, jnp.ones((v.shape[0],), jnp.float32)
            return v, jnp.zeros((v.shape[0],), jnp.float32)
        return self._encode(queries)

    def _quantum(self) -> Optional[jnp.ndarray]:
        """abs_max/127 as a traced device scalar (no host sync) when the
        arena is int8, else None — scan_search's asym L2 rescale input."""
        if self.state.vectors.dtype == jnp.int8:
            return self.quantizer.abs_max / 127.0
        return None

    # -- capacity ----------------------------------------------------------

    def _ucap_for(self, cap: int) -> int:
        """Upper-slot capacity: P(level>=1) = 1/m, so expect cap/m upper
        nodes; keep 2x headroom (and never shrink below the live count)."""
        return max(2 * cap // max(self.config.m, 2), 256)

    def _grow_for(self, extra: int) -> None:
        need = self.ids.capacity_used + extra
        if need <= self._cap:
            return
        new_cap = self._cap
        while new_cap < need:
            new_cap *= 2
        new_ucap = max(self._ucap_for(new_cap), self._ucap)
        self.state = K.grow_state(self.state, new_cap, new_ucap)
        self._cap, self._ucap = new_cap, new_ucap

    # -- level sampling (hnsw_index.go:2605-2614) ----------------------------

    def _sample_levels(self, n: int) -> np.ndarray:
        ml = self.config.resolved_ml()
        u = self.rng.random(n)
        lv = np.floor(-np.log(np.maximum(u, 1e-12)) * ml).astype(np.int32)
        return np.minimum(lv, min(self._max_level + 1, self.config.lmax))

    # -- write path ----------------------------------------------------------

    def add(self, ext_id: str, vector: np.ndarray) -> None:
        """Streaming insert: allocate the row now (host), stage the vector
        on the next micro-batch boundary, link the graph lazily. The vector
        is searchable via the scan path as soon as it is staged; callers of
        search() always see it (search stages pending first)."""
        if ext_id in self.ids:
            raise KeyError(f"id already present: {ext_id}")
        v = np.asarray(vector, np.float32).reshape(-1)
        if v.shape[0] != self.dim:
            raise ValueError(f"expected dim {self.dim}, got {v.shape[0]}")
        self._grow_for(1)
        row = self.ids.alloc(ext_id)
        self._pending.append((row, v))
        self._pending_rows.add(row)
        if len(self._pending) >= self.config.flush_chunk:
            self._stage_pending()
            if (self.config.serve_mode == "auto"
                    and len(self._unlinked) > self.config.max_unlinked):
                # backpressure: drain one link chunk inline so the backlog
                # stays bounded under sustained writes
                self.ensure_linked(limit=self.config.chunk)

    def add_batch(self, ext_ids: Sequence[str], vectors: np.ndarray,
                  fast: bool = False, link: Optional[bool] = None) -> None:
        """Bulk insert in device chunks (AddBatch, hnsw_index.go:1457-2077).
        fast=True is AddBatchFast: ef floored at cfg.fast_ef, needs_refine set
        so queries get an ef boost until refined (hnsw_index.go:371-383).
        link=False stages vectors without graph linking (scan-only index);
        default follows serve_mode."""
        if link is None:
            link = self.config.serve_mode != "scan"
        vectors = np.asarray(vectors, np.float32)
        if vectors.shape != (len(ext_ids), self.dim):
            raise ValueError(
                f"expected shape ({len(ext_ids)}, {self.dim}), got {vectors.shape}")
        seen = set()
        for e in ext_ids:
            if e in self.ids or e in seen:
                raise KeyError(f"id already present: {e}")
            seen.add(e)
        if not link:
            self._stage_pending()
            self._grow_for(len(ext_ids))
            C = max(self.config.chunk, 8192)
            for i in range(0, len(ext_ids), C):
                block = ext_ids[i:i + C]
                rows = np.fromiter((self.ids.alloc(e) for e in block),
                                   np.int32, len(block))
                self._stage_block(rows, vectors[i:i + C], pad_to=C)
            return
        self.flush()
        C = self.config.chunk
        ef = max(self.config.fast_ef, 2 * self.config.m) if fast \
            else self.config.ef_construction
        for i in range(0, len(ext_ids), C):
            self._commit(ext_ids[i:i + C], vectors[i:i + C], C, ef)
        if fast:
            self.needs_refine = True

    def _stage_block(self, rows: np.ndarray, vectors: np.ndarray,
                     pad_to: int) -> None:
        """One stage_vectors dispatch: encode + arena write + level stamp;
        rows become scan-visible and join the unlinked backlog."""
        n = rows.size
        levels = self._sample_levels(n)
        rp = np.full((pad_to,), -1, np.int32)
        rp[:n] = rows
        lp = np.full((pad_to,), -1, np.int32)
        lp[:n] = levels
        enc_n, norms_n = self._encode(vectors)
        enc = jnp.zeros((pad_to, self.dim), enc_n.dtype).at[:n].set(enc_n)
        norms = jnp.zeros((pad_to,), jnp.float32).at[:n].set(norms_n)
        self.state = K.stage_vectors(self.state, jnp.asarray(rp), enc,
                                     norms, jnp.asarray(lp))
        if self.config.serve_mode != "scan":
            # scan-only indexes never link: keeping a backlog would grow
            # host memory unboundedly and bloat checkpoints for nothing
            self._unlinked.extend(zip(rows.tolist(), levels.tolist()))

    def _stage_pending(self) -> None:
        if not self._pending:
            return
        P = self.config.flush_chunk
        while self._pending:
            take = self._pending[:P]
            self._pending = self._pending[P:]
            rows = np.fromiter((r for r, _ in take), np.int32, len(take))
            self._stage_block(rows, np.stack([v for _, v in take]),
                              pad_to=P)
            self._pending_rows.difference_update(rows.tolist())

    def ensure_linked(self, limit: Optional[int] = None) -> None:
        """Run the graph-linking backlog (stage L). Required before beam
        search / refine / vacuum / layout / checkpointing. limit bounds the
        number of rows drained (backpressure increments)."""
        self._stage_pending()
        if not self._unlinked:
            return
        C = self.config.chunk
        ef = self.config.ef_construction
        drained = 0
        while self._unlinked and (limit is None or drained < limit):
            take = self._unlinked[:C]
            self._unlinked = self._unlinked[C:]
            rows = np.full((C,), -1, np.int32)
            lvls = np.full((C,), -1, np.int32)
            rows[: len(take)] = [r for r, _ in take]
            lvls[: len(take)] = [l for _, l in take]
            self.state = K.link_chunk(
                self.state, jnp.asarray(rows), jnp.asarray(lvls),
                metric=self.metric, ef=ef, m=self.config.m,
                intra_k=self.config.intra_k,
                dual=bool(self._deleted_rows),
                expand=self.config.expand)
            self._register_upper(
                [(r, l) for r, l in take if l >= 1 and r >= 0])
            drained += len(take)

    def flush(self) -> None:
        """Full flush: stage + link everything (legacy semantics)."""
        self.ensure_linked()

    # -- concurrent-serving protocol (engine read/write lock split) ----------

    def settle_for_serving(self, mode: Optional[str] = None) -> None:
        """Commit every pending mutation the serving path would otherwise
        perform lazily. Called under the engine's EXCLUSIVE lock so the
        subsequent shared-side search is pure (staging donates buffers and
        must never race concurrent readers)."""
        if (mode or self.config.serve_mode) != "beam":
            self._stage_pending()
        else:
            self.flush()

    def serving_dirty(self, mode: Optional[str] = None) -> bool:
        """True if a search would mutate state (pending stage/link work)."""
        if (mode or self.config.serve_mode) != "beam":
            return bool(self._pending)
        return bool(self._pending or self._unlinked)

    def _commit(self, ext_ids: Sequence[str], vectors: np.ndarray,
                pad_to: int, ef: int) -> None:
        """One padded device chunk through the full insert pipeline."""
        n = len(ext_ids)
        self._grow_for(n)
        rows = np.full((pad_to,), -1, np.int32)
        rows[:n] = [self.ids.alloc(e) for e in ext_ids]
        levels = np.full((pad_to,), -1, np.int32)
        levels[:n] = self._sample_levels(n)

        # encode the real vectors first (quantizer must not train on padding),
        # then pad the encoded block to the static chunk width
        enc_n, norms_n = self._encode(vectors)
        enc = jnp.zeros((pad_to, self.dim), enc_n.dtype).at[:n].set(enc_n)
        norms = jnp.zeros((pad_to,), jnp.float32).at[:n].set(norms_n)
        self.state = K.insert_chunk(
            self.state, jnp.asarray(rows), enc, norms,
            jnp.asarray(levels), metric=self.metric, ef=ef,
            m=self.config.m, intra_k=self.config.intra_k,
            dual=bool(self._deleted_rows),
            expand=self.config.expand)

        # upper-level registration for new nodes with level >= 1
        self._register_upper(
            [(int(r), int(l)) for r, l in zip(rows, levels)
             if l >= 1 and r >= 0])

    def _register_upper(self, ups: list[tuple[int, int]]) -> None:
        """Insert (row, level>=1) nodes into the upper exact-KNN layers.
        (self.state must be current here: _alloc_up_slot may grow it.)"""
        if not ups:
            return
        kpad = 1
        while kpad < len(ups):
            kpad *= 2
        unodes = np.full((kpad,), -1, np.int32)
        uslots = np.full((kpad,), -1, np.int32)
        for j, (r, _) in enumerate(ups):
            unodes[j] = r
            uslots[j] = self._alloc_up_slot()
        self.state = K.update_upper(self.state, jnp.asarray(unodes),
                                    jnp.asarray(uslots),
                                    metric=self.metric)
        self._max_level = max(self._max_level, max(l for _, l in ups))

    def _alloc_up_slot(self) -> int:
        if self._up_free:
            return self._up_free.pop()
        s = self._up_next
        self._up_next += 1
        if s >= self._ucap:
            # unlucky level-sampling run overflowed the 2x headroom — grow
            # the upper arrays in place
            new_ucap = self._ucap * 2
            self.state = K.grow_state(self.state, self._cap, new_ucap)
            self._ucap = new_ucap
        return s

    # -- delete / maintenance -------------------------------------------------

    def delete(self, ext_id: str) -> bool:
        """Soft delete (hnsw_index.go:2292): row stays traversable, excluded
        from results; physical reclamation happens in vacuum()."""
        if ext_id not in self.ids:
            return False
        row = self.ids.ext_to_row[ext_id]
        if row in self._pending_rows:
            # vector never reached the arena: drop it host-side entirely
            self._pending = [(r, v) for r, v in self._pending if r != row]
            self._pending_rows.discard(row)
            self.ids.release(ext_id)
            return True
        self.ids.unmap(ext_id)
        self._deleted_rows.add(row)
        self.state = K.mark_deleted(self.state, jnp.asarray([row], jnp.int32))
        return True

    def run_maintenance_cycle(self) -> str:
        """optimizer.RunCycle (optimizer.go:49-126): drain the link backlog,
        then vacuum when the deleted ratio crosses the threshold, otherwise
        refine a cursor batch."""
        if self.config.serve_mode != "scan":
            self.ensure_linked()
        else:
            self._stage_pending()
        total = self.ids.capacity_used
        if total and len(self._deleted_rows) / total >= self.config.vacuum_deleted_ratio:
            self.vacuum()
            return "vacuum"
        if self.config.serve_mode == "scan":
            return "idle"       # no graph to refine
        self.refine_step()
        return "refine"

    def refine_step(self, rows: Optional[np.ndarray] = None) -> None:
        """One refine batch (optimizer.go:273-443)."""
        ef = self.config.refine_ef or self.config.ef_construction
        B = self.config.refine_batch
        if rows is None:
            live = self._live_rows()
            if live.size == 0:
                return
            start = self._refine_cursor % live.size
            idx = (start + np.arange(min(B, live.size))) % live.size
            rows = live[idx]
            self._refine_cursor = int((start + B) % max(live.size, 1))
        pad = np.full((B,), -1, np.int32)
        pad[: rows.size] = rows[:B]
        self.state = K.refine_chunk(self.state, jnp.asarray(pad),
                                    metric=self.metric, ef=ef,
                                    m_out=2 * self.config.m)

    def turbo_refine(self, passes: int = 1) -> None:
        """Full-graph refine after bulk import (RunTurboRefine,
        optimizer.go:644-684); clears the needs_refine ef boost.
        No-op for scan-only indexes (no graph to refine)."""
        if self.config.serve_mode == "scan":
            self._stage_pending()
            self.needs_refine = False
            return
        self.flush()
        live = self._live_rows()
        B = self.config.refine_batch
        for _ in range(passes):
            for i in range(0, live.size, B):
                self.refine_step(live[i:i + B])
        self.needs_refine = False

    def vacuum(self) -> int:
        """Reconnect parents of deleted rows, re-elect the entry point, purge
        rows, recycle slots (Vacuum, optimizer.go:133-262). Scan-only
        indexes have no graph to heal — purge directly."""
        if self.config.serve_mode == "scan":
            self._stage_pending()
            dead_set = set(self._deleted_rows)
            self._unlinked = [(r, l) for r, l in self._unlinked
                              if r not in dead_set]
        else:
            self.flush()
        if not self._deleted_rows:
            return 0
        if self.config.serve_mode != "scan":
            affected = np.asarray(K.rows_referencing_deleted(self.state))
            aff_rows = np.nonzero(affected)[0].astype(np.int32)
            B = self.config.refine_batch
            for i in range(0, aff_rows.size, B):
                self.refine_step(aff_rows[i:i + B])

        dead = np.fromiter(self._deleted_rows, np.int32)
        up_of = np.asarray(self.state.up_of)
        dead_slots = up_of[dead]
        dead_slots = dead_slots[dead_slots >= 0].astype(np.int32)
        # entry re-election before purge (optimizer.go:202-224)
        entry = int(self.state.entry)
        if entry in self._deleted_rows:
            levels = np.asarray(self.state.levels)
            live = self._live_rows()
            if live.size:
                new_entry = int(live[np.argmax(levels[live])])
                self._max_level = int(levels[new_entry])
                self.state = self.state._replace(
                    entry=jnp.int32(new_entry),
                    max_level=jnp.int32(self._max_level))
            else:
                self.state = self.state._replace(entry=jnp.int32(-1),
                                                 max_level=jnp.int32(0))
                self._max_level = 0
        pad = 1
        while pad < dead.size:
            pad *= 2
        dpad = np.full((pad,), -1, np.int32)
        dpad[: dead.size] = dead
        spad = np.full((pad,), -1, np.int32)
        spad[: dead_slots.size] = dead_slots
        self.state = K.purge_rows(self.state, jnp.asarray(dpad),
                                  jnp.asarray(spad))
        n = len(self._deleted_rows)
        for r in self._deleted_rows:
            self.ids.free.append(int(r))
            self.ids.row_to_ext[r] = None
        self._up_free.extend(int(s) for s in dead_slots)
        self._deleted_rows.clear()
        return n

    def _live_rows(self) -> np.ndarray:
        levels = np.asarray(self.state.levels[: self.ids.capacity_used])
        live = np.nonzero(levels >= 0)[0].astype(np.int32)
        if self._deleted_rows:
            live = live[~np.isin(live, np.fromiter(self._deleted_rows, np.int32))]
        return live

    # -- query path ------------------------------------------------------------

    def prepare_allow(self, mask: np.ndarray):
        """Host bool mask → device-resident [cap] bool that search()
        accepts without any transfer. The engine's mask cache calls this
        once per (predicate, store-version) and reuses the device array
        across requests — per-call upload of a 1M-row mask costs ~50 ms
        on the serving tunnel (measured, scripts/profile_hybrid.py)."""
        a = np.asarray(mask, bool)
        if a.size < self._cap:
            a = np.pad(a, (0, self._cap - a.size))
        return jax.device_put(a[: self._cap], self._device)

    def search(self, queries: np.ndarray, k: int, *,
               ef: Optional[int] = None,
               allow_rows: Optional[np.ndarray] = None,
               mode: Optional[str] = None,
               ) -> tuple[np.ndarray, np.ndarray]:
        """Batched ANN: [B, D] → (dists [B, k], rows [B, k]; -1 pads).

        serve_mode auto/scan → fused MXU scan (ops/scan.py, exact-or-near);
        serve_mode beam (or mode="beam") → graph beam search."""
        use_scan = (mode or self.config.serve_mode) != "beam"
        if use_scan:
            self._stage_pending()
        else:
            self.flush()
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        if queries.shape[-1] != self.dim:
            raise ValueError(
                f"query dim {queries.shape[-1]} != index dim {self.dim}")
        B = queries.shape[0]
        if len(self.ids) == 0 or (not use_scan and int(self.state.entry) < 0):
            return (np.full((B, k), np.inf, np.float32),
                    np.full((B, k), -1, np.int32))
        q, qn = self._encode_query(queries, use_scan)
        allow = self._allow_to_device(allow_rows)

        if use_scan:
            d_np, i_np = self._scan_search(q, qn, B, k, allow)
            i = i_np
        else:
            ef = ef or self.config.ef_search
            if self.needs_refine:
                # un-refined fast-built graphs get an ef boost
                # (hnsw_index.go:371-383)
                ef = min(max(ef, 80), 200)
            ef = max(ef, k)
            dual = allow is not None or bool(self._deleted_rows)
            # pad the batch to a power of two so varying request sizes reuse
            # the same compiled beam program
            Bp = 8
            while Bp < B:
                Bp *= 2
            if Bp != B:
                q = jnp.concatenate([q, jnp.zeros((Bp - B, q.shape[1]),
                                                  q.dtype)])
                if qn is not None:
                    qn = jnp.concatenate([qn, jnp.zeros((Bp - B,), qn.dtype)])
            d, i = K.beam_search(self.state, q, qn, metric=self.metric,
                                 ef=ef, allow=allow, dual=dual,
                                 expand=self.config.serve_expand,
                                 nav=self._nav_table())
            d_np = np.asarray(d[:B, :k])
            i = np.asarray(i[:B, :k])
        if self._serve_quantized and self.metric == dist.L2 and (
                not use_scan or self.config.int8_symmetric):
            # BEAM (and int8_symmetric SCAN) euclidean distances were
            # computed in the quantized domain; rescale back. The default
            # scan path scores asymmetrically (quantum folded into the
            # serving bias) so its distances are already real-domain.
            # Cosine is scale-invariant — no rescale.
            quantum = float(self.quantizer.abs_max) / 127.0
            d_np = d_np * (quantum * quantum)
        return d_np, i

    # Pass A emits [B, cap/G] f32+i32 intermediates; bound them so huge
    # arenas don't OOM HBM (cap=4M at B=4096 would need 17 GB)
    SCAN_INTERMEDIATE_BYTES = 2 << 30

    def _allow_to_device(self, allow_rows) -> Optional[jax.Array]:
        """Normalize an allow-list argument to a [cap] bool device mask."""
        if allow_rows is None:
            return None
        if isinstance(allow_rows, jax.Array) \
                and allow_rows.dtype == jnp.bool_ \
                and allow_rows.ndim == 1 and allow_rows.shape[0] == self._cap:
            # device-resident mask (engine mask cache): use as-is. The
            # np.asarray round-trip below would pull the mask D2H and push
            # it back — ~100 ms per call through the serving tunnel
            # (measured, scripts/profile_hybrid.py).
            return allow_rows
        a = np.asarray(allow_rows)
        if a.dtype == bool:
            return jnp.asarray(
                np.pad(a[: self._cap], (0, max(0, self._cap - a.size))))
        allow = jnp.zeros((self._cap,), bool)
        rows = a.astype(np.int32)
        # positive OOB sentinel: -1 would write row cap-1 (see
        # hnsw_kernels._oob)
        rows = np.where(rows >= 0, rows, self._cap)
        return allow.at[jnp.asarray(rows)].set(True, mode="drop")

    def search_device(self, queries: np.ndarray, k: int, *,
                      allow_rows: Optional[np.ndarray] = None):
        """Scan serving that returns DEVICE-resident results: (d [B,k] f32,
        rows [B,k] i32, l2_rescale float) with no host fetch, or None when
        this index can't serve via the scan path (beam mode / empty). The
        engine chains the hybrid fusion epilogue (ops/fuse.py) onto these
        so BM25 fusion costs zero extra device round trips."""
        if self.config.serve_mode == "beam":
            return None
        self._stage_pending()
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        if queries.shape[-1] != self.dim:
            raise ValueError(
                f"query dim {queries.shape[-1]} != index dim {self.dim}")
        if len(self.ids) == 0:
            return None
        B = queries.shape[0]
        q, qn = self._encode_query(queries, True)
        allow = self._allow_to_device(allow_rows)
        d, rows = self._scan_search_device(q, qn, B, k, allow)
        # asym int8 (the default) folds the quantum into the serving bias
        # so scan distances are real-domain; the int8_symmetric operating
        # point scores L2 in the quantized domain — hand the fuser the
        # rescale instead of paying a device pass for it
        scale = 1.0
        if self._serve_quantized and self.metric == dist.L2 \
                and self.config.int8_symmetric:
            scale = (float(self.quantizer.abs_max) / 127.0) ** 2
        return d, rows, scale

    def _scan_search(self, q, qn, B: int, k: int, allow
                     ) -> tuple[np.ndarray, np.ndarray]:
        # one device_get for both results: it starts copy_to_host_async on
        # each leaf before collecting, so the two transfers overlap in one
        # round trip (two bare np.asarray fetches would serialize)
        return jax.device_get(self._scan_search_device(q, qn, B, k, allow))

    def _scan_search_device(self, q, qn, B: int, k: int, allow
                            ) -> tuple[jax.Array, jax.Array]:
        """Fused MXU scan serving (ops/scan.py), device-resident results.
        Pads the batch to the tile multiple, over-fetches 2k for approx
        pass-B headroom, and chunks very large batches so pass-B
        intermediates stay within budget."""
        from ..ops import scan as scanlib
        min_b = 32 if self.state.vectors.dtype == jnp.int8 else 16
        Bp = min_b
        while Bp < B:
            Bp *= 2
        row_bytes = (self._cap // scanlib.g_for(self._cap)) * 8
        b_max = max(min_b, self.SCAN_INTERMEDIATE_BYTES // max(row_bytes, 1))
        bp2 = min_b
        while bp2 * 2 <= b_max:
            bp2 *= 2
        if Bp > bp2:
            # chunked dispatch: pass-B buffers bounded at bp2 queries
            outs_d, outs_r = [], []
            for i in range(0, B, bp2):
                dd, rr = self._scan_search_device(
                    q[i:i + bp2],
                    qn[i:i + bp2] if qn is not None else None,
                    min(bp2, B - i), k, allow)
                outs_d.append(dd)
                outs_r.append(rr)
            return jnp.concatenate(outs_d), jnp.concatenate(outs_r)
        if Bp != B:
            q = jnp.concatenate([q, jnp.zeros((Bp - B, q.shape[1]), q.dtype)])
            qn = jnp.concatenate([qn, jnp.zeros((Bp - B,), jnp.float32)]) \
                if qn is not None else None
        proj = None if self.config.scan_exact else self._proj_arena()
        if proj is not None:
            # PCA-projected pass A (config.serve_proj_dim): scan the
            # [cap, p] bf16 projection (p/D of the arena's HBM traffic),
            # then re-rank the top C candidates exactly in full-dim f32 —
            # the same scan+rerank shape as the default path with a
            # cheaper candidate generator.
            Pa, pn = proj
            qp = (q.astype(jnp.float32) @ self._proj_basis
                  ).astype(jnp.bfloat16)
            C = min(max(self.config.serve_proj_rerank, 2 * k),
                    self._cap // scanlib.g_for(self._cap))
            _, rows = scanlib.scan_search(
                Pa, pn, self.state.levels, self.state.deleted, allow, qp,
                jnp.zeros((Bp,), jnp.float32), C, metric=self.metric,
                mode="approx", has_allow=allow is not None, fast=True)
            d = dist.gathered(
                self.state.vectors, rows.astype(jnp.int32), q,
                self.metric, corpus_norms=self.state.norms,
                query_norms=qn, quantum=self._quantum())
            d = jnp.where(rows < 0, jnp.inf, d)
            order = jnp.argsort(d, axis=1)
            d = jnp.take_along_axis(d, order, 1)
            rows = jnp.take_along_axis(rows, order, 1)
            rows = jnp.where(jnp.isinf(d), -1, rows)
            d = jnp.maximum(d, 0.0)
            return d[:B, :k], rows[:B, :k].astype(jnp.int32)
        # scan fetch width: power-of-two >= max(k, 32). k=10 keeps kf=32
        # (the flagship program, 2k-headroom against pass-A group-argmin
        # collisions); a misaligned kf is strictly worse than the next
        # power of two (measured at 1M x 128: kf=40 is slower than BOTH
        # kf=32 and kf=64, scripts/profile_hybrid2.py) — so the engine's
        # hybrid 2k over-fetch (k=20) now rides the kf=32 program instead
        # of compiling a 30% slower kf=40 variant.
        kf = 32
        while kf < k:
            kf *= 2
        kf = min(kf, self._cap // scanlib.g_for(self._cap))
        d, rows = scanlib.scan_search(
            self.state.vectors, self.state.norms, self.state.levels,
            self.state.deleted, allow, q,
            qn if qn is not None else jnp.zeros((Bp,), jnp.float32),
            kf, metric=self.metric,
            mode="exact" if self.config.scan_exact else "approx",
            has_allow=allow is not None,
            fast=self.config.scan_precision == "fast",
            quantum=self._quantum())
        return d[:B, :k], rows[:B, :k].astype(jnp.int32)

    def compress_serving(self, dtype: str = "bfloat16",
                         _pretrained: bool = False) -> None:
        """Narrow the stored vectors for serving after a bulk build.

        Build quality wants f32 distances; query throughput wants narrow
        gathers (HBM-bandwidth-bound, SURVEY §7.4). This is the dense-array
        analogue of the reference's post-hoc Compress (core.go:1095): the
        graph is kept, only the arena dtype changes. Subsequent streaming
        inserts encode straight into the narrowed arena.

        "int8" additionally trains the symmetric quantizer on the stored
        rows and keeps int-domain norms; distances stay monotonic (scaled
        by scale^2) and are rescaled back in search().
        """
        self._stage_pending()
        if self.precision != dist.F32:
            raise ValueError("compress_serving applies to float32 indexes")
        if dtype == "int8":
            if self.metric == dist.COSINE:
                # per-row scale (quant.quantize_rowwise): scale cancels in
                # cosine scoring, no quantizer state needed
                codes, norms = quant.quantize_rowwise(
                    self.state.vectors.astype(jnp.float32))
                self.state = self.state._replace(vectors=codes, norms=norms)
                self._serve_quantized = True
                return
            if not _pretrained:
                used = self.ids.capacity_used
                v32 = self.state.vectors[:max(used, 1)].astype(jnp.float32)
                self.quantizer = quant.train(v32)
            codes, norms = quant.quantize(self.quantizer,
                                          self.state.vectors.astype(
                                              jnp.float32))
            self.state = self.state._replace(vectors=codes, norms=norms)
            self._serve_quantized = True
            return
        target = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[dtype]
        vecs = self.state.vectors.astype(target)
        norms = self.state.norms
        if self.metric == dist.L2:
            # |x|^2 must be of the NARROWED values so bias and dots agree
            norms = jnp.sum(vecs.astype(jnp.float32) ** 2, axis=-1)
        self.state = self.state._replace(vectors=vecs, norms=norms)

    def optimize_layout(self) -> None:
        """Relabel rows in BFS order from the entry point so neighbor-row
        gathers hit nearby HBM addresses (graph-ordering; the dense-array
        answer to SURVEY §7.4 "layout neighbors for coalesced access").

        Intended after a bulk build; skipped when rows have been freed
        (slot reuse would interleave with the BFS order anyway).
        """
        self.flush()
        if self._deleted_rows or self.ids.free:
            return
        used = self.ids.capacity_used
        if used == 0:
            return
        nbrs = np.asarray(self.state.nbrs[:used])
        entry = int(self.state.entry)
        if entry < 0:
            return          # no graph (scan-only index) — nothing to order

        # vectorized BFS levels over the level-0 graph
        visited = np.zeros(used, bool)
        order = np.empty(used, np.int32)
        pos = 0
        frontier = np.array([entry], np.int32)
        visited[entry] = True
        while frontier.size:
            order[pos:pos + frontier.size] = frontier
            pos += frontier.size
            cand = nbrs[frontier].ravel()
            cand = cand[(cand >= 0) & (cand < used)]
            cand = np.unique(cand)
            cand = cand[~visited[cand]]
            visited[cand] = True
            frontier = cand
        rest = np.nonzero(~visited)[0]
        order[pos:pos + rest.size] = rest           # unreachable tail

        perm = order                                  # new_row -> old_row
        old2new = np.empty(used, np.int32)
        old2new[perm] = np.arange(used, dtype=np.int32)

        def remap_ids(a: np.ndarray) -> np.ndarray:
            out = np.where((a >= 0) & (a < used), old2new[np.minimum(a, used - 1)], a)
            return out.astype(np.int32)

        st = self.state
        cap = self._cap
        full_perm = np.concatenate([perm, np.arange(used, cap, dtype=np.int32)])
        pj = jnp.asarray(full_perm)
        new_nbrs = remap_ids(np.asarray(st.nbrs[:used]))
        nbrs_np = np.array(st.nbrs)
        nbrs_np[:used] = new_nbrs
        up_node_np = remap_ids(np.asarray(st.up_node))
        up_nbrs_np = remap_ids(np.asarray(st.up_nbrs).reshape(-1)).reshape(
            st.up_nbrs.shape)
        self.state = st._replace(
            vectors=st.vectors[pj],
            norms=st.norms[pj],
            nbrs=jnp.asarray(nbrs_np)[pj],
            levels=st.levels[pj],
            deleted=st.deleted[pj],
            up_of=st.up_of[pj],
            up_node=jnp.asarray(up_node_np),
            up_nbrs=jnp.asarray(up_nbrs_np),
            entry=jnp.int32(int(old2new[entry])),
        )
        # host id maps follow the permutation
        new_row_to_ext: list[str | None] = [None] * used
        for old_row, ext in enumerate(self.ids.row_to_ext[:used]):
            if ext is not None:
                new_row = int(old2new[old_row])
                new_row_to_ext[new_row] = ext
                self.ids.ext_to_row[ext] = new_row
        self.ids.row_to_ext = new_row_to_ext

    def get_vector(self, ext_id: str) -> Optional[np.ndarray]:
        """Stored vector for one id (normalized for cosine; dequantized for
        int8 — matches the reference returning the arena bytes)."""
        self._stage_pending()
        row = self.ids.get(ext_id)
        if row is None:
            return None
        v = np.asarray(self.state.vectors[row])
        if self.precision == dist.INT8 or self._serve_quantized:
            if self.metric == dist.COSINE:
                # per-row-scale codes carry no magnitude; the stored
                # vector was unit-normalized at encode, so reconstruct
                # the unit direction
                v = v.astype(np.float32)
                v = v / max(float(np.linalg.norm(v)), 1e-12)
            else:
                v = v.astype(np.float32) * (
                    float(self.quantizer.abs_max) / 127.0)
        return v.astype(np.float32)

    def search_ids(self, queries: np.ndarray, k: int, **kw):
        """(ext_id, dist) per query (SearchWithScores, hnsw_index.go:327)."""
        d, rows = self.search(queries, k, **kw)
        out = []
        for b in range(rows.shape[0]):
            hits = []
            for j, r in enumerate(rows[b]):
                if r >= 0 and self.ids.row_to_ext[r] is not None:
                    hits.append((self.ids.row_to_ext[r], float(d[b, j])))
            out.append(hits)
        return out
