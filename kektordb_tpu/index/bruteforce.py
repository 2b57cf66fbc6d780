"""Exact-scan index — fallback implementation and the recall oracle.

Reference: pkg/core/vector_index.go:62-148 (BruteForceIndex, linear scan).
TPU-native: the scan is one blocked MXU matmul sweep (ops.distance.brute_force_topk)
instead of a per-vector loop, so "brute force" here is itself fast enough to serve
small indexes in production, not just tests.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import distance as dist
from ..ops import quantize as quant
from .base import IDMap


class BruteForceIndex:
    GROW = 4096  # capacity grows in fixed tiers to bound re-jits (SURVEY §7.4)

    def __init__(self, dim: int, metric: str = dist.L2, precision: str = dist.F32):
        if metric not in dist.METRICS:
            raise ValueError(f"unknown metric {metric!r}")
        if precision not in dist.PRECISIONS:
            raise ValueError(f"unknown precision {precision!r}")
        self.dim = dim
        self.metric = metric
        self.precision = precision
        self.ids = IDMap()
        self._cap = self.GROW
        self._vectors = jnp.zeros((self._cap, dim), dist.storage_dtype(precision))
        self._norms = jnp.zeros((self._cap,), jnp.float32)  # int8 only
        self._valid = np.zeros((self._cap,), bool)
        self.quantizer = quant.empty_state()

    def __len__(self) -> int:
        return len(self.ids)

    # -- mutation ------------------------------------------------------------

    def _grow_to(self, need: int) -> None:
        if need <= self._cap:
            return
        new_cap = self._cap
        while new_cap < need:
            new_cap += self.GROW
        pad = new_cap - self._cap
        self._vectors = jnp.pad(self._vectors, ((0, pad), (0, 0)))
        self._norms = jnp.pad(self._norms, (0, pad))
        self._valid = np.pad(self._valid, (0, pad))
        self._cap = new_cap

    def _encode(self, vectors: np.ndarray) -> tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        v = jnp.asarray(vectors, jnp.float32)
        if self.metric == dist.COSINE:
            v = dist.normalize(v)
        if self.precision == dist.INT8:
            if not bool(self.quantizer.trained):
                self.quantizer = quant.train(v)
            codes, norms = quant.quantize(self.quantizer, v)
            return codes, norms
        return v.astype(dist.storage_dtype(self.precision)), None

    def add(self, ext_id: str, vector: np.ndarray) -> None:
        self.add_batch([ext_id], np.asarray(vector)[None, :])

    def add_batch(self, ext_ids: Sequence[str], vectors: np.ndarray,
                  **_) -> None:
        """Extra kwargs (fast/link) are HNSW build hints — meaningless for a
        flat arena, accepted for engine-surface compatibility."""
        vectors = np.asarray(vectors, np.float32)
        if vectors.shape != (len(ext_ids), self.dim):
            raise ValueError(
                f"expected shape ({len(ext_ids)}, {self.dim}), got {vectors.shape}")
        rows = [self.ids.alloc(e) for e in ext_ids]
        self._grow_to(self.ids.capacity_used)
        enc, norms = self._encode(vectors)
        rows_a = jnp.asarray(np.array(rows, np.int32))
        self._vectors = self._vectors.at[rows_a].set(enc)
        if norms is not None:
            self._norms = self._norms.at[rows_a].set(norms)
        self._valid[rows] = True

    def delete(self, ext_id: str) -> bool:
        if ext_id not in self.ids:
            return False
        row = self.ids.release(ext_id)
        self._valid[row] = False
        return True

    def get_vector(self, ext_id: str) -> Optional[np.ndarray]:
        row = self.ids.get(ext_id)
        if row is None:
            return None
        v = np.asarray(self._vectors[row])
        if self.precision == dist.INT8:
            v = v.astype(np.float32) * (float(self.quantizer.abs_max) / 127.0)
        return v.astype(np.float32)

    def prepare_allow(self, mask: np.ndarray) -> jax.Array:
        """Host bool mask → device [cap] bool reusable across searches
        (engine mask cache)."""
        a = np.asarray(mask, bool)
        if a.size < self._cap:
            a = np.pad(a, (0, self._cap - a.size))
        return jnp.asarray(a[: self._cap])

    # -- query ---------------------------------------------------------------

    def search(
        self,
        queries: np.ndarray,
        k: int,
        *,
        allow_rows: Optional[np.ndarray] = None,   # bool [cap] device/host mask
        **_,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Returns (dists [B,k] f32, rows [B,k] int32; -1 pads)."""
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        q = jnp.asarray(queries)
        qn = None
        if self.metric == dist.COSINE:
            q = dist.normalize(q)
        if self.precision == dist.INT8:
            q, qn = quant.quantize(self.quantizer, q)
        valid = self._valid
        valid_j = None
        if allow_rows is not None:
            if isinstance(allow_rows, jax.Array) \
                    and allow_rows.dtype == jnp.bool_ \
                    and allow_rows.shape == (self._cap,):
                # device mask (engine mask cache): AND on device, no host
                # round-trip
                valid_j = jnp.asarray(valid) & allow_rows
            else:
                a = np.asarray(allow_rows, bool)[: self._cap]
                a = np.pad(a, (0, self._cap - a.size))
                valid = valid & a
        d, i = dist.brute_force_topk(
            q, self._vectors, k, self.metric,
            valid=valid_j if valid_j is not None else jnp.asarray(valid),
            corpus_norms=self._norms if self.precision == dist.INT8 else None,
            query_norms=qn,
        )
        return np.asarray(d), np.asarray(i)

    def search_ids(self, queries: np.ndarray, k: int, **kw):
        """Search returning (ext_id, dist) pairs per query — the engine-facing
        form (reference SearchWithScores, hnsw_index.go:327)."""
        d, rows = self.search(queries, k, **kw)
        out = []
        for b in range(rows.shape[0]):
            hits = [(self.ids.row_to_ext[r], float(d[b, j]))
                    for j, r in enumerate(rows[b]) if r >= 0]
            out.append(hits)
        return out
