"""Distance kernels — the TPU replacement for the reference's entire distance stack.

Reference surface replaced here (see SURVEY §2.1):
  - pure-Go kernels           pkg/core/distance/distance_go.go:57-116
  - Gonum BLAS Sdot           pkg/core/distance/distance_go.go:119-128
  - avo AVX2/F16C assembly    pkg/core/distance/distance_avo_amd64.go
  - Rust FMA/AVX2/NEON SIMD   native/compute/src/lib.rs:33-413

Instead of one-vector-at-a-time SIMD, every distance is computed as a *blocked
batched matmul on the MXU*: queries [B, D] x corpus-tile [T, D]^T. The precision
families mirror the reference (distance_go.go:133-178):

  f32   : squared-euclidean, cosine (as 1 - dot on normalized vectors)
  bf16  : squared-euclidean (replaces the reference's f16; bf16 is the TPU-native
          half precision — same 50% memory, MXU-native)
  int8  : dot-based cosine with precomputed int-domain norms
          (hnsw_index.go:2396-2443: 1 - dot/(|a||b|))

All functions are jit-compatible, static-shaped, and accumulate in f32
(`preferred_element_type`), matching MXU best practice.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

# Metrics (reference: distance_go.go metric names "euclidean"/"cosine")
L2 = "euclidean"
COSINE = "cosine"
METRICS = (L2, COSINE)

# Precisions (reference: float32/float16/int8, hnsw_index.go:187-213;
# bf16 replaces f16 as the TPU-native half type)
F32 = "float32"
BF16 = "bfloat16"
INT8 = "int8"
PRECISIONS = (F32, BF16, INT8)

# Sentinel used to pad id arrays (never a valid row).
INVALID = jnp.int32(-1)


def storage_dtype(precision: str):
    return {F32: jnp.float32, BF16: jnp.bfloat16, INT8: jnp.int8}[precision]


def normalize(x: jax.Array, axis: int = -1, eps: float = 1e-30) -> jax.Array:
    """L2-normalize; zero vectors stay zero (reference normalizes on insert for
    cosine, hnsw_index.go:466-517)."""
    n = jnp.linalg.norm(x.astype(jnp.float32), axis=axis, keepdims=True)
    return (x.astype(jnp.float32) / jnp.maximum(n, eps)).astype(x.dtype)


def pairwise(
    queries: jax.Array,          # [B, D] f32 (or int8 for INT8 precision)
    corpus: jax.Array,           # [N, D] storage dtype
    metric: str,
    *,
    corpus_norms: Optional[jax.Array] = None,   # [N] f32, int-domain norms (int8 only)
    query_norms: Optional[jax.Array] = None,    # [B] f32 (int8 only)
) -> jax.Array:
    """Dense distance block: one MXU matmul → [B, N] f32 distances.

    L2 is *squared* euclidean (reference never takes the sqrt,
    distance_go.go:57-66). Cosine assumes normalized inputs and returns
    1 - dot (distance_go.go:92-101).
    """
    if corpus.dtype == jnp.int8:
        # int8: dot in int32 on the MXU, then rescale by norms
        # (reference int8 path, hnsw_index.go:2396-2443).
        dots = jax.lax.dot_general(
            queries.astype(jnp.int8), corpus,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        if metric == COSINE:
            qn = query_norms[:, None]
            cn = jnp.maximum(corpus_norms[None, :], 1e-9)
            return 1.0 - dots / (jnp.maximum(qn, 1e-9) * cn)
        # int8 L2 in the quantized domain: |q|^2 - 2 q.x + |x|^2.
        q2 = (query_norms ** 2)[:, None]
        c2 = (corpus_norms ** 2)[None, :]
        return q2 - 2.0 * dots + c2

    compute_t = corpus.dtype if corpus.dtype == jnp.bfloat16 else jnp.float32
    q = queries.astype(compute_t)
    # f32 inputs force HIGHEST (bf16x3): the TPU MXU's default single bf16
    # pass truncates operands — intolerable for an exact oracle
    dots = jax.lax.dot_general(
        q, corpus,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.HIGHEST if compute_t == jnp.float32
                   else jax.lax.Precision.DEFAULT),
    )
    if metric == COSINE:
        return 1.0 - dots
    q2 = jnp.sum(queries.astype(jnp.float32) ** 2, axis=-1)[:, None]
    c2 = jnp.sum(corpus.astype(jnp.float32) ** 2, axis=-1)[None, :]
    return q2 - 2.0 * dots + c2


def gathered(
    vectors: jax.Array,          # [N_cap, D] storage dtype
    ids: jax.Array,              # [B, C] int32 row ids (INVALID-padded)
    queries: jax.Array,          # [B, D] query dtype
    metric: str,
    *,
    corpus_norms: Optional[jax.Array] = None,
    query_norms: Optional[jax.Array] = None,
    quantum: Optional[jax.Array] = None,
) -> jax.Array:
    """Distances from each query to an arbitrary gathered candidate set.

    This is the ef-search hot path (reference searchLayerUnlocked's distFn
    closure, hnsw_index.go:2340-2600): [B, C] gathers + a batched
    multiply-reduce on the VPU. Invalid ids get +inf.

    int8 corpora score two ways: SYMMETRIC (int8 query too — the beam
    path, matching hnsw_index.go:2396-2443's int domain) or ASYMMETRIC
    (float query × int8 codes at HIGHEST — int8 values are exactly
    representable in f32, so the only remaining error is the corpus's own
    quantization; `quantum` maps L2 back to the real domain).
    """
    safe = jnp.maximum(ids, 0)
    vecs = vectors[safe]                                   # [B, C, D]
    if vectors.dtype == jnp.int8 and queries.dtype == jnp.int8:
        dots = jnp.einsum(
            "bcd,bd->bc", vecs.astype(jnp.int32), queries.astype(jnp.int32),
        ).astype(jnp.float32)
        if metric == COSINE:
            cn = jnp.maximum(corpus_norms[safe], 1e-9)     # [B, C]
            qn = jnp.maximum(query_norms, 1e-9)[:, None]
            d = 1.0 - dots / (qn * cn)
        else:
            q2 = (query_norms ** 2)[:, None]
            c2 = corpus_norms[safe] ** 2
            d = q2 - 2.0 * dots + c2
    elif vectors.dtype == jnp.int8:
        dots = jnp.einsum(
            "bcd,bd->bc", vecs.astype(jnp.float32),
            queries.astype(jnp.float32),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        cn = jnp.maximum(corpus_norms[safe], 1e-9)         # |x_int|
        if metric == COSINE:
            d = 1.0 - dots / cn          # queries pre-normalized (|q| = 1)
        else:
            qm = quantum if quantum is not None else jnp.float32(1.0)
            q2 = jnp.sum(queries.astype(jnp.float32) ** 2, axis=-1,
                         keepdims=True)
            d = q2 - 2.0 * qm * dots + (qm * cn) ** 2
    else:
        compute_t = vectors.dtype if vectors.dtype == jnp.bfloat16 else jnp.float32
        dots = jnp.einsum(
            "bcd,bd->bc", vecs.astype(compute_t), queries.astype(compute_t),
            preferred_element_type=jnp.float32,
            precision=(jax.lax.Precision.HIGHEST
                       if compute_t == jnp.float32
                       else jax.lax.Precision.DEFAULT),
        )
        if metric == COSINE:
            d = 1.0 - dots
        else:
            q2 = jnp.sum(queries.astype(jnp.float32) ** 2, axis=-1)[:, None]
            c2 = jnp.sum(vecs.astype(jnp.float32) ** 2, axis=-1)
            d = q2 - 2.0 * dots + c2
    return jnp.where(ids < 0, jnp.inf, d)


@functools.partial(jax.jit, static_argnames=("k", "metric", "block"))
def brute_force_topk(
    queries: jax.Array,          # [B, D]
    corpus: jax.Array,           # [N, D]
    k: int,
    metric: str = L2,
    *,
    valid: Optional[jax.Array] = None,          # [N] bool — rows eligible as results
    corpus_norms: Optional[jax.Array] = None,
    query_norms: Optional[jax.Array] = None,
    block: int = 16384,
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k by blocked scan over the corpus (running top-k merge).

    Replaces the reference's BruteForceIndex (pkg/core/vector_index.go:62-148)
    and serves as the recall oracle for every ANN test (SURVEY §4.8).
    Returns (dists [B,k], ids [B,k]); masked/padded slots have dist=+inf, id=-1.
    """
    B = queries.shape[0]
    N = corpus.shape[0]
    nblocks = max(1, -(-N // block))
    pad_n = nblocks * block

    def body(carry, start):
        best_d, best_i = carry
        idx = start + jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)[:, 0]
        tile = jax.lax.dynamic_slice_in_dim(corpus_p, start, block, axis=0)
        tn = (jax.lax.dynamic_slice_in_dim(corpus_norms_p, start, block, 0)
              if corpus_norms_p is not None else None)
        d = pairwise(queries, tile, metric,
                     corpus_norms=tn, query_norms=query_norms)
        inb = (idx < N)
        if valid is not None:
            inb = inb & jax.lax.dynamic_slice_in_dim(valid_p, start, block, 0)
        d = jnp.where(inb[None, :], d, jnp.inf)
        cat_d = jnp.concatenate([best_d, d], axis=1)
        cat_i = jnp.concatenate([best_i, jnp.broadcast_to(idx[None, :], (B, block))], axis=1)
        nd, pos = jax.lax.top_k(-cat_d, k)
        return (-nd, jnp.take_along_axis(cat_i, pos, axis=1)), None

    corpus_p = jnp.pad(corpus, ((0, pad_n - N), (0, 0)))
    corpus_norms_p = (jnp.pad(corpus_norms, (0, pad_n - N))
                      if corpus_norms is not None else None)
    valid_p = jnp.pad(valid, (0, pad_n - N)) if valid is not None else None

    init = (jnp.full((B, k), jnp.inf, jnp.float32), jnp.full((B, k), -1, jnp.int32))
    starts = jnp.arange(nblocks, dtype=jnp.int32) * block
    (d, i), _ = jax.lax.scan(body, init, starts)
    i = jnp.where(jnp.isinf(d), -1, i)
    return d, i
