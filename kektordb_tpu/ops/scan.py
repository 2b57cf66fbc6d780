"""Fused MXU scan — the TPU-native serving path for batched ANN queries.

Rationale (measured on the bench chip): at serving batch sizes, one beam
iteration of graph search gathers B*C ~ N random rows — the same bytes as a
full sequential table scan, but at XLA's gather row-rate (~26-64 Mrows/s)
instead of HBM streaming rate. Over ~30-50 beam iterations that is dozens of
full-table-equivalents of traffic. A single fused matmul scan of the whole
arena is therefore faster than graph traversal for any N that fits in HBM,
and it is *exact*. This subsumes the reference's per-query SIMD hot loop
(pkg/core/hnsw/hnsw_index.go:2340-2600, native/compute/src/lib.rs:33-413)
with the design the MXU actually wants: one [B, D] x [D, N] matmul.

Two passes:

Pass A (Pallas kernel): for each (query-tile, row-tile) grid cell compute
  scores = biasA - dots * biasB entirely in VMEM on the MXU, then reduce
  each tile with a strided G-group min+argmin (static lane-aligned slices —
  a reshape across lanes would force a Mosaic relayout) and write only
  [B, N/G] group-mins + argmins to HBM. The [B, N] score matrix never
  touches HBM — materializing it is what makes a naive XLA scan
  HBM-bound (measured 3-4x slower).

Pass B (XLA): top-k over the reduced [B, N/G] array — `approx_min_k`
  (hardware PartialReduce, recall ~0.999 at k=16) or exact `top_k` — then
  index reconstruction. Group layout: within a row-tile of ST rows, group j
  in [0, W) covers global rows tile*ST + j + m*W for m in [0, G), so
  row = (p // W) * ST + (p % W) + argmin * W for flat reduced index p.

The score is the affine form  biasA[row] - dots * biasB[row]  which covers
every metric/precision family (see `serving_bias`):
  L2/f32,bf16 : biasA = |x|^2 (+inf for masked rows), biasB = 2
  cosine      : biasA = mask, biasB = 2            (score = -2 dot)
  int8 L2     : biasA = |x|_int^2 + mask, biasB = 2  (quantized domain)
  int8 cosine : biasA = mask, biasB = 2 / |x|_int  (score = -2 dot/|x|)
Masked rows (deleted / unallocated / filtered-out) get biasA = +inf, which
propagates through min-reduction and top-k naturally.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from . import distance as dist

G = 8  # default group-min reduction factor (pass A output is N/G wide)


def g_for(n_rows: int) -> int:
    """Adaptive reduction factor: pass-B IO scales as N/G, while the
    group-argmin collision loss scales as (G-1)*45/N per query for top-10 —
    so bigger arenas afford bigger G (measured: G=32 saves ~12% at 1M+
    with no coverage change; G=32 below ~500k rows costs ~1% recall)."""
    if n_rows >= (1 << 21):
        return 32
    if n_rows >= (1 << 20):
        return 16
    return 8


def _tiles(B: int, N: int, int8: bool = False,
           hi_prec: bool = False, dim: int = 128) -> tuple[int, int]:
    """(BT, ST) tile sizes: BT divides B, ST divides N, W=ST/G lane-aligned.
    The f32 HIGHEST-precision path (bf16x3 passes) needs a smaller score
    tile to fit the VMEM scratch budget; wide vectors (dim > 128, e.g.
    384-d sentence embeddings) scale the q/v tiles up, so ST then BT
    shrink until the tile set fits the ~16MB scoped-VMEM limit (measured:
    the d=128 tiling at d=384 overflows by ~1.5MB)."""
    min_bt = 32 if int8 else 16   # int8 min sublane tile is 32
    BT = 512
    while BT > min_bt and B % BT:
        BT //= 2
    if B % BT:
        raise ValueError(f"batch {B} must be a multiple of {min_bt}")
    ST = 2048 if hi_prec else 4096
    while ST > 1024 and N % ST:
        ST //= 2
    if N % ST:
        raise ValueError(f"row count {N} must be a multiple of 1024")

    # f32-word budget: score tile + double-buffered q/v tiles. Calibrated
    # against the known-good d=128 configs (hi_prec bf16x3 triples the
    # matmul scratch, hence the tighter budget).
    budget = 1_800_000 if hi_prec else 3_500_000

    def words(bt: int, st: int) -> int:
        return bt * st + 2 * st * dim + 2 * bt * dim

    while ST > 1024 and words(BT, ST) > budget:
        ST //= 2
    while BT > min_bt and words(BT, ST) > budget:
        BT //= 2
    return BT, ST


def _make_kernel(BT: int, ST: int, int8: bool, hi_prec: bool,
                 G: int, asym: bool = False):
    W = ST // G

    def kernel(q_ref, v_ref, biasA_ref, biasB_ref, gmin_ref, garg_ref):
        if int8 and asym:
            # asymmetric int8: float query × int8 codes. The codes cast to
            # the query dtype losslessly (|code| <= 127 fits bf16/f32
            # exactly), so the corpus's quantization is the ONLY remaining
            # error — removes the query-quantization half of the symmetric
            # path's recall loss while the arena still reads at 1 B/elem.
            # Default = one bf16 pass (the f32 query truncates to bf16);
            # exact mode sets hi_prec so the query keeps full precision
            # and 'exact' means exact-in-f32, matching the _scan_xla
            # fallback's HIGHEST for the same case.
            dots = jax.lax.dot_general(
                q_ref[:], v_ref[:].astype(q_ref.dtype),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST if hi_prec
                else jax.lax.Precision.DEFAULT)
        elif int8:
            dots = jax.lax.dot_general(
                q_ref[:], v_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
        else:
            # f32 arenas need HIGHEST (bf16x3 passes): the MXU's default
            # single bf16 pass truncates inputs, reordering near-ties —
            # measured recall 0.86-0.98 vs 0.997 on clustered data. bf16
            # arenas are exact in one pass for their storage precision.
            dots = jax.lax.dot_general(
                q_ref[:], v_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST if hi_prec
                else jax.lax.Precision.DEFAULT)              # [BT, ST]
        scores = biasA_ref[:] - dots * biasB_ref[:]
        # strided group min via static lane slices (no relayout):
        # group j covers tile rows {j + m*W : m in [0, G)}
        gmin = scores[:, 0:W]
        for m in range(1, G):
            gmin = jnp.minimum(gmin, scores[:, m * W:(m + 1) * W])
        garg = jnp.zeros((BT, W), jnp.int32)
        for m in range(1, G):
            garg = jnp.where(scores[:, m * W:(m + 1) * W] == gmin, m, garg)
        gmin_ref[:] = gmin
        garg_ref[:] = garg

    return kernel


def _hi_prec_for(v_dtype, q_dtype, fast: bool, exact: bool) -> bool:
    """f32 arenas always need the bf16x3 passes (near-tie ordering);
    asym int8 needs them only in exact mode (the rerank fixes approx)."""
    if fast:
        return False
    if v_dtype == jnp.float32:
        return True
    return exact and v_dtype == jnp.int8 and q_dtype != jnp.int8


@functools.partial(jax.jit, static_argnames=("interpret", "fast", "exact"))
def _pass_a(q, vectors, biasA, biasB, *, interpret=False, fast=False,
            exact=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, D = q.shape
    N = vectors.shape[0]
    hi_prec = _hi_prec_for(vectors.dtype, q.dtype, fast, exact)
    BT, ST = _tiles(B, N, vectors.dtype == jnp.int8, hi_prec,
                    dim=D)
    G = min(g_for(N), ST // 128)     # keep W = ST/G lane-aligned (>=128)
    W = ST // G
    kernel = _make_kernel(BT, ST, vectors.dtype == jnp.int8, hi_prec, G,
                          asym=vectors.dtype == jnp.int8
                          and q.dtype != jnp.int8)
    return pl.pallas_call(
        kernel,
        grid=(B // BT, N // ST),
        in_specs=[
            pl.BlockSpec((BT, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ST, D), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ST), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ST), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BT, W), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, W), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N // G), jnp.float32),
            jax.ShapeDtypeStruct((B, N // G), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * D,
            bytes_accessed=N * D * vectors.dtype.itemsize
            + 2 * B * (N // G) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, vectors, biasA[None, :], biasB[None, :])


@functools.partial(jax.jit,
                   static_argnames=("k", "exact", "interpret", "fast"))
def _scan_pallas(q, vectors, biasA, biasB, k, exact, interpret=False,
                 fast=False):
    N = vectors.shape[0]
    hi_prec = _hi_prec_for(vectors.dtype, q.dtype, fast, exact)
    _, ST = _tiles(q.shape[0], N, vectors.dtype == jnp.int8, hi_prec,
                   dim=vectors.shape[1])
    G = min(g_for(N), ST // 128)     # must match _pass_a's choice
    W = ST // G
    gmin, garg = _pass_a(q, vectors, biasA, biasB, interpret=interpret,
                         fast=fast, exact=exact)
    if exact:
        nbd, bp = jax.lax.top_k(-gmin, k)
        bd = -nbd
    else:
        bd, bp = jax.lax.approx_min_k(gmin, k, recall_target=0.99)
    m = jnp.take_along_axis(garg, bp, axis=1)
    rows = (bp // W) * ST + (bp % W) + m * W
    rows = jnp.where(jnp.isinf(bd), -1, rows)
    return bd, rows


@functools.partial(jax.jit, static_argnames=("k", "block"))
def _scan_xla(q, vectors, biasA, biasB, k, block=16384):
    """Blocked exact fallback for non-TPU backends (tests on CPU) — same
    score semantics, running top-k merge."""
    B = q.shape[0]
    N = vectors.shape[0]
    block = min(block, N)
    nblocks = -(-N // block)
    pad = nblocks * block - N
    v = jnp.pad(vectors, ((0, pad), (0, 0)))
    bA = jnp.pad(biasA, (0, pad), constant_values=jnp.inf)
    bB = jnp.pad(biasB, (0, pad))

    def body(carry, start):
        cd, ci = carry
        blk = jax.lax.dynamic_slice_in_dim(v, start, block, 0)
        a = jax.lax.dynamic_slice_in_dim(bA, start, block, 0)
        b = jax.lax.dynamic_slice_in_dim(bB, start, block, 0)
        if vectors.dtype == jnp.int8 and q.dtype == jnp.int8:
            dots = jax.lax.dot_general(
                q, blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
        elif vectors.dtype == jnp.int8:
            # asymmetric: float query × int8 codes (exact in f32)
            dots = jax.lax.dot_general(
                q.astype(jnp.float32), blk.astype(jnp.float32),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        else:
            dots = jax.lax.dot_general(
                q, blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST
                if vectors.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
        scores = a[None, :] - dots * b[None, :]
        idx = start + jax.lax.broadcasted_iota(jnp.int32, (1, block), 1)[0]
        md = jnp.concatenate([cd, scores], axis=1)
        mi = jnp.concatenate([ci, jnp.broadcast_to(idx[None, :],
                                                   (B, block))], axis=1)
        nd, pos = jax.lax.top_k(-md, k)
        return (-nd, jnp.take_along_axis(mi, pos, axis=1)), None

    init = (jnp.full((B, k), jnp.inf, jnp.float32),
            jnp.full((B, k), -1, jnp.int32))
    starts = jnp.arange(nblocks, dtype=jnp.int32) * block
    (d, i), _ = jax.lax.scan(body, init, starts)
    i = jnp.where(jnp.isinf(d), -1, i)
    return d, i


def scan_topk(
    q: jax.Array,          # [B, D] compute dtype (bf16/f32/int8), B % 16 == 0
    vectors: jax.Array,    # [N, D] storage dtype, N % 1024 == 0
    biasA: jax.Array,      # [N] f32 (includes +inf masking)
    biasB: jax.Array,      # [N] f32 per-row dot multiplier
    k: int,
    *,
    mode: str = "auto",    # auto | approx | exact
) -> tuple[jax.Array, jax.Array]:
    """Fused scan top-k: returns (scores [B,k] ascending, rows [B,k]).

    Scores are the rank-equivalent affine form biasA - dots*biasB; use
    `serving_bias`/`scores_to_distances` to map to real distances.
    """
    if _use_pallas(vectors.shape[0]):
        return _scan_pallas(q, vectors, biasA, biasB, k,
                            mode == "exact")
    return _scan_xla(q, vectors, biasA, biasB, k)


# Below this row count the G-group argmin's collision loss is measurable
# (two true top-k rows sharing a group keeps only one) and the exact XLA
# blocked scan is cheap anyway — the fused kernel only pays off at scale.
PALLAS_MIN_ROWS = 1 << 17


def _use_pallas(n_rows: int) -> bool:
    return jax.default_backend() == "tpu" and n_rows >= PALLAS_MIN_ROWS


@functools.partial(jax.jit, static_argnames=("metric",))
def serving_bias(
    vectors: jax.Array,    # [N, D] storage dtype
    norms: jax.Array,      # [N] f32: |x|^2 for f32/bf16 L2, int-domain
    #                        norms for int8, unused (zeros) for cosine
    live: jax.Array,       # [N] bool — allocated and not deleted
    metric: str,
    quantum: Optional[jax.Array] = None,   # int8 asym L2: abs_max / 127
) -> tuple[jax.Array, jax.Array]:
    """(biasA, biasB) for the scan score form, with +inf masking of dead
    rows. All inputs are [N]-sized — the arena itself is not re-read
    (HNSWIndex._encode maintains |x|^2 in norms at stage time).

    int8 with `quantum` set = ASYMMETRIC scoring (float query × int8
    codes): L2 biases move to the dequantized domain so scores come out
    as real distances (biasA = |quantum·x_int|², biasB = 2·quantum);
    cosine is scale-invariant so its biases are identical either way.
    """
    mask = jnp.where(live, 0.0, jnp.inf)
    if vectors.dtype == jnp.int8:
        if metric == dist.COSINE:
            biasA = mask
            biasB = 2.0 / jnp.maximum(norms, 1e-9)
        elif quantum is not None:
            biasA = (quantum * norms.astype(jnp.float32)) ** 2 + mask
            biasB = jnp.full_like(mask, 2.0) * quantum
        else:
            biasA = norms.astype(jnp.float32) ** 2 + mask
            biasB = jnp.full_like(mask, 2.0)
    elif metric == dist.COSINE:
        biasA = mask
        biasB = jnp.full_like(mask, 2.0)
    else:
        biasA = norms + mask           # norms hold the precomputed |x|^2
        biasB = jnp.full_like(mask, 2.0)
    return biasA, biasB


@functools.partial(jax.jit,
                   static_argnames=("k", "metric", "mode", "has_allow",
                                    "fast"))
def scan_search(
    vectors: jax.Array,    # [cap, D] storage dtype
    norms: jax.Array,      # [cap] f32
    levels: jax.Array,     # [cap] int32 (-1 = unallocated)
    deleted: jax.Array,    # [cap] bool
    allow: Optional[jax.Array],   # [cap] bool or None (pass has_allow)
    q: jax.Array,          # [B, D] encoded queries, B % 16 (32 for int8)
    qn: jax.Array,         # [B] f32 (int-domain query norms; zeros if n/a)
    k: int,
    *,
    metric: str,
    mode: str = "approx",
    has_allow: bool = False,
    fast: bool = False,
    quantum: Optional[jax.Array] = None,
) -> tuple[jax.Array, jax.Array]:
    """One fused program: bias computation + scan top-k + distance map.
    The index-level serving entry (replaces beam_search on the scan path).

    int8 arenas with a FLOAT query run ASYMMETRIC (query unquantized;
    pass `quantum` = abs_max/127 for L2 so distances come out in the real
    domain — no host rescale). An int8 query keeps the symmetric
    int-domain path (hnsw_index.go:2396-2443 parity).
    """
    live = (levels >= 0) & ~deleted
    if has_allow:
        live = live & allow
    asym = vectors.dtype == jnp.int8 and q.dtype != jnp.int8
    biasA, biasB = serving_bias(vectors, norms, live, metric,
                                quantum if asym else None)
    is_int8_sym = vectors.dtype == jnp.int8 and not asym
    if _use_pallas(vectors.shape[0]):
        if mode != "exact" and not fast \
                and (vectors.dtype == jnp.float32 or asym):
            # default f32 approx path: single-pass (bf16) scan finds the
            # candidate set, then an exact re-rank of the k candidates
            # (VPU gather-einsum at HIGHEST). Measured at 1M x 128:
            # 129k QPS @ recall 0.9984 vs 96k @ 0.9979 for a bf16x3
            # pass A — faster AND more accurate (rerank fixes the
            # near-tie ordering the fast pass scrambles). The asym int8
            # path gets the same treatment: pass A truncates the query to
            # bf16, the rerank re-scores at full f32.
            _, rows = _scan_pallas(q, vectors, biasA, biasB, k,
                                   False, fast=True)
            d = dist.gathered(vectors, rows, q, metric,
                              corpus_norms=norms, query_norms=qn,
                              quantum=quantum if asym else None)
            d = jnp.where(rows < 0, jnp.inf, d)
            order = jnp.argsort(d, axis=1)
            d = jnp.take_along_axis(d, order, 1)
            rows = jnp.take_along_axis(rows, order, 1)
            rows = jnp.where(jnp.isinf(d), -1, rows)
            return jnp.maximum(d, 0.0), rows
        s, rows = _scan_pallas(q, vectors, biasA, biasB, k, mode == "exact",
                               fast=fast)
    else:
        s, rows = _scan_xla(q, vectors, biasA, biasB, k)
    d = scores_to_distances(s, q, qn, metric, is_int8_sym)
    d = jnp.where(rows < 0, jnp.inf, jnp.maximum(d, 0.0))
    return d, rows


def scores_to_distances(scores, q32, qn, metric: str,
                        int8: bool) -> jax.Array:
    """Map rank-equivalent scan scores back to the metric's distances.

    L2: score = |x|^2 - 2 q.x → d^2 = score + |q|^2 (quantized domain for
    int8; the host rescales by quantum^2 like the gather path).
    Cosine: score = -2 dot (/|x| for int8, already folded) →
    d = 1 + score / (2 |q|) with |q| = 1 for pre-normalized f32/bf16.
    """
    if metric == dist.COSINE:
        if int8:
            return 1.0 + scores / (2.0 * jnp.maximum(qn, 1e-9)[:, None])
        return 1.0 + scores / 2.0
    q2 = (qn ** 2)[:, None] if int8 else \
        jnp.sum(q32.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
    return scores + q2
