"""HNSW as dense device arrays — the jitted functional kernels.

This module is the TPU re-architecture of the reference's pointer-graph HNSW
(pkg/core/hnsw/hnsw_index.go). Instead of Go structs, shard mutexes and
sync.Pools, the whole index is one pytree of fixed-shape HBM arrays:

  vectors  [cap, D]          the "mmap arena" (pkg/storage/mmap/arena.go)
  nbrs     [cap, M0]         level-0 adjacency, padded -1
                             (replaces Node.Connections, hnsw_node.go:21-39)
  levels   [cap] int32       geometric level per node (hnsw_index.go:2605-2614)
  deleted  [cap] bool        soft delete — traversable but excluded from results
                             (hnsw_index.go:2570-2579)
  up_*                       compact upper-level adjacency used only for greedy
                             descent. Unlike the reference (incremental HNSW at
                             every level), upper layers here are maintained as
                             exact-KNN graphs — they are tiny (P(level>=l)=M^-l)
                             so exactness is affordable and navigates better.

Searches run as *batched lockstep beam traversal*: B queries advance together
inside one `lax.while_loop`; per-iteration work is a neighbor-row gather, a
visited-table check, a batched distance reduce, and a fused top-k pool merge.
This replaces the per-query heap loop `searchLayerUnlocked`
(hnsw_index.go:2340-2600). Two pools are kept per query, matching the
reference's candidates-heap / results-heap split: the traversal pool admits
every scored node, the result pool only nodes passing (allow-mask AND not
deleted) — i.e. filters fold INTO traversal instead of post-filtering
(reference allowList filtering + smart entry, hnsw_index.go:421-431,2534-2538).

Construction is chunked batch insert, the array form of the reference's
5-phase AddBatch (hnsw_index.go:1457-2077): batched candidate search →
batched select-neighbors heuristic → forward-link scatter → sort-based
reverse-link grouping (replaces the 128-shard shuffle, :1852-1879) →
distance-pruned merge. A refine pass (optimizer.go:273-443) re-selects rows
with the full diversity heuristic.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import distance as dist


class GraphState(NamedTuple):
    """The entire index as a pytree of device arrays."""
    vectors: jax.Array    # [cap, D] storage dtype
    norms: jax.Array      # [cap] f32 — int8 quantized-domain norms (else zeros)
    nbrs: jax.Array       # [cap, M0] int32, -1 padded
    levels: jax.Array     # [cap] int32, -1 for unallocated rows
    deleted: jax.Array    # [cap] bool
    up_of: jax.Array      # [cap] int32 — compact upper row or -1
    up_node: jax.Array    # [ucap] int32 — node row of each upper slot, -1 free
    up_nbrs: jax.Array    # [ucap, LMAX, MU] int32 — per-level exact-KNN rows
    up_dists: jax.Array   # [ucap, LMAX, MU] f32 — cached dists for cheap merges
    entry: jax.Array      # int32 scalar — entry point row (-1 when empty)
    max_level: jax.Array  # int32 scalar
    size: jax.Array       # int32 scalar — rows ever allocated (incl. deleted)


def _oob(rows: jax.Array, cap: int) -> jax.Array:
    """Padding sentinel for mode="drop" scatters. JAX normalizes negative
    dynamic indices BEFORE the bounds check, so a -1 sentinel would silently
    write row cap-1; a positive out-of-range index (cap == axis length) is
    genuinely dropped."""
    return jnp.where(rows >= 0, rows, cap)


def init_state(cap: int, dim: int, dtype, *, m0: int, lmax: int, mu: int,
               ucap: int) -> GraphState:
    return GraphState(
        vectors=jnp.zeros((cap, dim), dtype),
        norms=jnp.zeros((cap,), jnp.float32),
        nbrs=jnp.full((cap, m0), -1, jnp.int32),
        levels=jnp.full((cap,), -1, jnp.int32),
        deleted=jnp.zeros((cap,), bool),
        up_of=jnp.full((cap,), -1, jnp.int32),
        up_node=jnp.full((ucap,), -1, jnp.int32),
        up_nbrs=jnp.full((ucap, lmax, mu), -1, jnp.int32),
        up_dists=jnp.full((ucap, lmax, mu), jnp.inf, jnp.float32),
        entry=jnp.int32(-1),
        max_level=jnp.int32(0),
        size=jnp.int32(0),
    )


def grow_state(state: GraphState, new_cap: int, new_ucap: int) -> GraphState:
    """Capacity-tier growth (SURVEY §7.4: capacity doubling = re-jit)."""
    cap = state.vectors.shape[0]
    ucap = state.up_node.shape[0]
    pc, pu = new_cap - cap, new_ucap - ucap
    return state._replace(
        vectors=jnp.pad(state.vectors, ((0, pc), (0, 0))),
        norms=jnp.pad(state.norms, (0, pc)),
        nbrs=jnp.pad(state.nbrs, ((0, pc), (0, 0)), constant_values=-1),
        levels=jnp.pad(state.levels, (0, pc), constant_values=-1),
        deleted=jnp.pad(state.deleted, (0, pc)),
        up_of=jnp.pad(state.up_of, (0, pc), constant_values=-1),
        up_node=jnp.pad(state.up_node, (0, pu), constant_values=-1),
        up_nbrs=jnp.pad(state.up_nbrs, ((0, pu), (0, 0), (0, 0)), constant_values=-1),
        up_dists=jnp.pad(state.up_dists, ((0, pu), (0, 0), (0, 0)),
                         constant_values=jnp.inf),
    )


# ---------------------------------------------------------------------------
# distance helper bound to a state
# ---------------------------------------------------------------------------

def _gathered(state: GraphState, ids, q, qn, metric):
    return dist.gathered(state.vectors, ids, q, metric,
                         corpus_norms=state.norms, query_norms=qn)


def _point(state: GraphState, rows, q, qn, metric):
    """Distance of each query to one row: rows [B] → [B]."""
    return _gathered(state, rows[:, None], q, qn, metric)[:, 0]


# ---------------------------------------------------------------------------
# greedy descent over the upper exact-KNN layers
# (reference: top-down ef=1 levels maxLevel..1, hnsw_index.go:434-443)
# ---------------------------------------------------------------------------

def descend(state: GraphState, q: jax.Array, qn: Optional[jax.Array],
            metric: str, *, max_hops: int = 64) -> jax.Array:
    """[B, D] queries → [B] level-0 start rows."""
    B = q.shape[0]
    cur = jnp.broadcast_to(state.entry, (B,))
    curd = _point(state, cur, q, qn, metric)

    def level_body(lvl_carry):
        lvl, cur, curd = lvl_carry

        def hop_cond(c):
            _, _, moved, hops = c
            return jnp.any(moved) & (hops < max_hops)

        def hop_body(c):
            cur, curd, _, hops = c
            uidx = state.up_of[cur]                       # [B]
            nb = state.up_nbrs[jnp.maximum(uidx, 0), lvl - 1]  # [B, MU]
            nb = jnp.where(uidx[:, None] >= 0, nb, -1)
            d = _gathered(state, nb, q, qn, metric)       # [B, MU]
            j = jnp.argmin(d, axis=1)
            bd = jnp.take_along_axis(d, j[:, None], 1)[:, 0]
            bi = jnp.take_along_axis(nb, j[:, None], 1)[:, 0]
            moved = bd < curd
            return (jnp.where(moved, bi, cur), jnp.minimum(bd, curd),
                    moved, hops + 1)

        cur, curd, _, _ = jax.lax.while_loop(
            hop_cond, hop_body, (cur, curd, jnp.ones((B,), bool), 0))
        return (lvl - 1, cur, curd)

    def level_cond(lvl_carry):
        return lvl_carry[0] >= 1

    _, cur, _ = jax.lax.while_loop(
        level_cond, level_body, (state.max_level, cur, curd))
    return cur


# ---------------------------------------------------------------------------
# batched lockstep beam search at level 0
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("metric", "ef", "expand", "max_iters", "dual",
                     "history", "nav_width"))
def beam_search(
    state: GraphState,
    q: jax.Array,                 # [B, D] storage dtype (already encoded)
    qn: Optional[jax.Array],      # [B] f32 or None
    *,
    metric: str,
    ef: int,
    expand: int = 4,
    max_iters: int = 0,
    allow: Optional[jax.Array] = None,     # [cap] bool — result eligibility
    exclude: Optional[jax.Array] = None,   # [B] row to exclude (refine self)
    dual: bool = False,
    history: int = 0,
    nav_width: int = 0,                    # gather only the first W neighbor
                                           # slots (rows are distance-sorted;
                                           # 0 = all). Halves gather rows at
                                           # small recall cost.
    nav: Optional[jax.Array] = None,       # [cap, W] contiguous narrow copy
                                           # of nbrs[:, :W]. Unlike nav_width
                                           # (which slices the wide table —
                                           # a slow strided-gather path on
                                           # TPU), full-row gathers from a
                                           # separate narrow array stay on
                                           # XLA's fast gather path.
    for_insert: bool = False,              # kept for call-site clarity
) -> tuple[jax.Array, jax.Array]:
    """Returns (res_d [B, ef] ascending, res_i [B, ef]; +inf/-1 padded).

    Lockstep multi-expand beam: each iteration pops the best `expand`
    unexpanded candidates of every query, gathers their neighbor rows, and
    merges freshly-scored nodes into the pool with one fused top-k. The
    reference's per-query visited bitset (bitset.go, pooled in
    hnsw_index.go:42-120) is replaced by structural dedup — membership tests
    against the pool itself, an expansion-history ring, and an intra-batch
    earlier-position mask — so no O(B·cap) visited table is materialized
    (the key memory-design decision flagged in SURVEY §7.4).

    dual=False (fast path): one pool; valid only when every row is result-
    eligible (no filter, no deletions, no exclusion).
    dual=True: separate traversal and result pools, matching the reference's
    candidates-heap / results-heap split with filters folded into traversal
    (hnsw_index.go:2340-2600, allowList + deleted semantics :2534-2579).

    Termination per query: best unexpanded candidate >= current ef-th result
    (hnsw_index.go:2490-2495).
    """
    B, _ = q.shape
    M0 = state.nbrs.shape[1]
    if nav is not None:
        M0 = nav.shape[1]
    elif nav_width and nav_width < M0:
        M0 = nav_width
    E = max(1, min(expand, ef))   # cannot pop more than the pool width
    C = E * M0
    if max_iters <= 0:
        max_iters = (2 * ef) // E + 24
    # history ring: dedup against recently-expanded ids. A small ring is
    # enough — re-expansion needs an expanded id to be evicted from the
    # pool AND re-discovered, which the pool membership test already makes
    # rare (measured: recall unchanged at R=64 vs R=512, ~25% faster).
    R = history if history > 0 else min(_next_pow2(max_iters * E), 128)
    bidx = jnp.arange(B, dtype=jnp.int32)[:, None]

    res_ok_global = None
    if dual:
        # result pool excludes deleted rows (traversable-but-excluded,
        # hnsw_index.go:2570-2579) and rows outside the allow mask
        res_ok_global = ~state.deleted
        if allow is not None:
            res_ok_global = res_ok_global & allow

    # --- seeds: descent result + (filtered search) PER-QUERY nearest
    # allowed rows, upgrading the reference's single smart entry point
    # (hnsw_index.go:421-431): sample allowed rows evenly over the arena
    # via the allow-mask cumsum, score them against every query with one
    # small matmul, and seed each query with its own best S_SEED rows —
    # a shared argmax(allow) seed strands low-selectivity queries whose
    # allowed region is far from it.
    start = descend(state, q, qn, metric)
    seeds = start[:, None]                                     # [B, 1]
    if allow is not None:
        cap = allow.shape[0]
        S_SAMPLE = min(128, cap)
        S_SEED = 4
        c = jnp.cumsum(allow.astype(jnp.int32))
        total = c[-1]
        # evenly spread ranks 1..total across S_SAMPLE probes
        ranks = jnp.minimum(
            (jnp.arange(S_SAMPLE, dtype=jnp.float32) + 0.5)
            * total.astype(jnp.float32) / S_SAMPLE,
            jnp.maximum(total.astype(jnp.float32) - 1, 0)) + 1
        probe = jnp.searchsorted(c, ranks.astype(jnp.int32),
                                 side="left").astype(jnp.int32)
        probe = jnp.minimum(probe, cap - 1)
        has_allowed = total > 0
        pd = dist.pairwise(q, state.vectors[probe], metric,
                           corpus_norms=state.norms[probe],
                           query_norms=qn)                      # [B, S]
        neg_pd, best = jax.lax.top_k(-pd, S_SEED)               # [B, S_SEED]
        extra = jnp.where(has_allowed, probe[best],
                          seeds.repeat(S_SEED, axis=1))
        seeds = jnp.concatenate([seeds, extra], axis=1)         # [B, 1+S_SEED]
        # dedupe seed columns — duplicate pool entries would surface as
        # duplicate results
        eqs = seeds[:, :, None] == seeds[:, None, :]
        tris = jnp.tril(jnp.ones((seeds.shape[1],) * 2, bool), k=-1)
        seeds = jnp.where(jnp.any(eqs & tris[None], axis=2), -1, seeds)
    seed_d = _gathered(state, seeds, q, qn, metric)

    def merge(pd, pi, px, nd, ni, width):
        # variadic sort + truncate: ~2x faster than lax.top_k on TPU for
        # these widths (XLA TopK lowering is iterative in k; sort is one
        # fused bitonic pass carrying the payloads along)
        ad = jnp.concatenate([pd, nd], axis=1)
        ai = jnp.concatenate([pi, ni], axis=1)
        ax = jnp.concatenate([px, jnp.zeros_like(ni, bool)], axis=1)
        sd, si, sx = jax.lax.sort((ad, ai, sx_i32(ax)), num_keys=1)
        return sd[:, :width], si[:, :width], sx[:, :width].astype(bool)

    def sx_i32(x):
        return x.astype(jnp.int32)

    pad_d = jnp.full((B, ef), jnp.inf, jnp.float32)
    pad_i = jnp.full((B, ef), -1, jnp.int32)
    pad_x = jnp.zeros((B, ef), bool)
    cand_d, cand_i, cand_x = merge(pad_d, pad_i, pad_x, seed_d, seeds, ef)

    if dual:
        seed_ok = res_ok_global[seeds] & (seeds >= 0)
        if exclude is not None:
            seed_ok = seed_ok & (seeds != exclude[:, None])
        rd0 = jnp.where(seed_ok, seed_d, jnp.inf)
        ri0 = jnp.where(seed_ok, seeds, -1)
        res_d, res_i, _ = merge(pad_d, pad_i, pad_x, rd0, ri0, ef)
    else:
        res_d, res_i = cand_d, cand_i

    hist = jnp.full((B, R), -1, jnp.int32)

    def cond(carry):
        it, done, *_ = carry
        return (it < max_iters) & jnp.any(~done)

    def body(carry):
        it, done, hist, cand_d, cand_i, cand_x, res_d, res_i = carry
        ud = jnp.where(cand_x | (cand_i < 0), jnp.inf, cand_d)
        neg_sel, sel_pos = jax.lax.top_k(-ud, E)                 # [B, E]
        sel_d = -neg_sel
        sel_i = jnp.take_along_axis(cand_i, sel_pos, 1)
        bound = res_d[:, -1]
        qdone = done | (sel_d[:, 0] >= bound) | (sel_i[:, 0] < 0)
        cand_x = cand_x.at[bidx, sel_pos].set(True)
        hist = jax.lax.dynamic_update_slice(
            hist, sel_i, (0, (it * E) % R))

        if nav is not None:
            nb = nav[jnp.maximum(sel_i, 0)].reshape(B, C)
        else:
            nb = state.nbrs[jnp.maximum(sel_i, 0), :M0].reshape(B, C)
        nb = jnp.where((sel_i >= 0).repeat(M0, axis=1), nb, -1)
        # structural dedup: vs pool, vs expansion history, vs earlier slot
        dup = jnp.any(nb[:, :, None] == cand_i[:, None, :], axis=2)
        dup |= jnp.any(nb[:, :, None] == hist[:, None, :], axis=2)
        eq = nb[:, :, None] == nb[:, None, :]
        tri = jnp.tril(jnp.ones((C, C), bool), k=-1)
        dup |= jnp.any(eq & tri[None], axis=2)
        if dual:
            dup |= jnp.any(nb[:, :, None] == res_i[:, None, :], axis=2) \
                & ~jnp.any(nb[:, :, None] == cand_i[:, None, :], axis=2)
        fresh = (nb >= 0) & ~dup & ~qdone[:, None]
        nb = jnp.where(fresh, nb, -1)

        nd = _gathered(state, nb, q, qn, metric)                  # inf for -1
        cand_d, cand_i, cand_x = merge(cand_d, cand_i, cand_x, nd, nb, ef)
        if dual:
            ok = fresh & res_ok_global[jnp.maximum(nb, 0)]
            if exclude is not None:
                ok = ok & (nb != exclude[:, None])
            rd = jnp.where(ok, nd, jnp.inf)
            ri = jnp.where(ok, nb, -1)
            res_d, res_i, _ = merge(res_d, res_i,
                                    jnp.zeros_like(res_d, bool), rd, ri, ef)
        else:
            res_d, res_i = cand_d, cand_i
        return (it + 1, qdone, hist, cand_d, cand_i, cand_x, res_d, res_i)

    init = (jnp.int32(0), jnp.zeros((B,), bool), hist,
            cand_d, cand_i, cand_x, res_d, res_i)
    *_, res_d, res_i = jax.lax.while_loop(cond, body, init)
    res_i = jnp.where(jnp.isinf(res_d), -1, res_i)
    return res_d, res_i


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


# ---------------------------------------------------------------------------
# select-neighbors diversity heuristic (batched)
# (reference selectNeighbors + discarded backfill, hnsw_index.go:2618-2690)
# ---------------------------------------------------------------------------

def select_neighbors(
    state: GraphState,
    cand_d: jax.Array,     # [B, C] ascending, inf padded
    cand_i: jax.Array,     # [B, C] -1 padded
    m: int,
    metric: str,
) -> tuple[jax.Array, jax.Array]:
    """Keep candidate c iff d(c, q) < min over selected s of d(c, s); then
    backfill nearest discarded until m. Returns (ids [B, m], dists [B, m]).
    """
    B, C = cand_i.shape
    valid = cand_i >= 0

    # pairwise candidate-candidate distances [B, C, C]
    safe = jnp.maximum(cand_i, 0)
    vecs = state.vectors[safe]                                   # [B, C, D]
    if state.vectors.dtype == jnp.int8:
        dots = jnp.einsum("bcd,bed->bce", vecs.astype(jnp.int32),
                          vecs.astype(jnp.int32)).astype(jnp.float32)
        if metric == dist.COSINE:
            n = jnp.maximum(state.norms[safe], 1e-9)
            P = 1.0 - dots / (n[:, :, None] * n[:, None, :])
        else:
            n2 = state.norms[safe] ** 2
            P = n2[:, :, None] - 2.0 * dots + n2[:, None, :]
    else:
        v32 = vecs.astype(jnp.bfloat16 if vecs.dtype == jnp.bfloat16
                          else jnp.float32)
        dots = jnp.einsum("bcd,bed->bce", v32, v32,
                          preferred_element_type=jnp.float32)
        if metric == dist.COSINE:
            P = 1.0 - dots
        else:
            sq = jnp.sum(vecs.astype(jnp.float32) ** 2, axis=-1)
            P = sq[:, :, None] - 2.0 * dots + sq[:, None, :]

    big = jnp.float32(jnp.inf)

    def slot(c, carry):
        selected, count = carry
        # min distance from candidate c to already-selected candidates
        dc = jnp.where(selected, P[:, c, :], big)               # [B, C]
        mind = jnp.min(dc, axis=1)
        keep = valid[:, c] & (count < m) & (cand_d[:, c] < mind)
        selected = selected.at[:, c].set(keep)
        return selected, count + keep.astype(jnp.int32)

    selected = jnp.zeros((B, C), bool)
    count = jnp.zeros((B,), jnp.int32)
    selected, count = jax.lax.fori_loop(0, C, slot, (selected, count))

    # order: selected first (by original ascending-dist position), then
    # discarded backfill (also ascending), invalid last.
    pos = jnp.arange(C, dtype=jnp.int32)[None, :]
    key = jnp.where(selected, pos, pos + C)
    key = jnp.where(valid, key, pos + 2 * C)
    order = jnp.argsort(key, axis=1)[:, :m]                      # [B, m]
    out_i = jnp.take_along_axis(cand_i, order, 1)
    out_d = jnp.take_along_axis(cand_d, order, 1)
    out_i = jnp.where(jnp.isinf(out_d), -1, out_i)
    return out_i, out_d


# ---------------------------------------------------------------------------
# chunk commit: forward links + sort-grouped reverse links
# (array form of AddBatch phases 2-4, hnsw_index.go:1852-2069)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("metric", "m", "rev_cap"),
                   donate_argnums=(0,))
def commit_chunk(
    state: GraphState,
    rows: jax.Array,        # [C] int32, -1 padded
    sel_i: jax.Array,       # [C, m] selected forward neighbors (-1 padded)
    sel_d: jax.Array,       # [C, m] their dists
    new_levels: jax.Array,  # [C] int32 (-1 for padding)
    *,
    metric: str,
    m: int,
    rev_cap: int = 8,
) -> GraphState:
    C = rows.shape[0]
    M0 = state.nbrs.shape[1]

    # -- forward links: place the m selected into the first m slots ----------
    fwd = jnp.full((C, M0), -1, jnp.int32)
    fwd = fwd.at[:, :m].set(sel_i)
    cap = state.nbrs.shape[0]
    nbrs = state.nbrs.at[_oob(rows, cap)].set(fwd, mode="drop")

    # -- reverse links: pairs (dst, src, d), grouped by dst via sort ---------
    src = jnp.broadcast_to(rows[:, None], (C, m)).reshape(-1)
    dst = sel_i.reshape(-1)
    pd = sel_d.reshape(-1)
    ok = (dst >= 0) & (src >= 0)
    dst = jnp.where(ok, dst, jnp.iinfo(jnp.int32).max)
    # sort by (dst, dist): nearest entrants first within each group
    order = jnp.lexsort((pd, dst))
    dst_s, src_s, pd_s = dst[order], src[order], pd[order]
    n = dst_s.shape[0]
    is_head = jnp.concatenate(
        [jnp.ones((1,), bool), dst_s[1:] != dst_s[:-1]])
    seg = jnp.cumsum(is_head.astype(jnp.int32)) - 1              # [n]
    pos_in_seg = jnp.arange(n, dtype=jnp.int32) - jnp.maximum(
        jax.lax.associative_scan(
            jnp.maximum,
            jnp.where(is_head, jnp.arange(n, dtype=jnp.int32), -1)), 0)
    good = dst_s != jnp.iinfo(jnp.int32).max
    # bucket table: one row per segment (bounded by n), rev_cap nearest entrants
    buckets_src = jnp.full((n, rev_cap), -1, jnp.int32)
    buckets_d = jnp.full((n, rev_cap), jnp.inf, jnp.float32)
    put = good & (pos_in_seg < rev_cap)
    bi = jnp.where(put, seg, n - 1)
    bj = jnp.where(put, pos_in_seg, rev_cap - 1)
    buckets_src = buckets_src.at[bi, bj].set(
        jnp.where(put, src_s, buckets_src[bi, bj]))
    buckets_d = buckets_d.at[bi, bj].set(
        jnp.where(put, pd_s, buckets_d[bi, bj]))
    seg_dst = jnp.full((n,), -1, jnp.int32)
    head_seg = jnp.where(is_head & good, seg, n - 1)
    seg_dst = seg_dst.at[head_seg].set(jnp.where(is_head & good, dst_s, -1))

    # -- merge entrants into each dst row, prune to M0 by distance -----------
    # (distance prune; the diversity heuristic re-applies during refine,
    # as in optimizer.go Refine)
    def merge_block(args):
        d_rows, b_src, b_d = args                                # [T,..]
        T = d_rows.shape[0]
        old = nbrs[jnp.maximum(d_rows, 0)]                       # [T, M0]
        old = jnp.where(d_rows[:, None] >= 0, old, -1)
        dvec = state.vectors[jnp.maximum(d_rows, 0)]             # [T, D]
        dn = state.norms[jnp.maximum(d_rows, 0)]
        od = dist.gathered(state.vectors, old, dvec, metric,
                           corpus_norms=state.norms, query_norms=dn)
        # dedupe entrants already present in old row
        dup = jnp.any(b_src[:, :, None] == old[:, None, :], axis=2)
        b_d = jnp.where(dup, jnp.inf, b_d)
        all_i = jnp.concatenate([old, jnp.where(dup, -1, b_src)], axis=1)
        all_d = jnp.concatenate([od, b_d], axis=1)
        top_d, posn = jax.lax.top_k(-all_d, M0)
        new_i = jnp.take_along_axis(all_i, posn, 1)
        new_i = jnp.where(jnp.isinf(-top_d), -1, new_i)
        return new_i

    TB = 2048
    nb_blocks = -(-n // TB)
    pad = nb_blocks * TB - n
    d_rows_p = jnp.pad(seg_dst, (0, pad), constant_values=-1).reshape(nb_blocks, TB)
    b_src_p = jnp.pad(buckets_src, ((0, pad), (0, 0)),
                      constant_values=-1).reshape(nb_blocks, TB, rev_cap)
    b_d_p = jnp.pad(buckets_d, ((0, pad), (0, 0)),
                    constant_values=jnp.inf).reshape(nb_blocks, TB, rev_cap)
    new_rows_i = jax.lax.map(merge_block, (d_rows_p, b_src_p, b_d_p))
    new_rows_i = new_rows_i.reshape(nb_blocks * TB, M0)[:n]
    nbrs = nbrs.at[_oob(seg_dst, cap)].set(new_rows_i, mode="drop")

    # -- levels, entry point, size -------------------------------------------
    levels = state.levels.at[_oob(rows, cap)].set(new_levels, mode="drop")
    chunk_max = jnp.max(jnp.where(rows >= 0, new_levels, -1))
    j = jnp.argmax(jnp.where(rows >= 0, new_levels, -1))
    new_entry = jnp.where(
        (chunk_max > state.max_level) | (state.entry < 0), rows[j], state.entry)
    new_max = jnp.maximum(state.max_level, chunk_max)
    new_size = jnp.maximum(state.size, jnp.max(jnp.where(rows >= 0, rows + 1, 0)))
    return state._replace(nbrs=nbrs, levels=levels, entry=new_entry,
                          max_level=new_max, size=new_size)


# ---------------------------------------------------------------------------
# full insert pipeline as one program (AddBatch phases 0-4 fused)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit,
                   static_argnames=("metric", "ef", "m", "intra_k", "dual",
                                    "expand"),
                   donate_argnums=(0,))
def insert_chunk(
    state: GraphState,
    rows: jax.Array,         # [C] int32, -1 padded
    enc: jax.Array,          # [C, D] encoded vectors (padding rows zeroed)
    norms: jax.Array,        # [C] f32
    new_levels: jax.Array,   # [C] int32, -1 padded
    *,
    metric: str,
    ef: int,
    m: int,
    intra_k: int,
    dual: bool = False,
    expand: int = 8,
) -> GraphState:
    """write vectors → beam candidates → intra-chunk brute candidates →
    select-neighbors → forward/reverse link commit. Works from the empty
    graph too (beam yields nothing; intra-chunk candidates seed the graph).
    """
    C = rows.shape[0]
    state = write_vectors(state, rows, enc, norms)
    bd, bi = beam_search(state, enc, norms, metric=metric, ef=ef,
                         dual=dual, expand=expand)
    if intra_k > 0:
        # partial intra-batch visibility (reference AddBatch phase 1 workers
        # see each other's nodes, hnsw_index.go:1755-1844)
        P = dist.pairwise(enc, enc, metric,
                          corpus_norms=norms, query_norms=norms)
        eye = jnp.arange(C)
        P = jnp.where((eye[:, None] == eye[None, :])
                      | (rows[None, :] < 0) | (rows[:, None] < 0),
                      jnp.inf, P)
        k_in = min(intra_k, C - 1)
        nd, npos = jax.lax.top_k(-P, k_in)
        ni = jnp.where(jnp.isinf(-nd), -1, rows[npos])
        all_d = jnp.concatenate([bd, -nd], axis=1)
        all_i = jnp.concatenate([bi, ni], axis=1)
        order = jnp.argsort(all_d, axis=1)
        all_d = jnp.take_along_axis(all_d, order, 1)
        all_i = jnp.take_along_axis(all_i, order, 1)
    else:
        all_d, all_i = bd, bi
    sel_i, sel_d = select_neighbors(state, all_d, all_i, m, metric)
    return commit_chunk(state, rows, sel_i, sel_d, new_levels,
                        metric=metric, m=m)


@functools.partial(jax.jit, donate_argnums=(0,))
def stage_vectors(state: GraphState, rows: jax.Array, vecs: jax.Array,
                  norms: jax.Array, levels: jax.Array) -> GraphState:
    """Stage V of the two-stage insert: make vectors *scan-visible* (arena
    write + level stamp) without graph linking. The fused-scan serving path
    (ops/scan.py) sees rows as live the moment levels >= 0; graph linking
    (link_chunk) can lag behind — unlinked rows are unreachable to beam
    traversal (no in-links) but fully searchable by scan. This is the
    immediate-visibility answer to the reference's single-Add throughput
    (hnsw_index.go:456-800) without its per-insert graph work."""
    cap = state.vectors.shape[0]
    tgt = _oob(rows, cap)
    return state._replace(
        vectors=state.vectors.at[tgt].set(vecs, mode="drop"),
        norms=state.norms.at[tgt].set(norms, mode="drop"),
        levels=state.levels.at[tgt].set(levels, mode="drop"),
        deleted=state.deleted.at[tgt].set(False, mode="drop"),
        size=jnp.maximum(state.size,
                         jnp.max(jnp.where(rows >= 0, rows + 1, 0))),
    )


@functools.partial(jax.jit,
                   static_argnames=("metric", "ef", "m", "intra_k", "dual",
                                    "expand"),
                   donate_argnums=(0,))
def link_chunk(
    state: GraphState,
    rows: jax.Array,         # [C] int32, -1 padded — already staged rows
    new_levels: jax.Array,   # [C] int32, -1 padded
    *,
    metric: str,
    ef: int,
    m: int,
    intra_k: int,
    dual: bool = False,
    expand: int = 8,
) -> GraphState:
    """Stage L: graph-link rows whose vectors are already in the arena
    (insert_chunk minus the vector write; queries gathered from state)."""
    C = rows.shape[0]
    safe = jnp.maximum(rows, 0)
    enc = state.vectors[safe]
    enc = jnp.where((rows >= 0)[:, None], enc, 0)
    norms = state.norms[safe] * (rows >= 0)
    bd, bi = beam_search(state, enc, norms, metric=metric, ef=ef,
                         dual=dual, expand=expand)
    # the staged rows are live in the arena, so a beam could surface a row
    # from this same chunk if it were already linked — it is not (no
    # in-links yet); intra-chunk candidates come from the pairwise block
    if intra_k > 0:
        P = dist.pairwise(enc, enc, metric,
                          corpus_norms=norms, query_norms=norms)
        eye = jnp.arange(C)
        P = jnp.where((eye[:, None] == eye[None, :])
                      | (rows[None, :] < 0) | (rows[:, None] < 0),
                      jnp.inf, P)
        k_in = min(intra_k, C - 1)
        nd, npos = jax.lax.top_k(-P, k_in)
        ni = jnp.where(jnp.isinf(-nd), -1, rows[npos])
        all_d = jnp.concatenate([bd, -nd], axis=1)
        all_i = jnp.concatenate([bi, ni], axis=1)
        order = jnp.argsort(all_d, axis=1)
        all_d = jnp.take_along_axis(all_d, order, 1)
        all_i = jnp.take_along_axis(all_i, order, 1)
    else:
        all_d, all_i = bd, bi
    # a staged-but-unlinked row must not select itself
    self_dup = all_i == rows[:, None]
    all_d = jnp.where(self_dup, jnp.inf, all_d)
    all_i = jnp.where(self_dup, -1, all_i)
    sel_i, sel_d = select_neighbors(state, all_d, all_i, m, metric)
    return commit_chunk(state, rows, sel_i, sel_d, new_levels,
                        metric=metric, m=m)


# ---------------------------------------------------------------------------
# upper-layer exact-KNN maintenance
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("metric",),
                   donate_argnums=(0,))
def update_upper(
    state: GraphState,
    new_nodes: jax.Array,    # [K] node rows with level>=1 (-1 padded)
    new_uidx: jax.Array,     # [K] their assigned upper slots (-1 padded)
    *,
    metric: str,
) -> GraphState:
    """Insert K new upper nodes into every level-l exact-KNN graph.

    Replaces the reference's per-level incremental HNSW linking for upper
    layers with exact KNN: forward rows are the true top-MU among level>=l
    nodes; existing rows merge the new arrivals via the cached distance
    columns (up_dists) — no big gathers.
    """
    K = new_nodes.shape[0]
    ucap, LMAX, MU = state.up_nbrs.shape

    cap = state.up_of.shape[0]
    up_of = state.up_of.at[_oob(new_nodes, cap)].set(new_uidx, mode="drop")
    up_node = state.up_node.at[_oob(new_uidx, ucap)].set(
        new_nodes, mode="drop")

    # distances new-uppers × all-uppers (K × ucap) — one matmul
    qv = state.vectors[jnp.maximum(new_nodes, 0)]
    qn = state.norms[jnp.maximum(new_nodes, 0)]
    all_rows = jnp.maximum(up_node, 0)
    D = dist.pairwise(
        qv if qv.dtype != jnp.int8 else qv,
        state.vectors[all_rows], metric,
        corpus_norms=state.norms[all_rows], query_norms=qn)      # [K, ucap]
    occupied = up_node >= 0
    self_mask = new_uidx[:, None] == jnp.arange(ucap)[None, :]
    D = jnp.where(occupied[None, :] & ~self_mask, D, jnp.inf)
    # rows created this call take the exact forward top-k; exclude them from
    # the reverse merge below (their forward rows already include each other)
    is_new = jnp.zeros((ucap,), bool).at[
        _oob(new_uidx, ucap)].set(True, mode="drop")
    new_lv = jnp.where(new_nodes >= 0, state.levels[jnp.maximum(new_nodes, 0)], -1)
    u_lv = jnp.where(occupied, state.levels[all_rows], -1)

    up_nbrs, up_dists = state.up_nbrs, state.up_dists

    for l in range(1, LMAX + 1):
        in_l_new = new_lv >= l                                   # [K]
        in_l_all = u_lv >= l                                     # [ucap]
        Dl = jnp.where(in_l_new[:, None] & in_l_all[None, :], D, jnp.inf)
        # forward: top-MU per new node at this level
        nd, np_ = jax.lax.top_k(-Dl, MU)
        f_i = jnp.where(jnp.isinf(-nd), -1, up_node[np_])
        tgt = _oob(jnp.where(in_l_new, new_uidx, -1), ucap)
        up_nbrs = up_nbrs.at[tgt, l - 1].set(f_i, mode="drop")
        up_dists = up_dists.at[tgt, l - 1].set(-nd, mode="drop")
        # reverse: merge new arrivals into existing rows via cached dists
        cols_d = jnp.where(in_l_new[:, None], Dl, jnp.inf).T      # [ucap, K]
        cols_i = jnp.where(
            (in_l_new & (new_nodes >= 0))[None, :], new_nodes[None, :], -1)
        cols_i = jnp.broadcast_to(cols_i, (ucap, K))
        row_d = jnp.concatenate([up_dists[:, l - 1], cols_d], axis=1)
        row_i = jnp.concatenate([up_nbrs[:, l - 1], cols_i], axis=1)
        td, tp = jax.lax.top_k(-row_d, MU)
        mi = jnp.take_along_axis(row_i, tp, 1)
        mi = jnp.where(jnp.isinf(-td), -1, mi)
        keep = in_l_all & occupied & ~is_new
        up_nbrs = up_nbrs.at[:, l - 1].set(
            jnp.where(keep[:, None], mi, up_nbrs[:, l - 1]))
        up_dists = up_dists.at[:, l - 1].set(
            jnp.where(keep[:, None], -td, up_dists[:, l - 1]))

    return state._replace(up_of=up_of, up_node=up_node,
                          up_nbrs=up_nbrs, up_dists=up_dists)


# ---------------------------------------------------------------------------
# refine: re-select rows with the diversity heuristic
# (reference optimizer.go:273-443 Refine / :644-684 RunTurboRefine)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("metric", "ef", "m_out"),
                   donate_argnums=(0,))
def refine_chunk(
    state: GraphState,
    rows: jax.Array,          # [C] int32 (-1 padded)
    *,
    metric: str,
    ef: int,
    m_out: int,
) -> GraphState:
    """Re-search each node and rewrite its level-0 row with heuristic-selected
    neighbors. Candidates = beam(ef) ∪ current neighbors ∪ 1-hop expansion."""
    C = rows.shape[0]
    M0 = state.nbrs.shape[1]
    safe = jnp.maximum(rows, 0)
    q = state.vectors[safe]
    qn = state.norms[safe]

    bd, bi = beam_search(state, q, qn, metric=metric, ef=ef,
                         exclude=rows, dual=True)
    cur = state.nbrs[safe]                                        # [C, M0]
    cur = jnp.where((rows[:, None] >= 0) & (cur != rows[:, None]), cur, -1)
    # drop deleted nodes from the candidate set (vacuum semantics,
    # optimizer.go:133-262: reconnect excluding dead ids)
    cur = jnp.where(state.deleted[jnp.maximum(cur, 0)], -1, cur)
    cd = dist.gathered(state.vectors, cur, q, metric,
                       corpus_norms=state.norms, query_norms=qn)
    # drop current nbrs already present in beam results
    dup = jnp.any(cur[:, :, None] == bi[:, None, :], axis=2)
    cd = jnp.where(dup, jnp.inf, cd)
    all_d = jnp.concatenate([bd, cd], axis=1)
    all_i = jnp.concatenate([bi, jnp.where(dup, -1, cur)], axis=1)
    td, tp = jax.lax.top_k(-all_d, all_d.shape[1])
    all_d, all_i = -td, jnp.take_along_axis(all_i, tp, 1)

    sel_i, _ = select_neighbors(state, all_d, all_i, m_out, metric)
    new_rows = jnp.full((C, M0), -1, jnp.int32)
    new_rows = new_rows.at[:, :m_out].set(sel_i)
    # keep rows with zero selected untouched (disconnected safety)
    any_sel = jnp.any(sel_i >= 0, axis=1)
    tgt = _oob(jnp.where(any_sel, rows, -1), state.nbrs.shape[0])
    nbrs = state.nbrs.at[tgt].set(new_rows, mode="drop")
    return state._replace(nbrs=nbrs)


# ---------------------------------------------------------------------------
# small state mutators
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, donate_argnums=(0,))
def write_vectors(state: GraphState, rows: jax.Array, vecs: jax.Array,
                  norms: jax.Array) -> GraphState:
    """Write encoded vectors into the arena before linking (Add phase 1,
    hnsw_index.go:563-635)."""
    tgt = _oob(rows, state.vectors.shape[0])
    return state._replace(
        vectors=state.vectors.at[tgt].set(vecs, mode="drop"),
        norms=state.norms.at[tgt].set(norms, mode="drop"),
        deleted=state.deleted.at[tgt].set(False, mode="drop"),
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def mark_deleted(state: GraphState, rows: jax.Array) -> GraphState:
    """Soft delete (hnsw_index.go:2292)."""
    tgt = _oob(rows, state.deleted.shape[0])
    return state._replace(deleted=state.deleted.at[tgt].set(True, mode="drop"))


@jax.jit
def rows_referencing_deleted(state: GraphState) -> jax.Array:
    """[cap] bool — live rows whose level-0 row points at a deleted node
    (vacuum's parent scan, optimizer.go:140-180)."""
    nb_del = state.deleted[jnp.maximum(state.nbrs, 0)] & (state.nbrs >= 0)
    return jnp.any(nb_del, axis=1) & (state.levels >= 0) & ~state.deleted


@functools.partial(jax.jit, donate_argnums=(0,))
def purge_rows(state: GraphState, rows: jax.Array,
               up_slots: jax.Array) -> GraphState:
    """Physically clear deleted rows after reconnection (vacuum end:
    zero arena bytes, nil slots, optimizer.go:226-262) and drop them from
    every upper-level KNN row."""
    cap = state.vectors.shape[0]
    tgt = _oob(rows, cap)
    dead = jnp.zeros((cap,), bool).at[tgt].set(True, mode="drop")
    # strip dead ids out of all neighbor rows
    nbrs = jnp.where(dead[jnp.maximum(state.nbrs, 0)] & (state.nbrs >= 0),
                     -1, state.nbrs)
    nbrs = nbrs.at[tgt].set(-1, mode="drop")
    dead_ref = dead[jnp.maximum(state.up_nbrs, 0)] & (state.up_nbrs >= 0)
    up_nbrs = jnp.where(dead_ref, -1, state.up_nbrs)
    up_dists = jnp.where(dead_ref, jnp.inf, state.up_dists)
    utgt = _oob(up_slots, state.up_node.shape[0])
    return state._replace(
        vectors=state.vectors.at[tgt].set(0, mode="drop"),
        norms=state.norms.at[tgt].set(0.0, mode="drop"),
        nbrs=nbrs,
        levels=state.levels.at[tgt].set(-1, mode="drop"),
        deleted=state.deleted.at[tgt].set(False, mode="drop"),
        up_of=state.up_of.at[tgt].set(-1, mode="drop"),
        up_node=state.up_node.at[utgt].set(-1, mode="drop"),
        up_nbrs=up_nbrs.at[utgt].set(-1, mode="drop"),
        up_dists=up_dists.at[utgt].set(jnp.inf, mode="drop"),
    )
