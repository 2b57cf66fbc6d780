"""Device-side hybrid fusion epilogue.

Reference semantics: searchWithFusion's min-max normalize + weighted-sum
fusion over the union of the vector and BM25 candidate sets
(ops.go:1071-1097, search_utils.go:48-72). The host path
(engine._assemble_fused) implements the same math in numpy; this module
chains it onto the scan's DEVICE arrays instead, so a hybrid search costs
exactly one device round trip (scan → fuse → top-k → single device_get)
— through a serving tunnel with ~30 ms block latency the extra host pass
was the difference between 4.3k and >20k QPS at B=1024.

Shapes are static per compile: B and F come from the scan program the
engine already runs, T is the text-candidate pad (power of two ≥ 64,
capped by the engine's TEXT_CAND_CAP); alpha and the int8-L2 distance
rescale are traced scalars so sweeping them never recompiles.
"""

from __future__ import annotations

import functools
import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

# rows-sentinel for text-candidate padding: larger than any row index, so
# the padded tail stays sorted for searchsorted and never matches a real
# scan row
_PAD_ROW = np.iinfo(np.int32).max


class DecayDevice(NamedTuple):
    """Device-resident per-row decay spec (the columnar mirror of
    search_utils.go:91-141 semantics, layer config pre-resolved on host).

    The three channels (ref timestamp, 1/half_life, model id) are PACKED
    into one [cap, 4] f32 array: the kernel reads the spec for [B, F+T]
    candidate rows, and TPU gathers are row-rate-bound — one 4-wide
    gather costs ~a third of three 1-wide gathers (measured: the decay
    serving windows were gather-dominated at B=4096).

    Timestamps are stored RELATIVE to `epoch` so f32 keeps ~ms precision:
    absolute unix seconds (~1.8e9) only carry ~2-minute f32 resolution,
    which would wreck short-half-life decay. The engine refreshes the
    mirror when `now - epoch` grows past a few hours (and on any decay
    mutation via DecayColumns.version).
    """
    epoch: float
    packed: jax.Array   # [cap, 4] f32: ref_rel | invhl | model | pad
    #                     (ref_rel 0 + invhl 0 where inactive)


def _layer_tables(cols, cfg):
    """(half_life, model_id) lookup tables indexed by layer id; the last
    slot holds the index-level defaults (layer -1 / unknown)."""
    from ..engine.fusion import _MODEL_IDS

    n_layers = len(cols.layer_names)
    hl_by_layer = np.full(n_layers + 1, cfg.decay_half_life)
    model_by_layer = np.full(n_layers + 1,
                             _MODEL_IDS.get(cfg.decay_model, 0), np.int8)
    for i, name in enumerate(cols.layer_names):
        lc = cfg.layers.get(name)
        if lc is None:
            continue
        if lc.decay_half_life > 0:
            hl_by_layer[i] = lc.decay_half_life
        if lc.decay_model:
            model_by_layer[i] = _MODEL_IDS.get(lc.decay_model, 0)
    return hl_by_layer, model_by_layer


def _pack_rows(cols, cfg, rows: np.ndarray, epoch: float) -> np.ndarray:
    """[len(rows), 4] packed spec rows (ref_rel | invhl | model | pad) —
    the per-row semantics of the mirror for arbitrary row indices.
    Inactive rows (pinned / no timestamp / half_life<=0 / beyond the
    column cap) get invhl=0, which yields factor 1.0 under every model."""
    r = np.asarray(rows, np.int64)
    if cols.cap == 0:                     # no memory metadata anywhere
        packed = np.zeros((r.size, 4), np.float32)
        packed[:, 2] = _layer_tables(cols, cfg)[1][-1]   # default model
        return packed
    inb = r < cols.cap
    safe = np.where(inb, r, 0)
    ref64 = np.where(inb & np.isnan(cols.accessed[safe]),
                     cols.created[safe], cols.accessed[safe])
    ref64 = np.where(inb, ref64, np.nan)
    active = ~np.isnan(ref64)
    active &= ~(inb & cols.pinned[safe])

    hl_by_layer, model_by_layer = _layer_tables(cols, cfg)
    n_layers = len(cols.layer_names)
    lid = np.where(inb & (cols.layer[safe] >= 0),
                   cols.layer[safe], n_layers).astype(np.int64)
    hl = hl_by_layer[lid]
    model = model_by_layer[lid]
    active &= hl > 0

    count = np.where(inb, cols.count[safe].astype(np.float64), 0.0)
    s = np.where(model == 3,
                 hl * (1.0 + np.log1p(np.maximum(count, 0.0))),
                 hl)
    invhl = np.where(active & (s > 0), 1.0 / np.where(s > 0, s, 1.0), 0.0)
    ref_rel = np.where(active, ref64 - epoch, 0.0)
    packed = np.zeros((r.size, 4), np.float32)
    packed[:, 0] = ref_rel
    packed[:, 1] = invhl
    packed[:, 2] = model
    return packed


def build_decay_device(cols, cfg, cap: int) -> DecayDevice:
    """Reduce DecayColumns + MemoryConfig to the packed device mirror.
    One vectorized host pass + one H2D upload, version-keyed by the
    engine — amortized across every decayed search until the next decay
    mutation (which updates incrementally via update_decay_device)."""
    epoch = time.time()
    packed = _pack_rows(cols, cfg, np.arange(cap, dtype=np.int64), epoch)
    return DecayDevice(epoch=epoch, packed=jnp.asarray(packed))


def update_decay_device(dd: DecayDevice, cols, cfg,
                        rows) -> DecayDevice:
    """Incremental mirror refresh: recompute the spec for `rows` only and
    scatter into the device array — a tiny H2D + one scatter dispatch
    instead of an O(cap) host pass + full re-upload. This is what keeps
    the agent-memory reinforce-on-read pattern cheap: every reinforce
    dirties exactly one row (metadata.DecayColumns.dirty), not the
    mirror. New rows use the MIRROR's epoch so ref_rel stays in one
    time base."""
    r = np.unique(np.asarray(list(rows), np.int64))
    cap = dd.packed.shape[0]
    r = r[(r >= 0) & (r < cap)]
    if r.size == 0:
        return dd
    sub = _pack_rows(cols, cfg, r, dd.epoch)
    return DecayDevice(
        epoch=dd.epoch,
        packed=dd.packed.at[jnp.asarray(r)].set(jnp.asarray(sub)))


@functools.partial(jax.jit, static_argnames=("k",))
def _fuse_topk(d, rows, tr, tsn, alpha, scale, k, decay=None, now_rel=None):
    """d [B,F] f32 distances (inf-masked), rows [B,F] i32 (-1 pads),
    tr [T] i32 ascending text-candidate rows (_PAD_ROW pads),
    tsn [T] f32 normalized text scores (0 at pads).
    decay: optional (ref, invhl, model) [cap] arrays (DecayDevice fields)
    + now_rel (f32 seconds rel. the mirror epoch) — applies the per-row
    time-decay multiplier on device (ops.go:1100-1186 semantics), so
    memory-enabled indexes keep the one-round-trip epilogue.
    Returns (fused scores [B,k] desc, rows [B,k] i32, distances [B,k])."""
    B, F = d.shape
    T = tr.shape[0]
    valid = rows >= 0
    # min-max normalize the vector branch per query (invert: lower
    # distance → higher similarity), exactly the host-path math
    lo = jnp.min(jnp.where(valid, d, jnp.inf), axis=1, keepdims=True)
    hi = jnp.max(jnp.where(valid, d, -jnp.inf), axis=1, keepdims=True)
    any_valid = valid.any(axis=1, keepdims=True)
    lo = jnp.where(any_valid, lo, 0.0)
    hi = jnp.where(any_valid, hi, 0.0)
    span = hi - lo
    ok = span > 0
    vec_sim = jnp.where(ok, (hi - d) / jnp.where(ok, span, 1.0), 1.0)

    # text score of each vector candidate: sorted lookup into tr
    pos = jnp.clip(jnp.searchsorted(tr, rows), 0, T - 1)
    tmatch = valid & (tr[pos] == rows)
    text_of_vec = jnp.where(tmatch, tsn[pos], 0.0)
    # text-only candidates already present in the query's vector set are
    # duplicates: mark via scatter-max on the matched positions (O(B*F))
    dup = jnp.zeros((B, T), bool).at[
        jnp.arange(B)[:, None], pos].max(tmatch)
    live_t = tr < _PAD_ROW

    vec_all = jnp.concatenate(
        [jnp.where(valid, vec_sim, 0.0), jnp.zeros((B, T))], axis=1)
    text_all = jnp.concatenate(
        [text_of_vec, jnp.broadcast_to(tsn, (B, T))], axis=1)
    fused = alpha * vec_all + (1.0 - alpha) * text_all
    keep = jnp.concatenate([valid, (~dup) & live_t[None, :]], axis=1)
    fused = jnp.where(keep, fused, -jnp.inf)

    R_all = jnp.concatenate(
        [rows, jnp.broadcast_to(tr, (B, T))], axis=1)
    if decay is not None:
        cap = decay.shape[0]
        safe = jnp.clip(R_all, 0, cap - 1)   # pads masked -inf already
        spec = decay[safe]                   # ONE row-gather: [B, C, 4]
        x = jnp.maximum(now_rel - spec[..., 0], 0.0) * spec[..., 1]
        m = spec[..., 2]
        # 0.5**(age/hl) = exp2(-x); inactive rows have invhl=0 → x=0 →
        # factor 1 under every model
        factor = jnp.select(
            [m == 1.0, m == 2.0, m == 3.0],
            [jnp.maximum(0.0, 1.0 - 0.5 * x),
             jnp.where(x < 1.0, 1.0, 0.5),
             jnp.exp(-x)],
            jnp.exp2(-x))
        fused = jnp.where(jnp.isfinite(fused), fused * factor, fused)
    d_all = jnp.concatenate(
        [jnp.where(valid, d, jnp.inf), jnp.full((B, T), jnp.inf)], axis=1)
    kk = min(k, F + T)
    top_sc, top_i = jax.lax.top_k(fused, kk)
    top_rows = jnp.take_along_axis(R_all, top_i, axis=1).astype(jnp.int32)
    top_d = jnp.take_along_axis(d_all, top_i, axis=1) * scale
    return top_sc, top_rows, top_d


def prepare_text(text_rows: np.ndarray, text_vals: np.ndarray,
                 cap_t: int) -> tuple[np.ndarray, np.ndarray]:
    """Host prep: keep the top cap_t text candidates, min-max normalize
    their scores (search_utils.go:48-55), sort by row, pad to a power of
    two so every (B, F, T) triple reuses one compiled program."""
    if text_rows.size == 0:
        # vector-only call routed through the fused epilogue (decay-on
        # path): an all-pad text block contributes nothing
        return (np.full(64, _PAD_ROW, np.int32), np.zeros(64, np.float32))
    if text_rows.size > cap_t:
        sel = np.argpartition(text_vals, text_vals.size - cap_t)[-cap_t:]
        tr, ts = text_rows[sel], text_vals[sel]
    else:
        tr, ts = text_rows, text_vals
    t_lo, t_hi = ts.min(), ts.max()
    tsn = np.ones_like(ts) if t_hi <= t_lo else (ts - t_lo) / (t_hi - t_lo)
    order = np.argsort(tr, kind="stable")
    tr, tsn = tr[order], tsn[order]
    T = 64
    while T < tr.size:
        T *= 2
    pad = T - tr.size
    if pad:
        tr = np.concatenate([tr, np.full(pad, _PAD_ROW, np.int64)])
        tsn = np.concatenate([tsn, np.zeros(pad)])
    return tr.astype(np.int32), tsn.astype(np.float32)


def fused_topk(d_dev, rows_dev, text_rows: np.ndarray,
               text_vals: np.ndarray, alpha: float, k: int,
               scale: float, cap_t: int,
               decay_dev: Optional[DecayDevice] = None,
               now: Optional[float] = None
               ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full hybrid epilogue: text prep on host (the BM25 candidate list is
    shared by the whole batch — a few hundred rows), fusion + top-k on
    device chained onto the scan outputs, one blocking fetch. With
    decay_dev, the time-decay multiplier applies on device too."""
    tr, tsn = prepare_text(text_rows, text_vals, cap_t)
    dec = now_rel = None
    if decay_dev is not None:
        dec = decay_dev.packed
        now_rel = jnp.float32((now if now is not None else time.time())
                              - decay_dev.epoch)
    sc, rw, dd = _fuse_topk(d_dev, rows_dev.astype(jnp.int32),
                            jnp.asarray(tr), jnp.asarray(tsn),
                            jnp.float32(alpha), jnp.float32(scale), k,
                            decay=dec, now_rel=now_rel)
    return jax.device_get((sc, rw, dd))
