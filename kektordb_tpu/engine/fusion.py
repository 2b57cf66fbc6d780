"""Hybrid score fusion + memory time-decay.

Reference: searchWithFusion (pkg/engine/ops.go:896-1208) — min-max normalize
vector and BM25 scores (search_utils.go:48-72), weighted-sum fusion
alpha*vec + (1-alpha)*text (ops.go:1086-1097), then per-node time decay
(exponential / linear / step / Ebbinghaus, search_utils.go:91-141) with
`_pinned` exemption and per-layer half-lives (ops.go:1100-1186).
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field
from typing import Any, Optional

PINNED_KEY = "_pinned"
CREATED_KEY = "_created_at"
ACCESSED_KEY = "_last_accessed"
ACCESS_COUNT_KEY = "_access_count"
LAYER_KEY = "_memory_layer"


@dataclass
class LayerConfig:
    """Per-memory-layer overrides (hnsw/config.go:177-230)."""
    decay_half_life: float = 0.0        # seconds; 0 → inherit
    pinned_by_default: bool = False
    decay_model: str = ""


@dataclass
class MemoryConfig:
    """Decay configuration (hnsw/config.go:147-230)."""
    enabled: bool = False
    decay_half_life: float = 30 * 24 * 3600.0   # 30 days
    decay_model: str = "exponential"            # |linear|step|ebbinghaus
    layers: dict[str, LayerConfig] = field(default_factory=dict)


def minmax_normalize(scores: dict[int, float], invert: bool = False
                     ) -> dict[int, float]:
    """Map to [0, 1]; invert=True for distances (lower is better)
    (search_utils.go:48-72)."""
    if not scores:
        return {}
    lo, hi = min(scores.values()), max(scores.values())
    span = hi - lo
    if span <= 0:
        return {k: 1.0 for k in scores}
    if invert:
        return {k: (hi - v) / span for k, v in scores.items()}
    return {k: (v - lo) / span for k, v in scores.items()}


def fuse(vec_scores: dict[int, float], text_scores: dict[int, float],
         alpha: float) -> dict[int, float]:
    """alpha*vec + (1-alpha)*text over the union (ops.go:1086-1097).
    vec_scores must already be similarities in [0,1]."""
    out: dict[int, float] = {}
    for k in set(vec_scores) | set(text_scores):
        out[k] = alpha * vec_scores.get(k, 0.0) \
            + (1.0 - alpha) * text_scores.get(k, 0.0)
    return out


def decay_factor(meta: Optional[dict[str, Any]], cfg: MemoryConfig,
                 now: Optional[float] = None) -> float:
    """Retention multiplier in (0, 1] for one node (search_utils.go:91-141).

    Models:
      exponential  0.5 ** (age / half_life)
      linear       max(0, 1 - age / (2 * half_life))
      step         1.0 while age < half_life, 0.5 afterwards
      ebbinghaus   exp(-age / S), S = half_life * (1 + ln(1 + access_count))
    `_pinned` nodes never decay; `_last_accessed` refreshes the clock.
    """
    if not cfg.enabled or meta is None:
        return 1.0
    if _truthy(meta.get(PINNED_KEY)):
        return 1.0
    ref = meta.get(ACCESSED_KEY) or meta.get(CREATED_KEY)
    ts = _parse_ts(ref)
    if ts is None:
        return 1.0
    now = now if now is not None else time.time()
    age = max(now - ts, 0.0)

    half_life = cfg.decay_half_life
    model = cfg.decay_model
    layer = meta.get(LAYER_KEY)
    if layer and layer in cfg.layers:
        lc = cfg.layers[layer]
        if lc.decay_half_life > 0:
            half_life = lc.decay_half_life
        if lc.decay_model:
            model = lc.decay_model
    if half_life <= 0:
        return 1.0

    if model == "linear":
        return max(0.0, 1.0 - age / (2.0 * half_life))
    if model == "step":
        return 1.0 if age < half_life else 0.5
    if model == "ebbinghaus":
        count = float(meta.get(ACCESS_COUNT_KEY) or 0.0)
        s = half_life * (1.0 + math.log1p(count))
        return math.exp(-age / s)
    return 0.5 ** (age / half_life)


def _truthy(v: Any) -> bool:
    if isinstance(v, str):
        return v.lower() in ("true", "1", "yes")
    return bool(v)


def _parse_ts(v: Any) -> Optional[float]:
    if v is None:
        return None
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, str):
        try:
            return float(v)
        except ValueError:
            pass
        try:
            import datetime as dt
            return dt.datetime.fromisoformat(v.replace("Z", "+00:00")).timestamp()
        except ValueError:
            return None
    return None
