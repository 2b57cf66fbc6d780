"""Process-boot half of the multi-host surface — import-order critical.

`jax_num_cpu_devices` / `jax_cpu_collectives_implementation` must be set
BEFORE the JAX backend initializes, and importing almost any kektordb_tpu
module traces a jit (which initializes the backend). This module imports
ONLY jax so launchers can do:

    from kektordb_tpu.distboot import init_distributed
    init_distributed("host0:1234", num_processes=4, process_id=rank)
    from kektordb_tpu.parallel import ReplicatedServing   # now safe

The CLI (`python -m kektordb_tpu serve --coordinator ...`) does exactly
this before touching the engine. See parallel/distributed.py for the
mesh/replication layer that runs after boot.
"""

from __future__ import annotations

from typing import Optional

import jax


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     *,
                     num_cpu_devices: Optional[int] = None,
                     cpu_collectives: str = "gloo") -> bool:
    """Join (or form) a multi-process JAX cluster.

    On TPU pods all three positional arguments may be None (cluster
    auto-detection). On a CPU cluster (tests, dev rigs) pass them
    explicitly and set `num_cpu_devices` so each process exposes a
    local shard axis; `cpu_collectives` selects the cross-process CPU
    collective backend (gloo). Returns True when a multi-process runtime
    is active. Idempotent — re-initialization reports the current state
    instead of raising.
    """
    if num_cpu_devices is not None:
        jax.config.update("jax_num_cpu_devices", int(num_cpu_devices))
        jax.config.update("jax_cpu_collectives_implementation",
                          cpu_collectives)
    try:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return jax.process_count() > 1
    except RuntimeError:
        # Benign ONLY when the runtime is already initialized (idempotent
        # callers: CLI retry, tests) — jax 0.9 raises "distributed.
        # initialize should only be called once" for that case, and
        # is_initialized() is the authoritative probe. A wrong coordinator
        # address or a connect timeout must propagate — silently degrading
        # a requested cluster join to single-process serving hides a
        # split brain.
        if jax.distributed.is_initialized():
            return jax.process_count() > 1
        raise
