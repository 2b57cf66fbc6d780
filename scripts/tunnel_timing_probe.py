"""Does jax.block_until_ready actually block through the axon tunnel?

The round-3 revalidation measured an unphysical 84M QPS with the same
dispatch-loop + block_until_ready pattern bench.py uses (BENCH_r02's
209k QPS came from the identical code, so the semantics may have changed
with a plugin update). This probe times one large matmul chain three
ways:

  a) dispatch only                       (no sync at all)
  b) dispatch + jax.block_until_ready
  c) dispatch + 1-element host fetch     (device_get forces completion)

If (b) ~= (a) << (c), block_until_ready is a no-op on remote buffers and
every timed region must end with a forced tail fetch instead.

Run: timeout 600 python scripts/tunnel_timing_probe.py
"""

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    n = 4096
    a = jnp.asarray(np.random.default_rng(0).normal(
        size=(n, n)).astype(np.float32))

    @jax.jit
    def chain(x):
        for _ in range(8):
            x = x @ x * 1e-3
        return x

    o = chain(a)
    jax.block_until_ready(o)
    _ = np.asarray(o[..., :1][:1])          # warm the D2H path too
    out = {}

    t0 = time.time()
    o = chain(a)
    out["dispatch_only_ms"] = round((time.time() - t0) * 1e3, 1)

    t0 = time.time()
    jax.block_until_ready(o)
    out["block_after_dispatch_ms"] = round((time.time() - t0) * 1e3, 1)

    t0 = time.time()
    o2 = chain(o)
    jax.block_until_ready(o2)
    out["dispatch_plus_block_ms"] = round((time.time() - t0) * 1e3, 1)

    t0 = time.time()
    o3 = chain(o2)
    _ = np.asarray(o3[..., :1][:1])
    out["dispatch_plus_fetch_ms"] = round((time.time() - t0) * 1e3, 1)

    # 8 chained matmuls at 4096^3 * 2 flops each ~ 1.1 TFLOP; a v5e does
    # this in ~6 ms at peak — anything under ~3 ms means "did not wait"
    out["verdict_block_works"] = bool(
        out["dispatch_plus_block_ms"] > 0.5 * out["dispatch_plus_fetch_ms"])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
