"""Follow-up: isolate kf cost, allow-mask cost, and batch-size scaling."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from profile_hybrid import fabricate, N, D
from kektordb_tpu.ops import distance as dist
from kektordb_tpu.ops import scan as scanlib


def t(label, f, B, reps=5):
    f(); f()
    t0 = time.time()
    out = None
    for _ in range(reps):
        out = f()
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{label:46s} {dt*1e3:9.2f} ms   ({B/dt:,.0f} q/s)", flush=True)


def main():
    idx, X = fabricate(N, D)
    st = idx.state
    rng = np.random.default_rng(1)

    for B in (256, 1024):
        Q = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
        qn = jnp.zeros((B,), jnp.float32)

        for kf in (32, 40, 64):
            t(f"B={B} raw scan kf={kf}",
              lambda kf=kf, Q=Q, qn=qn: jax.device_get(scanlib.scan_search(
                  st.vectors, st.norms, st.levels, st.deleted, None,
                  Q, qn, kf, metric=dist.L2, mode="approx")), B)

        mask = np.zeros(idx._cap, bool)
        mask[::100] = True
        dmask = jnp.asarray(mask)
        dmask.block_until_ready()
        t(f"B={B} raw scan kf=32 + DEVICE allow",
          lambda Q=Q, qn=qn: jax.device_get(scanlib.scan_search(
              st.vectors, st.norms, st.levels, st.deleted, dmask,
              Q, qn, 32, metric=dist.L2, mode="approx",
              has_allow=True)), B)


if __name__ == "__main__":
    main()
