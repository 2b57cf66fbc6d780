"""jax.profiler trace of one 1M beam call + top-op summary (dev tool)."""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from kektordb_tpu.index import HNSWIndex, HNSWConfig
from kektordb_tpu.index import hnsw_kernels as K
from kektordb_tpu.ops import distance as dist
from bench import make_sift_like

N, D, B = int(os.environ.get("TR_N", 1_000_000)), 128, 4096
X = make_sift_like(N + B, D)
base, Q = X[:N], X[N:]
idx = HNSWIndex(D, dist.L2, config=HNSWConfig(m=16, ef_construction=200, chunk=1024))
idx._grow_for(N)
t0 = time.time()
idx.add_batch([f"v{i}" for i in range(N)], base)
jax.block_until_ready(idx.state.nbrs)
print("build", round(time.time() - t0, 1), flush=True)
idx.compress_serving("bfloat16")

q, qn = idx._encode(Q[:B])
d, i = K.beam_search(idx.state, q, qn, metric="euclidean", ef=100, expand=8)
jax.block_until_ready(d)
t0 = time.time()
for _ in range(3):
    d, i = K.beam_search(idx.state, q, qn, metric="euclidean", ef=100,
                         expand=8)
jax.block_until_ready(d)
print(f"beam direct: {(time.time()-t0)/3*1000:.0f} ms", flush=True)

trace_dir = "/tmp/kektor_trace"
os.system(f"rm -rf {trace_dir}")
with jax.profiler.trace(trace_dir):
    d, i = K.beam_search(idx.state, q, qn, metric="euclidean", ef=100,
                         expand=8)
    jax.block_until_ready(d)

# summarize device op durations from the trace
files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
print("trace files:", files, flush=True)
for f in files:
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        dur = ev.get("dur", 0) / 1000.0   # ms
        tot[name] += dur
        cnt[name] += 1
    top = sorted(tot.items(), key=lambda kv: -kv[1])[:25]
    for name, ms in top:
        print(f"{ms:9.1f} ms  x{cnt[name]:5d}  {name[:90]}", flush=True)
