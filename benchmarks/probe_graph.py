"""Focused cfg1 graph-engine probe: build 10k x 128d, time the beam.

Usage: python /tmp/probe_graph.py <repo_path> [ef] [iters] [expand]
Prints per-rep ms and median qps. Mirrors bench.py _bench_one cfg1.
"""
import sys, time, statistics
import numpy as np

repo = sys.argv[1]
ef = int(sys.argv[2]) if len(sys.argv) > 2 else 256
iters = int(sys.argv[3]) if len(sys.argv) > 3 else 16
expand = int(sys.argv[4]) if len(sys.argv) > 4 else 16
sys.path.insert(0, repo)

import jax.numpy as jnp
from redis_hnsw_tpu import HNSWIndex, IndexConfig

n, dim, n_queries, k = 10_000, 128, 2048, 10
rng = np.random.default_rng(0)
data = rng.standard_normal((n, dim)).astype(np.float32)
queries = rng.standard_normal((n_queries, dim)).astype(np.float32)
names = [f"n{i}" for i in range(n)]

t0 = time.perf_counter()
idx = HNSWIndex("probe", IndexConfig(dim=dim, m=16, ef_construction=200,
                                     seed=7))
idx.add_batch(names, data, batch_size=2048)
print(f"build {time.perf_counter()-t0:.1f}s", flush=True)

q_dev = jnp.asarray(queries)
import inspect
kw = dict(ef_search=ef, expand=expand, iters=iters)
if "engine" in inspect.signature(idx.search_batch).parameters:
    kw["engine"] = "graph"
t0 = time.perf_counter()
res = idx.search_batch(q_dev, k, **kw)
print(f"first call {time.perf_counter()-t0:.1f}s", flush=True)

times = []
for r in range(10):
    t0 = time.perf_counter()
    idx.search_batch(q_dev, k, **kw)
    times.append((time.perf_counter() - t0) * 1e3)
med = statistics.median(times)
print("rep ms:", [round(t, 1) for t in times])
print(f"median {med:.1f} ms -> {n_queries/ (med/1e3):.0f} qps "
      f"(ef={ef} iters={iters} expand={expand}) repo={repo}")
