"""Batched-serving tour: everything past reference parity in one file.

The reference (zhao-lang/redis_hnsw) serves one query at a time with a
hardwired ef = ef_construction (src/hnsw/core.rs:485). This framework's
serving surface is batch-first; this example walks the levers in the
order a production user meets them:

  1. bulk build (device-scored waves)
  2. engine routing: auto / scan / scan-approx / graph
  3. recall_target -- recall as a *guarantee*, not a knob
  4. columnar replies (no per-result object churn)
  5. pipelined multi-batch serving (hide the per-batch fetch latency)
  6. ids-only replies (for bandwidth-starved links; host exact rescore)
  7. checkpoint round-trip

Runs on whatever backend jax picks (CPU works; the engines are
backend-agnostic):

    python examples/serving.py
"""

import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import redis_hnsw_tpu as h  # noqa: E402


def main() -> None:
    rng = np.random.default_rng(7)
    dim, n, b, k = 64, 20_000, 256, 10
    data = rng.standard_normal((n, dim)).astype(np.float32)
    names = [f"doc{i}" for i in range(n)]
    queries = rng.standard_normal((b, dim)).astype(np.float32)

    c = h.HNSW()
    c.create_index("docs", dim=dim, m=16, ef_construction=128,
                   capacity=n)
    c.add_batch("docs", names, data)             # device-scored waves
    print(f"built {n} rows")

    # -- engine routing: "auto" picks the exact MXU scan at this size
    # (recall 1.0 by construction); "graph" forces the HNSW beam.
    exact = c.search_batch("docs", queries, k=k)
    beam = c.search_batch("docs", queries, k=k, engine="graph",
                          ef_search=128)
    agree = sum(
        len({r.name for r in exact[i]} & {r.name for r in beam[i]})
        for i in range(b)
    ) / (b * k)
    print(f"auto(=exact scan) vs graph beam overlap: {agree:.3f}")

    # -- recall_target is a guarantee: above the approx tier's measured
    # floor it pins an exact engine; at/below it rides the tier.
    guaranteed = c.search_batch("docs", queries, k=k, recall_target=1.0)
    fast = c.search_batch("docs", queries, k=k, recall_target=0.99)
    assert [r.name for r in guaranteed[0]] == [r.name for r in exact[0]]
    print(f"recall_target=0.99 answered {len(fast)} queries on the "
          f"approx tier")

    # -- columnar replies skip ~30ms of object building at B=2048
    col_names, col_sims = c.search_batch(
        "docs", queries, k=k, reply="columnar"
    )
    assert col_names.shape == col_sims.shape == (b, k)

    # -- pipelined serving: query sets larger than 2048 lanes split
    # into chunks served through a bounded in-flight window
    # (REDIS_HNSW_TPU_PIPELINE, default 2) -- each chunk's
    # device->host fetch round trip hides behind the next chunks'
    # compute (measured 1.3-1.5x at 1M rows on a latency-bound link;
    # artifacts/pipeline_ab.json). Nothing to opt into: pass the big
    # query set and drain one reply.
    big = rng.standard_normal((6144, dim)).astype(np.float32)
    big_names, big_sims = c.search_batch(
        "docs", big, k=k, reply="columnar"
    )
    assert big_names.shape == (6144, k)
    print("pipelined serving: 6144 queries in one call")

    # -- fetch windows: on links where EVERY device->host transfer
    # pays a fixed round trip, REDIS_HNSW_TPU_FETCH_WINDOW=W makes W
    # chunks' replies share ONE coalesced transfer (byte-identical
    # results; artifacts/fetch_window_ab.json for the measured curve).
    os.environ["REDIS_HNSW_TPU_FETCH_WINDOW"] = "3"
    try:
        w_names, w_sims = c.search_batch(
            "docs", big, k=k, reply="columnar"
        )
    finally:
        os.environ.pop("REDIS_HNSW_TPU_FETCH_WINDOW", None)
    assert (w_names == big_names).all() and (w_sims == big_sims).all()
    print("fetch window: coalesced replies identical")

    # -- ids-only replies: transfer the id block alone, rescore sims
    # host-side in exact direct form. For bandwidth-starved reply
    # links only: on this box's latency-bound tunnel it measured a
    # 0.58x LOSS (bytes saved ~2.3ms < host rescore ~9.3ms), so it
    # stays opt-in-off.
    os.environ["REDIS_HNSW_TPU_REPLY"] = "ids-force"
    try:
        ids_reply = c.search_batch("docs", queries, k=k)
    finally:
        os.environ.pop("REDIS_HNSW_TPU_REPLY", None)
    assert [r.name for r in ids_reply[0]] == [r.name for r in exact[0]]
    print("ids-only reply: identical names, host-exact sims")

    # -- durability
    c.save_index("docs", "/tmp/docs.npz")
    c.delete_index("docs")
    c.restore_index("/tmp/docs.npz")
    again = c.search_batch("docs", queries[:4], k=k)
    assert [r.name for r in again[0]] == [r.name for r in exact[0]]
    print("checkpoint round-trip: results identical")
    c.delete_index("docs")
    os.remove("/tmp/docs.npz")
    print("serving tour OK")


if __name__ == "__main__":
    main()
