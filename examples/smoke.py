"""End-to-end smoke drive, mirroring the reference's cmd.sh (cmd.sh:4-25):
create -> 100 adds -> get index -> get node -> search -> 100 deletes ->
drop. Runs on whatever backend jax picks (CPU works: the engines are
backend-agnostic).

    python examples/smoke.py
"""

import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import redis_hnsw_tpu as h  # noqa: E402


def main() -> None:
    c = h.HNSW()
    c.create_index("foo", dim=128, m=5)          # HNSW.NEW ... DIM 128 M 5

    for i in range(100):                         # HNSW.NODE.ADD x100
        c.add_node("foo", f"node{i}", np.full(128, float(i), np.float32))

    info = c.get_index("foo")                    # HNSW.GET
    assert info["node_count"] == 100 and info["m"] == 5
    print("index:", {k: info[k] for k in ("name", "node_count", "m")})

    node = c.get_node("foo", "node0")            # HNSW.NODE.GET
    print("node0 neighbors/layer:", [len(l) for l in node["neighbors"]])

    res = c.search("foo", np.full(128, 10.0, np.float32), k=5)
    print("search:", [(r.name, r.sim) for r in res])
    assert res[0].name == "node10" and res[0].sim == 0.0

    batch = c.search_batch(                       # TPU batched extension
        "foo", np.stack([np.full(128, float(v), np.float32) for v in (3, 42)]),
        k=3,
    )
    assert batch[0][0].name == "node3" and batch[1][0].name == "node42"

    for i in range(100):                         # HNSW.NODE.DEL x100
        c.delete_node("foo", f"node{i}")
    assert c.get_index("foo")["node_count"] == 0

    c.delete_index("foo")                        # HNSW.DEL
    print("smoke OK")


if __name__ == "__main__":
    main()
