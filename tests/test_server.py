"""RESP wire-protocol server: the reference's cmd.sh flow over a socket.

Exercises the exact client syntax from /root/reference/cmd.sh against the
shim (redis-cli compatible grammar and reply shapes).
"""

import socket

import pytest

from redis_hnsw_tpu.server import HNSWServer


class RespClient:
    def __init__(self, port: int) -> None:
        self.sock = socket.create_connection(("127.0.0.1", port))
        self.f = self.sock.makefile("rb")

    def cmd(self, *parts: str):
        out = [f"*{len(parts)}\r\n".encode()]
        for p in parts:
            b = str(p).encode()
            out.append(b"$%d\r\n%s\r\n" % (len(b), b))
        self.sock.sendall(b"".join(out))
        return self._read()

    def _read(self):
        line = self.f.readline().rstrip(b"\r\n")
        t, body = line[:1], line[1:]
        if t == b"+":
            return body.decode()
        if t == b"-":
            raise RuntimeError(body.decode())
        if t == b":":
            return int(body)
        if t == b"$":
            n = int(body)
            if n < 0:
                return None
            data = self.f.read(n + 2)[:n]
            return data.decode()
        if t == b"*":
            return [self._read() for _ in range(int(body))]
        raise AssertionError(line)

    def close(self):
        self.sock.close()


@pytest.fixture(scope="module")
def server():
    srv = HNSWServer(port=0)  # ephemeral port
    srv.serve_background()
    yield srv.server_address[1]
    srv.shutdown()


def test_cmd_sh_flow_over_wire(server):
    c = RespClient(server)
    assert c.cmd("PING") == "PONG"

    dim = 16
    assert c.cmd("HNSW.NEW", "test1", "DIM", str(dim), "M", "5") == "OK"
    for i in range(1, 31):
        vec = [str(float(i))] * dim
        assert (
            c.cmd(
                "HNSW.NODE.ADD", "test1", f"node{i}",
                "DATA", str(dim), *vec,
            )
            == "OK"
        )

    info = c.cmd("HNSW.GET", "test1")
    d = dict(zip(info[::2], info[1::2]))
    assert d["name"] == "test1"
    assert int(d["node_count"]) == 30
    assert int(d["m"]) == 5

    node = c.cmd("HNSW.NODE.GET", "test1", "node1")
    nd = dict(zip(node[::2], node[1::2]))
    assert len(nd["data"]) == dim
    assert float(nd["data"][0]) == 1.0
    assert isinstance(nd["neighbors"], list)

    res = c.cmd(
        "HNSW.SEARCH", "test1", "K", "3",
        "QUERY", str(dim), *["2.0"] * dim,
    )
    assert res[0] == 3  # count
    first = dict(zip(res[1][::2], res[1][1::2]))
    assert first["name"] == "node2"
    assert float(first["similarity"]) == 0.0

    # error parity
    with pytest.raises(RuntimeError, match="already exists"):
        c.cmd("HNSW.NEW", "test1", "DIM", str(dim))
    with pytest.raises(RuntimeError, match="does not exist"):
        c.cmd("HNSW.NODE.GET", "test1", "nope")

    for i in range(1, 31):
        assert c.cmd("HNSW.NODE.DEL", "test1", f"node{i}") == 1
    assert c.cmd("HNSW.DEL", "test1") == 1
    with pytest.raises(RuntimeError, match="does not exist"):
        c.cmd("HNSW.GET", "test1")
    assert c.cmd("QUIT") == "OK"
    c.close()


def test_save_restore_over_wire(server, tmp_path):
    """Wire-level durability (VERDICT r1 item 10): SAVE over the wire,
    "restart" (a fresh server with an empty registry), RESTORE, search.
    The reference leans on Redis RDB for this (src/types.rs:157-284)."""
    c = RespClient(server)
    dim = 8
    assert c.cmd("HNSW.NEW", "dur", "DIM", str(dim), "M", "5") == "OK"
    for i in range(1, 21):
        vec = [str(float(i))] * dim
        assert (
            c.cmd("HNSW.NODE.ADD", "dur", f"node{i}", "DATA", str(dim), *vec)
            == "OK"
        )
    path = str(tmp_path / "dur.npz")
    assert c.cmd("HNSW.SAVE", "dur", "PATH", path) == "OK"
    c.close()

    # restart: a brand-new server process state
    srv2 = HNSWServer(port=0)
    srv2.serve_background()
    try:
        c2 = RespClient(srv2.server_address[1])
        with pytest.raises(RuntimeError, match="does not exist"):
            c2.cmd("HNSW.GET", "dur")
        assert c2.cmd("HNSW.RESTORE", "dur", "PATH", path) == "OK"
        info = dict(
            (lambda it: zip(it[::2], it[1::2]))(c2.cmd("HNSW.GET", "dur"))
        )
        assert int(info["node_count"]) == 20
        res = c2.cmd(
            "HNSW.SEARCH", "dur", "K", "3", "QUERY", str(dim),
            *["2.0"] * dim,
        )
        assert res[0] == 3
        first = dict(zip(res[1][::2], res[1][1::2]))
        assert first["name"] == "node2"
        assert float(first["similarity"]) == 0.0
        c2.close()
    finally:
        srv2.shutdown()


def test_hamming_over_wire(server):
    """METRIC kwarg on HNSW.NEW + uint32-word DATA/QUERY grammar (the
    reference declares hamming 'forthcoming' and has no wire surface for
    it, Readme.md:8)."""
    c = RespClient(server)
    # 64-bit hamming index: DATA is 2 uint32 words
    assert (
        c.cmd("HNSW.NEW", "ham", "DIM", "64", "M", "5", "METRIC", "hamming")
        == "OK"
    )
    info = dict(
        (lambda it: zip(it[::2], it[1::2]))(c.cmd("HNSW.GET", "ham"))
    )
    assert info["metric"] == "Hamming"
    assert int(info["data_dim"]) == 64
    words = {
        "a": (0, 0),
        "b": (0xFFFFFFFF, 0xFFFFFFFF),
        "c": (0xFF, 0),
        "d": (0, 0b1),
    }
    for nm, (w0, w1) in words.items():
        assert (
            c.cmd("HNSW.NODE.ADD", "ham", nm, "DATA", "2", str(w0), str(w1))
            == "OK"
        )
    # hex grammar accepted too
    assert c.cmd("HNSW.NODE.ADD", "ham", "e", "DATA", "2", "0xF0", "0x0") == "OK"
    res = c.cmd("HNSW.SEARCH", "ham", "K", "3", "QUERY", "2", "0", "0")
    assert res[0] == 3
    first = dict(zip(res[1][::2], res[1][1::2]))
    assert first["name"] == "a"
    assert float(first["similarity"]) == 0.0
    second = dict(zip(res[2][::2], res[2][1::2]))
    assert second["name"] == "d"  # 1 bit away
    assert float(second["similarity"]) == -1.0
    # NODE.GET returns packed integer words for hamming
    node = c.cmd("HNSW.NODE.GET", "ham", "b")
    nd = dict(zip(node[::2], node[1::2]))
    assert [int(x) for x in nd["data"]] == [0xFFFFFFFF, 0xFFFFFFFF]
    assert c.cmd("HNSW.DEL", "ham") == 1
    c.close()


def test_wire_error_replies(server):
    """Every command's error path over RESP carries the reference-format
    message (errors.py; src/lib.rs:146-149, :242, core.rs:389-391)."""
    c = RespClient(server)
    dim = 8
    assert c.cmd("HNSW.NEW", "err1", "DIM", str(dim)) == "OK"
    assert (
        c.cmd("HNSW.NODE.ADD", "err1", "n1", "DATA", str(dim), *["1"] * dim)
        == "OK"
    )

    # reference-format error strings (errors.py)
    with pytest.raises(RuntimeError, match="Index: err1 already exists"):
        c.cmd("HNSW.NEW", "err1", "DIM", str(dim))
    with pytest.raises(RuntimeError, match="Index: ghost does not exist"):
        c.cmd("HNSW.SEARCH", "ghost", "QUERY", str(dim), *["0"] * dim)
    with pytest.raises(RuntimeError, match="Index: ghost does not exist"):
        c.cmd("HNSW.NODE.ADD", "ghost", "n", "DATA", str(dim), *["0"] * dim)
    with pytest.raises(RuntimeError, match="Index: ghost does not exist"):
        c.cmd("HNSW.DEL", "ghost")
    with pytest.raises(RuntimeError, match="already exists"):
        c.cmd("HNSW.NODE.ADD", "err1", "n1", "DATA", str(dim), *["2"] * dim)
    with pytest.raises(RuntimeError, match="does not exist"):
        c.cmd("HNSW.NODE.DEL", "err1", "ghost")
    # dimension mismatch, reference format (core.rs:389-391)
    with pytest.raises(
        RuntimeError, match="data dimension: 4 does not match Index"
    ):
        c.cmd("HNSW.NODE.ADD", "err1", "n2", "DATA", "4", "1", "2", "3", "4")
    with pytest.raises(
        RuntimeError, match="data dimension: 4 does not match Index"
    ):
        c.cmd("HNSW.SEARCH", "err1", "QUERY", "4", "1", "2", "3", "4")

    # malformed grammar
    with pytest.raises(RuntimeError, match="dimensionality mismatch"):
        c.cmd("HNSW.NODE.ADD", "err1", "n2", "DATA", str(dim), "1", "2")
    with pytest.raises(RuntimeError, match="missing value for argument"):
        c.cmd("HNSW.NEW", "err2", "DIM")
    with pytest.raises(RuntimeError, match="missing required argument"):
        c.cmd("HNSW.NEW", "err2", "M", "5")
    with pytest.raises(RuntimeError, match="missing required argument"):
        c.cmd("HNSW.NODE.ADD", "err1", "n2")
    with pytest.raises(RuntimeError, match="missing required argument"):
        c.cmd("HNSW.SEARCH", "err1", "K", "3")
    with pytest.raises(RuntimeError, match="missing index name"):
        c.cmd("HNSW.NEW")
    with pytest.raises(RuntimeError, match="invalid vector value"):
        c.cmd("HNSW.NODE.ADD", "err1", "n2", "DATA", str(dim), *["x"] * dim)
    with pytest.raises(RuntimeError, match="missing or invalid count"):
        c.cmd("HNSW.NODE.ADD", "err1", "n2", "DATA", "many", "1")
    with pytest.raises(RuntimeError, match="unknown command"):
        c.cmd("HNSW.FROB", "err1")
    # the error reply must not poison the connection
    assert c.cmd("PING") == "PONG"
    assert c.cmd("HNSW.DEL", "err1") == 1
    c.close()


def test_flat_kind_over_wire(server):
    """KIND kwarg routes to the flat exact index over the wire."""
    c = RespClient(server)
    assert c.cmd("HNSW.NEW", "fw", "DIM", "4", "KIND", "flat") == "OK"
    for i in range(3):
        v = [str(float(i))] * 4
        assert c.cmd("HNSW.NODE.ADD", "fw", f"n{i}", "DATA", "4", *v) == "OK"
    # k > node_count: exactly node_count results (regression companion
    # to test_core.test_flat_k_exceeds_node_count, over the wire)
    res = c.cmd("HNSW.SEARCH", "fw", "K", "10", "QUERY", "4", *["0.0"] * 4)
    assert res[0] == 3
    first = dict(zip(res[1][::2], res[1][1::2]))
    assert first["name"] == "n0"
    # HNSW.GET keeps the reference's full 9-field reply shape on
    # kind=flat (types.rs:122-155): graph-only fields are RESP nulls,
    # not absent keys.
    raw = c.cmd("HNSW.GET", "fw")
    info = dict(zip(raw[::2], raw[1::2]))
    assert list(info) == [
        "name", "metric", "data_dim", "m", "ef_construction",
        "level_mult", "node_count", "max_layer", "enterpoint",
    ]
    assert info["name"] == "fw"
    assert info["metric"] == "Euclidean"
    assert int(info["data_dim"]) == 4
    assert int(info["node_count"]) == 3
    for graph_only in ("m", "ef_construction", "level_mult",
                       "max_layer", "enterpoint"):
        assert info[graph_only] is None, graph_only
    assert c.cmd("HNSW.DEL", "fw") == 1
    c.close()


def test_sharded_kind_over_wire(server):
    """KIND sharded routes to the mesh-sharded index over RESP."""
    c = RespClient(server)
    assert (
        c.cmd("HNSW.NEW", "sw", "DIM", "8", "M", "4", "KIND", "sharded")
        == "OK"
    )
    for i in range(12):
        v = [str(float(i))] * 8
        assert c.cmd("HNSW.NODE.ADD", "sw", f"n{i}", "DATA", "8", *v) == "OK"
    res = c.cmd("HNSW.SEARCH", "sw", "K", "2", "QUERY", "8", *["3.0"] * 8)
    assert res[0] == 2
    first = dict(zip(res[1][::2], res[1][1::2]))
    assert first["name"] == "n3"
    info = dict(
        (lambda it: zip(it[::2], it[1::2]))(c.cmd("HNSW.GET", "sw"))
    )
    assert int(info["node_count"]) == 12
    assert c.cmd("HNSW.DEL", "sw") == 1
    c.close()


def test_engine_kwarg_over_wire(server):
    """ENGINE on HNSW.SEARCH routes through the batched device engines
    (scan / scan-approx / graph / auto); results match the parity path
    on exact engines, and a bad engine is a clean -ERR reply."""
    c = RespClient(server)
    dim = 8
    assert c.cmd("HNSW.NEW", "ew", "DIM", str(dim), "M", "5") == "OK"
    for i in range(20):
        v = [str(float(i))] * dim
        assert c.cmd("HNSW.NODE.ADD", "ew", f"n{i}", "DATA",
                     str(dim), *v) == "OK"
    q = ["7.2"] * dim
    base = c.cmd("HNSW.SEARCH", "ew", "K", "3", "QUERY", str(dim), *q)
    for engine in ("auto", "scan", "scan-approx", "graph"):
        res = c.cmd("HNSW.SEARCH", "ew", "K", "3", "QUERY", str(dim),
                    *q, "ENGINE", engine)
        assert res[0] == 3
        first = dict(zip(res[1][::2], res[1][1::2]))
        assert first["name"] == "n7"
        if engine in ("auto", "scan"):
            # exact engines reproduce the parity results: same names,
            # sims equal to f32 rounding (summation order differs
            # between the host loop and the device rescore)
            for got, want in zip(res[1:], base[1:]):
                g, w = dict(zip(got[::2], got[1::2])), dict(
                    zip(want[::2], want[1::2])
                )
                assert g["name"] == w["name"]
                assert abs(
                    float(g["similarity"]) - float(w["similarity"])
                ) <= 1e-6 * (1 + abs(float(w["similarity"])))
    with pytest.raises(RuntimeError, match="unknown search engine"):
        c.cmd("HNSW.SEARCH", "ew", "K", "3", "QUERY", str(dim), *q,
              "ENGINE", "warp")
    assert c.cmd("HNSW.DEL", "ew") == 1
    c.close()


def test_seeds_kwarg_over_wire(server):
    """SEEDS on HNSW.SEARCH (with ENGINE graph) seeds the beam with
    pivot entrypoints; the reply shape is unchanged and the self-query
    still ranks first."""
    c = RespClient(server)
    dim = 8
    assert c.cmd("HNSW.NEW", "sw", "DIM", str(dim), "M", "5") == "OK"
    for i in range(30):
        v = [str(float(i))] * dim
        assert c.cmd("HNSW.NODE.ADD", "sw", f"n{i}", "DATA",
                     str(dim), *v) == "OK"
    q = ["12.0"] * dim
    res = c.cmd("HNSW.SEARCH", "sw", "K", "3", "QUERY", str(dim), *q,
                "ENGINE", "graph", "SEEDS", "4")
    assert res[0] == 3
    first = dict(zip(res[1][::2], res[1][1::2]))
    assert first["name"] == "n12"
    assert c.cmd("HNSW.DEL", "sw") == 1
    c.close()


def test_recall_target_kwarg_over_wire(server):
    """RECALL_TARGET on HNSW.SEARCH routes through the guarantee rule
    (no ENGINE needed); graph + target is a clean -ERR reply."""
    c = RespClient(server)
    dim = 8
    assert c.cmd("HNSW.NEW", "rt", "DIM", str(dim), "M", "5") == "OK"
    for i in range(20):
        v = [str(float(i))] * dim
        assert c.cmd("HNSW.NODE.ADD", "rt", f"n{i}", "DATA",
                     str(dim), *v) == "OK"
    q = ["7.2"] * dim
    for target in ("1.0", "0.95"):
        res = c.cmd("HNSW.SEARCH", "rt", "K", "3", "QUERY", str(dim),
                    *q, "RECALL_TARGET", target)
        assert res[0] == 3
        first = dict(zip(res[1][::2], res[1][1::2]))
        assert first["name"] == "n7"
    with pytest.raises(RuntimeError, match="tune"):
        c.cmd("HNSW.SEARCH", "rt", "K", "3", "QUERY", str(dim), *q,
              "ENGINE", "graph", "RECALL_TARGET", "0.9")
    assert c.cmd("HNSW.DEL", "rt") == 1
    c.close()
