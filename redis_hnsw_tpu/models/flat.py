"""Flat (brute-force, exact) index.

Not present in the reference (which only has the HNSW graph), but required
infrastructure here: it is the exact-kNN oracle the tests measure recall
against (generalizing the reference's known-lattice assertions,
src/hnsw/core_tests.rs:44-53), and a useful model in its own right -- on a
TPU a full [B,D]x[D,N] MXU scan of a 100k-row table is often faster than
graph traversal. Shares the name table and similarity conventions of the
HNSW index.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import IndexConfig
from ..errors import (
    CapacityError,
    DimensionMismatch,
    HNSWError,
    NodeExists,
    NodeNotFound,
)
from ..ops import distance as D
from ..utils.names import NameTable
from .hnsw import SearchResult


def _dispatch_flat(index, vecs, sqn, valid, part, *, k: int,
                   metric: str, approx: bool = False, tscale=None,
                   host_part=None, cert_sink=None):
    """Enqueue one flat-scan chunk; returns a zero-arg ``finish()``
    yielding (ids, sims) numpy. Shared scan engine (ops/scan.py):
    chunked matmul top-k; hamming rides the MXU via the int8 +-1
    table (cached per mutation epoch). ``approx`` opts into the
    oversampled approx_max_k selection -- the flat index stays the
    exact oracle by DEFAULT. The bf16 tier
    (REDIS_HNSW_TPU_SCAN_DTYPE=bf16) selects on the cached bf16 copy,
    final k rescored exact-f32 on device. ``tscale`` marks the
    int8-RESIDENT tier: selection on the device int8 table, exact f32
    rescore HOST-side in finish() (the f32 rows only exist there).

    Mirrors ops/scan.py ``scan_dispatch``: all device work dispatches
    asynchronously before return, finish() pays ONE device->host
    fetch (every reply is packed into a single array -- on a
    latency-bound link a second fetch costs a full ~28ms round trip),
    and the pipelined chunk loop in ``search_batch`` below overlaps
    that fetch with the next chunks' compute. ``cert_sink`` coalesces
    certified fallback reruns across the loop (ops/scan.py
    CertRerunSink)."""
    from ..ops import scan as SC

    n_q = int(part.shape[0])
    b_pad = SC.pad_pow2(n_q)
    pd = part if isinstance(part, jax.Array) else jnp.asarray(part)
    if b_pad != n_q:
        pd = jnp.concatenate(
            [pd, jnp.zeros((b_pad - n_q, pd.shape[1]), pd.dtype)]
        )
    if tscale is not None:
        # int8-resident recall ladder: select mult*k candidates on the
        # device int8 table, rescore ALL of them exact-f32 host-side,
        # keep the top k. The tier's recall is pinned by int8 SCORING
        # picking the wrong top-k (measured 0.9734 at 32M with mult=1,
        # artifacts/flat_capacity.json); a wider selection recovers
        # true neighbors ranked just past k by the quantized scores at
        # ~no device cost (the select is already oversample-shaped)
        # and a tiny host gemm (B x mult*k x D).
        mult = SC.int8_rescore_mult()
        k_dev = min(mult * k, int(vecs.shape[0]))
        ids_dev, _ = SC.scan_topk(
            vecs, sqn, valid, pd, k=k_dev, metric="euclidean",
            tscale=tscale, approx=approx,
        )
        get_ids = SC.fetch_handle(ids_dev[:n_q])

        def finish_int8():
            # only the id block crosses the link: invalid slots carry
            # id -1 (scan_topk), and the sims are recomputed host-side
            # anyway -- the [B, k_dev] f32 selection sims and (with a
            # host mirror) the query block stay on device
            ids = get_ids()
            invalid = ids < 0
            qs_np = np.asarray(
                part if host_part is None else host_part, np.float32
            )
            ids_safe = np.where(invalid, 0, ids)
            exact = SC.neg_sq_rows(index._vectors[ids_safe], qs_np)
            sims = np.where(
                invalid, np.float32(-np.inf), exact.astype(np.float32)
            )
            ids, sims = SC.sort_reply(ids, sims)
            return ids[:, :k], sims[:, :k]

        return finish_int8
    if metric == "hamming":
        cached = index._pm1_cache
        if cached is None or cached[0] != index._epoch:
            cached = (index._epoch, SC._build_pm1(vecs))
            index._pm1_cache = cached
        pm1 = cached[1]
        d_bits = int(pm1.shape[1])
        id_bits = max(int(pm1.shape[0] - 1).bit_length(), 1)
        if (
            not approx and d_bits.bit_length() + id_bits <= 31
            and SC.cert_enabled(int(pm1.shape[0]), d_bits // 2)
        ):
            # certified-exact hamming (deep certificate, ops/scan.py):
            # byte-identical to the exact scan, approx-select cost
            block = SC.scan_certified_hamming(
                pm1, sqn, valid, pd, k=k, id_bits=id_bits
            )
            get_block = SC.fetch_handle(block[:n_q])

            def finish_hamming_cert():
                return SC.certified_finish_hamming(
                    pm1, sqn, valid, pd, get_block, k=k, n_q=n_q,
                    id_bits=id_bits, rerun_sink=cert_sink,
                )

            return finish_hamming_cert
        packed = SC.scan_topk(
            pm1, sqn, valid, pd, k=k, metric="hamming",
            pack=True, approx=approx,
        )
    else:
        table = None
        if SC.scan_dtype() == "bf16":
            cached = getattr(index, "_tier_cache", None)
            if cached is None or cached[0] != index._epoch:
                cached = (index._epoch, SC._to_bf16(vecs))
                index._tier_cache = cached
            table = cached[1]
        if table is None and not approx and SC.cert_enabled(
            int(vecs.shape[0]), int(vecs.shape[1])
        ):
            # certified-exact select (ops/scan.py): byte-identical to
            # the exact top_k path, several-fold cheaper at capacity
            # scale
            block = SC.scan_certified_l2(vecs, sqn, valid, pd, k=k)
            get_block = SC.fetch_handle(block[:n_q])

            def finish_cert():
                return SC.certified_finish(
                    vecs, sqn, valid, pd, get_block, k=k, n_q=n_q,
                    rerun_sink=cert_sink,
                )

            return finish_cert
        packed = SC.scan_topk_exact_l2(
            vecs, sqn, valid, pd, k=k, pack=True, approx=approx,
            table=table,
        )

    get_packed = SC.fetch_handle(packed[:n_q])

    def finish_packed():
        p = get_packed()
        ids = p[:, :k]
        sims = np.ascontiguousarray(p[:, k:]).view(np.float32)
        return ids, sims

    return finish_packed


def _scan_topk_pallas(vecs, sqn, valid, queries, *, k: int, metric: str):
    """Fused Pallas scan path (see ops/pallas_scan.py for the tradeoff)."""
    from ..ops import pallas_scan as P

    if metric == "hamming":
        bias = P.hamming_bias(valid)
    else:
        bias = P.euclid_bias(sqn, valid)
    ids, sims = P.flat_topk_pallas(
        queries, vecs, bias, k=k, metric=metric,
        interpret=jax.default_backend() == "cpu",
    )
    if metric == "euclidean":
        sims = D.exact_neg_sq_l2(
            queries, vecs, jnp.maximum(ids, 0), sims != -jnp.inf
        )
        ids, sims = D.resort_desc(ids, sims)
    return ids, sims


class FlatIndex:
    def __init__(self, name: str, config: IndexConfig) -> None:
        self.name = name
        self.config = config
        width = (
            config.dim // 32 if config.metric == "hamming" else config.dim
        )
        dtype = np.uint32 if config.metric == "hamming" else np.float32
        cap = max(int(config.capacity), 8)
        self._vectors = np.zeros((cap, width), dtype)
        self._valid = np.zeros(cap, bool)
        self._names = NameTable()
        self._epoch = 0
        self._dev = None
        self._dev_epoch = -1
        self._pm1_cache = None  # (epoch, int8 +-1 table) for hamming

    @property
    def node_count(self) -> int:
        return len(self._names)

    def info(self) -> dict:
        """HNSW.GET reply with the reference's full 9-field shape
        (src/types.rs:122-155). The flat kind has no graph, so the
        graph-only fields (m, ef_construction, level_mult, max_layer,
        enterpoint) are honest nulls rather than absent keys -- a
        client iterating the reference's field list sees every key."""
        return {
            "name": self.name,
            "metric": self.config.metric.capitalize(),
            "data_dim": self.config.dim,
            "m": None,
            "ef_construction": None,
            "level_mult": None,
            "node_count": self.node_count,
            "max_layer": None,
            "enterpoint": None,
        }

    def __len__(self) -> int:
        return self.node_count

    def _coerce(self, data) -> np.ndarray:
        arr = np.asarray(data, dtype=self._vectors.dtype).ravel()
        got = arr.size * (32 if self.config.metric == "hamming" else 1)
        if got != self.config.dim:
            raise DimensionMismatch(got)
        return arr

    def add_node(self, name: str, data) -> None:
        if not name:
            raise HNSWError("node name must be non-empty")
        if name in self._names:
            raise NodeExists(name)
        q = self._coerce(data)
        row = self._names.alloc(name)
        if row >= self._vectors.shape[0]:
            if self.config.fixed_capacity:
                self._names.free(name)
                raise CapacityError(
                    f"index at fixed capacity {self.config.capacity} "
                    f"(need {row + 1} rows)"
                )
            new_cap = max(self._vectors.shape[0] * 2, row + 1)
            vecs = np.zeros((new_cap, self._vectors.shape[1]), q.dtype)
            vecs[: self._vectors.shape[0]] = self._vectors
            valid = np.zeros(new_cap, bool)
            valid[: self._valid.shape[0]] = self._valid
            self._vectors, self._valid = vecs, valid
        self._vectors[row] = q
        self._valid[row] = True
        self._epoch += 1

    def add_batch(self, names, data) -> None:
        data = np.atleast_2d(np.asarray(data, dtype=self._vectors.dtype))
        names = list(names)
        if len(names) != data.shape[0]:
            raise ValueError(
                f"{len(names)} names for {data.shape[0]} data rows"
            )
        if data.shape[1] != self._vectors.shape[1]:
            got = data.shape[1] * (
                32 if self.config.metric == "hamming" else 1
            )
            raise DimensionMismatch(got)
        seen: set[str] = set()
        for n in names:
            if not n:
                raise HNSWError("node name must be non-empty")
            if n in self._names or n in seen:
                raise NodeExists(n)
            seen.add(n)
        rows = np.fromiter(
            (self._names.alloc(n) for n in names), np.int64, len(names)
        )
        need = int(rows.max(initial=-1)) + 1
        if need > self._vectors.shape[0]:
            if self.config.fixed_capacity:
                for n in names:
                    self._names.free(n)
                raise CapacityError(
                    f"index at fixed capacity {self.config.capacity} "
                    f"(need {need} rows)"
                )
            new_cap = self._vectors.shape[0]
            while new_cap < need:
                new_cap *= 2
            vecs = np.zeros((new_cap, self._vectors.shape[1]), data.dtype)
            vecs[: self._vectors.shape[0]] = self._vectors
            valid = np.zeros(new_cap, bool)
            valid[: self._valid.shape[0]] = self._valid
            self._vectors, self._valid = vecs, valid
        self._vectors[rows] = data
        self._valid[rows] = True
        self._epoch += 1

    def delete_node(self, name: str) -> None:
        if name not in self._names:
            raise NodeNotFound(name)
        row = self._names.free(name)
        self._valid[row] = False
        self._epoch += 1

    def delete_batch(self, names) -> None:
        """Bulk delete: validate-all-first (nothing mutates on error),
        then one epoch bump for the whole batch."""
        names = list(names)
        seen: set[str] = set()
        for n in names:
            if n not in self._names or n in seen:
                raise NodeNotFound(n)
            seen.add(n)
        if not names:
            return
        for n in names:
            self._valid[self._names.free(n)] = False
        self._epoch += 1

    def _device(self):
        """Device tables: (table, sqn, valid, tscale).

        ``tscale`` is None except in the int8-RESIDENT mode
        (REDIS_HNSW_TPU_SCAN_DTYPE=int8, euclidean): there the f32
        vectors never go to the device at all -- ``table`` is the
        host-quantized int8 copy (QUARTER the HBM and a quarter the
        upload bytes; the capacity tier for serving beyond the f32
        ceiling) and the final k are rescored exact-f32 on the host,
        where the f32 vectors already live (search_batch)."""
        from ..ops.scan import scan_dtype

        mode = (
            scan_dtype() if self.config.metric == "euclidean" else "f32"
        )
        if self._dev is None or self._dev_epoch != (self._epoch, mode):
            n = max(self._names.high_water, 1)
            n_pad = ((n + 127) // 128) * 128
            if self._vectors.shape[0] == n_pad:
                vecs = self._vectors  # no host copy at capacity scale
            else:
                vecs = np.zeros(
                    (n_pad, self._vectors.shape[1]), self._vectors.dtype
                )
                vecs[:n] = self._vectors[:n]
            valid = np.zeros(n_pad, bool)
            valid[:n] = self._valid[:n]
            if self.config.metric == "hamming":
                sqn = np.zeros(n_pad, np.float32)
            else:
                sqn = np.einsum("nd,nd->n", vecs, vecs).astype(np.float32)
            if mode == "int8":
                # chunked host quantization: bounds peak host memory at
                # capacity scale (a 10M x 128d table is 5GB f32; one
                # full-size f32 temporary would double it)
                scale = np.empty(n_pad, np.float32)
                q8 = np.empty(vecs.shape, np.int8)
                step = 1 << 20
                for lo in range(0, n_pad, step):
                    sl = vecs[lo : lo + step]
                    amax = np.abs(sl).max(axis=1)
                    sc = np.where(amax > 0, amax / 127.0, 1.0).astype(
                        np.float32
                    )
                    scale[lo : lo + step] = sc
                    q8[lo : lo + step] = np.clip(
                        np.round(sl / sc[:, None]), -127, 127
                    ).astype(np.int8)
                self._dev = (
                    jnp.asarray(q8),
                    jnp.asarray(sqn),
                    jnp.asarray(valid),
                    jnp.asarray(scale),
                )
            else:
                self._dev = (
                    jnp.asarray(vecs),
                    jnp.asarray(sqn),
                    jnp.asarray(valid),
                    None,
                )
            self._dev_epoch = (self._epoch, mode)
        return self._dev

    def search_batch(
        self, queries, k: int, use_pallas: bool = False,
        approx: bool = False, recall_target: float | None = None,
        host_qs=None, reply: str = "objects",
    ) -> list[list[SearchResult]]:
        # host_qs optionally mirrors device-resident ``queries`` on the
        # host: the int8-resident tier rescores host-side and otherwise
        # has to pull the query block back over the link.
        # recall_target follows the shared guarantee rule: targets at
        # or below the approx tier's measured floor ride the tier,
        # anything above it stays exact (ops/search.py resolve_engine).
        # reply="columnar" returns the (names, sims) array pair like
        # the HNSW path (ops/search.py search_batch): serving loops
        # skip the ~30ms/batch of SearchResult construction a 1-core
        # host pays at B=2048.
        if reply not in ("objects", "columnar"):
            raise ValueError(f"unknown reply mode {reply!r}")
        if recall_target is not None:
            from ..ops.search import resolve_engine

            approx = approx or (
                resolve_engine("auto", recall_target) == "scan-approx"
            )
        if (
            isinstance(queries, jax.Array)
            and queries.ndim == 2
            and queries.dtype == self._vectors.dtype
        ):
            qs = queries  # device-resident: no host round-trip
        else:
            qs = np.atleast_2d(
                np.asarray(queries, dtype=self._vectors.dtype)
            )
        if qs.shape[1] != self._vectors.shape[1]:
            got = qs.shape[1] * (
                32 if self.config.metric == "hamming" else 1
            )
            raise DimensionMismatch(got)
        if self.node_count == 0:
            if reply == "columnar":
                return (
                    np.full((qs.shape[0], int(k)), None, object),
                    np.full(
                        (qs.shape[0], int(k)), float("-inf"), np.float32
                    ),
                )
            return [[] for _ in range(qs.shape[0])]
        vecs, sqn, valid, tscale = self._device()
        k_eff = min(int(k), int(vecs.shape[0]))
        if use_pallas:
            ids, sims = _scan_topk_pallas(
                vecs, sqn, valid, jnp.asarray(qs), k=k_eff,
                metric=self.config.metric,
            )
            ids = np.asarray(ids)
            sims = np.asarray(sims)
        else:
            # Chunked pipelined drain (ops/scan.py drain_pipelined):
            # query sets larger than one 2048-lane chunk keep
            # pipeline_depth() chunks dispatched-but-unfetched so each
            # chunk's fetch round trip hides behind the next chunks'
            # device compute; certified fallback reruns coalesce
            # across the loop (CertRerunSink). Single-chunk calls
            # behave as before.
            from ..ops import scan as SC
            from ..ops.search import max_lanes_for

            n_q = qs.shape[0]
            if n_q == 0:
                if reply == "columnar":
                    # same empty array-pair shape as the
                    # node_count==0 branch above
                    return (
                        np.empty((0, int(k)), object),
                        np.empty((0, int(k)), np.float32),
                    )
                return []
            chunk = max_lanes_for(int(vecs.shape[0]))
            sink = SC.CertRerunSink()
            hq = host_qs if isinstance(qs, jax.Array) else qs
            if not isinstance(qs, jax.Array) and n_q > chunk:
                # one H2D for the whole block (H2D pays ~0.5-1s of
                # per-transfer latency on this tunnel); chunks below
                # are then free device-side slices
                qs = jnp.asarray(qs)

            def dispatch(part, hpart):
                return _dispatch_flat(
                    self, vecs, sqn, valid, part, k=k_eff,
                    metric=self.config.metric, approx=approx,
                    tscale=tscale, host_part=hpart, cert_sink=sink,
                )

            parts = (
                (
                    qs[lo : lo + chunk],
                    None if hq is None else hq[lo : lo + chunk],
                )
                for lo in range(0, n_q, chunk)
            )
            # Engine-aware fetch-window default (see ops/search.py):
            # the coalesced D2H pays on the cheap-select engines
            # (approx / certified), not the compute-bound exact top_k.
            will_cert = tscale is None and not approx and (
                (
                    self.config.metric == "euclidean"
                    and SC.scan_dtype() == "f32"
                    and SC.cert_enabled(
                        int(vecs.shape[0]), int(vecs.shape[1])
                    )
                )
                or (
                    self.config.metric == "hamming"
                    # both dispatcher gates: 31-bit word pack + int8
                    # dim gate (see SC.hamming_cert_ready)
                    and SC.hamming_cert_ready(
                        int(vecs.shape[0]), int(vecs.shape[1])
                    )
                )
            )
            id_parts, sim_parts = SC.drain_pipelined(
                parts, dispatch, sink=sink,
                default_window=(
                    SC.FETCH_WINDOW_FAST if (approx or will_cert) else 1
                ),
            )
            if len(id_parts) == 1:
                ids, sims = id_parts[0], sim_parts[0]
            else:
                ids = np.concatenate(id_parts)
                sims = np.concatenate(sim_parts)
        # Batch replies carry (sim, name) only, like the HNSW batch path
        # (the reference's search reply shape, src/types.rs:445-457);
        # names resolve via one object-array fancy-index. Slots scored
        # -inf are 128-padding / deleted rows whose ids may exceed the
        # name table's high water -- zero them before the fancy-index
        # (they are dropped below anyway).
        ids_safe = np.where(np.isneginf(sims), 0, np.maximum(ids, 0))
        names = self._names.names_array()[ids_safe]
        neg_inf = float("-inf")
        if reply == "columnar":
            invalid = (ids < 0) | np.isneginf(sims)
            if invalid.any():
                names[invalid] = None  # fancy-index output is a copy
                sims = np.where(invalid, neg_inf, sims)
            return names, np.asarray(sims, np.float32)
        out = []
        for bsim, bnames in zip(sims.tolist(), names.tolist()):
            out.append(
                [
                    SearchResult(s, n)
                    for s, n in zip(bsim, bnames)
                    if s != neg_inf
                ]
            )
        return out

    def search_knn(self, data, k: int) -> list[SearchResult]:
        res = self.search_batch(np.atleast_2d(self._coerce(data)), k)[0]
        # single-query replies carry the vector, like HNSWIndex.search_knn
        for r in res:
            r.data = self._vectors[self._names.get(r.name)].copy()
        return res

    def get_node(self, name: str) -> dict:
        """HNSW.NODE.GET parity for the flat kind: data + (no) neighbors."""
        row = self._names.get(name)
        if row is None:
            raise NodeNotFound(name)
        return {"data": self._vectors[row].copy(), "neighbors": []}
