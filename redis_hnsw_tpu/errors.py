"""Error types for the TPU-native HNSW engine.

Mirrors the error semantics of the reference implementation
(zhao-lang/redis_hnsw, src/hnsw/core.rs:24-46 ``HNSWError`` plus the string
errors raised at the command layer, src/lib.rs:146-149, :242, :385-391).
Every error carries a message matching the reference's format so that a user
migrating from the Redis module sees familiar diagnostics.
"""

from __future__ import annotations


class HNSWError(Exception):
    """Base error. Reference: ``HNSWError`` (src/hnsw/core.rs:24-28)."""


class DimensionMismatch(HNSWError):
    """Data dimensionality does not match the index.

    Reference: src/hnsw/core.rs:389-391 (add) and :478-480 (search).
    """

    def __init__(self, got: int) -> None:
        super().__init__(f"data dimension: {got} does not match Index")
        self.got = got


class IndexExists(HNSWError):
    """Reference: src/lib.rs:146-149."""

    def __init__(self, name: str) -> None:
        super().__init__(f"Index: {name} already exists")
        self.name = name


class IndexNotFound(HNSWError):
    """Reference: src/lib.rs:242, :205."""

    def __init__(self, name: str) -> None:
        super().__init__(f"Index: {name} does not exist")
        self.name = name


class NodeExists(HNSWError):
    """Reference: src/hnsw/core.rs:407-409."""

    def __init__(self, name: str) -> None:
        super().__init__(f"Node: {name!r} already exists")
        self.name = name


class NodeNotFound(HNSWError):
    """Reference: src/hnsw/core.rs:419-421, src/lib.rs:441."""

    def __init__(self, name: str) -> None:
        super().__init__(f"Node: {name!r} does not exist")
        self.name = name


class NodeBusy(HNSWError):
    """Reference: the busy-guard at src/lib.rs:385-391.

    The reference refuses to delete a node whose ``Arc`` strong count
    exceeds 1, i.e. another command execution holds a live reference
    concurrently. This rebuild keeps the class for API compatibility
    (migrating code may catch it), but never raises it: mutations are
    serialized per index (api.py registry lock, server.py command lock)
    and readers operate on immutable device snapshots, so a node can
    never be "being accessed" while a delete runs -- the condition is
    structurally impossible rather than guarded against.
    """

    def __init__(self, name: str) -> None:
        super().__init__(
            f"{name} is being accessed, unable to delete. Try again later"
        )
        self.name = name


class CapacityError(HNSWError):
    """Index cannot grow: ``IndexConfig.fixed_capacity`` pins the row
    capacity (HBM footprint / compiled shapes) and an insert needs a row
    beyond it. No reference equivalent (the pointer graph grows
    unboundedly); this is a TPU deployment knob."""
