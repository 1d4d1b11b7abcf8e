"""Sketch protocol — the duck-typed interface every sketch implements.

The reference's intended plugin surface is the C++20 ``BloomFilterType`` concept
(``Insert / Query / TotalBitsUsed``, benchmark_bloom.cpp:11-16). Our equivalent is a
small Python protocol, with the mergeable-aggregate (UDAF) shape the Ray pipeline
drives: ``zero → update_* (per batch) → merge (tree combine) → finalize/probe``.

Serialization contract: ``to_bytes()``/``from_bytes()`` round-trip the full state
(geometry + arrays) as a single bytes blob — this is what checkpoints store in a
``state: binary`` Parquet column, and what crosses the object store during merges.
"""

from __future__ import annotations

import json
import struct
from typing import Any, ClassVar, Protocol, runtime_checkable

_MAGIC = b"RSK1"


@runtime_checkable
class Sketch(Protocol):
    """Structural interface (not enforced; documented contract)."""

    kind: ClassVar[str]

    def merge(self, other: "Sketch") -> "Sketch": ...

    def to_bytes(self) -> bytes: ...


_REGISTRY: dict[str, type] = {}


def register_sketch(kind: str, cls: type) -> None:
    """Register a sketch class for generic deserialization (``sketch_from_bytes``)."""
    _REGISTRY[kind] = cls


def pack_state(kind: str, meta: dict[str, Any], arrays: list[bytes]) -> bytes:
    """Common serialization: magic | kind | json meta | length-prefixed arrays."""
    mb = json.dumps(meta, sort_keys=True).encode()
    kb = kind.encode()
    out = [_MAGIC, struct.pack("<II", len(kb), len(mb)), kb, mb, struct.pack("<I", len(arrays))]
    for a in arrays:
        out.append(struct.pack("<Q", len(a)))
        out.append(a)
    return b"".join(out)


def unpack_state(blob: bytes) -> tuple[str, dict[str, Any], list[bytes]]:
    assert blob[:4] == _MAGIC, "bad sketch blob"
    klen, mlen = struct.unpack_from("<II", blob, 4)
    p = 12
    kind = blob[p : p + klen].decode()
    p += klen
    meta = json.loads(blob[p : p + mlen])
    p += mlen
    (narr,) = struct.unpack_from("<I", blob, p)
    p += 4
    arrays = []
    for _ in range(narr):
        (alen,) = struct.unpack_from("<Q", blob, p)
        p += 8
        arrays.append(blob[p : p + alen])
        p += alen
    return kind, meta, arrays


def _ensure_registry() -> None:
    """Import every sketch module so registration is not load-order dependent.
    A fresh Ray worker deserializing a blob has only imported whatever the task
    closure referenced — without this, `sketch_from_bytes` on (say) a counting
    Bloom blob raised `unregistered sketch kind` in workers that never ran a
    build stage. Idempotent and cheap after the first call."""
    import importlib
    import inspect

    for mod in (
        "bloom",
        "counting_bloom",
        "hll",
        "cms",
        "tdigest",
        "kll",
        "ddsketch",
        "theta",
        "mg",
        "reservoir",
        "weighted_reservoir",
    ):
        m = importlib.import_module(f"raysketch.sketches.{mod}")
        # register directly (not via import side effects — already-imported
        # modules won't re-run their module body)
        for _, cls in inspect.getmembers(m, inspect.isclass):
            kind = getattr(cls, "kind", None)
            if isinstance(kind, str) and hasattr(cls, "from_bytes") and cls.__module__ == m.__name__:
                _REGISTRY.setdefault(kind, cls)


def sketch_from_bytes(blob: bytes):
    """Deserialize any registered sketch from its ``to_bytes`` blob."""
    kind, _, _ = unpack_state(blob)
    cls = _REGISTRY.get(kind)
    if cls is None:
        _ensure_registry()
        cls = _REGISTRY.get(kind)
    if cls is None:
        raise KeyError(f"unregistered sketch kind: {kind}")
    return cls.from_bytes(blob)
