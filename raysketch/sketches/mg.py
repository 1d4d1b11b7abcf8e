"""Misra–Gries heavy-hitters summary — mergeable frequent-items sketch.

Absent in the reference (which is Bloom-only), required by the north rule's
"sketch library" framing: the classic deterministic frequency summary
(Misra & Gries 1982) with the MERGEABLE form of Agarwal, Cormode, Huang,
Phillips, Wei, Yi — "Mergeable Summaries" (PODS 2012): combine two summaries by
adding counters, then subtract the (k+1)-th largest count and drop non-positive
entries. Guarantees, for total stream weight N:

    true_count - N/(k+1)  <=  estimate(key)  <=  true_count

and the bound survives ANY partition/merge tree (the property Ray's per-batch
partial → tree-merge build relies on). Every key with frequency > N/(k+1) is
retained. Keys are strings or ints (stored as JSON in the state blob — the
summary holds at most k entries, so the state is tiny and O(k) regardless of
stream size).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raysketch.sketches.base import pack_state, register_sketch, unpack_state


class MisraGries:
    kind = "mg"

    def __init__(self, k: int = 256):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        self.counters: dict = {}
        self.total = 0  # N — total weight observed (drives the error bound)

    @property
    def eps_bound(self) -> float:
        """Maximum undercount: N/(k+1)."""
        return self.total / (self.k + 1)

    def _prune(self) -> None:
        if len(self.counters) <= self.k:
            return
        counts = np.fromiter(self.counters.values(), count=len(self.counters), dtype=np.int64)
        # subtract the (k+1)-th largest count; at most k survive (> threshold)
        m = int(np.partition(counts, len(counts) - self.k - 1)[len(counts) - self.k - 1])
        self.counters = {key: c - m for key, c in self.counters.items() if c - m > 0}

    def update_column(self, col, weights=None) -> None:
        """Ingest one Arrow/numpy column: per-batch value_counts (vectorized),
        then a Python merge over the batch's UNIQUE keys only."""
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if isinstance(col, pa.Array):
            if weights is None:
                vc = col.value_counts()
                keys = vc.field("values").to_pylist()
                counts = np.asarray(vc.field("counts")).astype(np.int64)
            else:
                import pandas as pd

                s = pd.Series(np.asarray(weights, dtype=np.int64)).groupby(col.to_pandas()).sum()
                keys, counts = s.index.tolist(), s.to_numpy()
        else:
            arr = np.asarray(col)
            if weights is None:
                uk, counts = np.unique(arr, return_counts=True)
            else:
                import pandas as pd

                s = pd.Series(np.asarray(weights, dtype=np.int64)).groupby(arr).sum()
                uk, counts = s.index.to_numpy(), s.to_numpy()
            keys = uk.tolist()
        get = self.counters.get
        for key, c in zip(keys, counts.tolist()):
            self.counters[key] = get(key, 0) + c
        self.total += int(counts.sum())
        self._prune()

    def estimate(self, key) -> int:
        """Lower-bound estimate: true - N/(k+1) <= estimate <= true."""
        return int(self.counters.get(key, 0))

    def topk(self, n: int | None = None) -> list[tuple]:
        items = sorted(self.counters.items(), key=lambda kv: (-kv[1], str(kv[0])))
        return items[: (n or self.k)]

    def merge(self, other: "MisraGries") -> "MisraGries":
        if self.k != other.k:
            raise ValueError("MisraGries k mismatch")
        get = self.counters.get
        for key, c in other.counters.items():
            self.counters[key] = get(key, 0) + c
        self.total += other.total
        self._prune()
        return self

    @property
    def size_bytes(self) -> int:
        return 16 * len(self.counters)

    def to_bytes(self) -> bytes:
        meta = {
            "k": self.k,
            "total": self.total,
            "keys": list(self.counters.keys()),
            "counts": [int(c) for c in self.counters.values()],
        }
        return pack_state(self.kind, meta, [])

    @classmethod
    def from_bytes(cls, blob: bytes) -> "MisraGries":
        kind, meta, _ = unpack_state(blob)
        assert kind == cls.kind
        sk = cls(meta["k"])
        sk.counters = dict(zip(meta["keys"], meta["counts"]))
        sk.total = meta["total"]
        return sk


register_sketch(MisraGries.kind, MisraGries)
