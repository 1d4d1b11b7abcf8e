"""Mergeable uniform reservoir sample (size k).

Absent in the reference; standard for a distributed sketch library: per-block
Algorithm R (Vitter 1985) partials, merged with the exact hypergeometric split —
when merging reservoirs R1 (seen n1) and R2 (seen n2), the number of output
slots taken from R1 is Hypergeometric(n1+n2, n1, k_out), then each side is
sampled WITHOUT replacement. That is exactly the distribution of "how many of a
uniform k_out-subset of the union fall in stream 1", so uniformity over any
partition/merge tree follows by induction (each stream item ends in the final
reservoir w.p. k_out/N), including merges of partially-filled reservoirs.

Randomness is a seeded per-instance Philox generator; a build over a fixed block
layout with fixed seeds is reproducible. Values are stored as Python scalars
(ints/floats/strings; ≤k of them) and serialized as JSON in the state blob.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raysketch.sketches.base import pack_state, register_sketch, unpack_state


class ReservoirSample:
    kind = "reservoir"

    def __init__(self, k: int = 1000, seed: int = 0):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        self.seed = int(seed)
        self.rng = np.random.default_rng(np.random.Philox(key=self.seed))
        self.items: list = []
        self.n_seen = 0

    def update_column(self, col) -> None:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vals = col.to_pylist() if isinstance(col, pa.Array) else list(np.asarray(col).tolist())
        n = len(vals)
        if n == 0:
            return
        # vectorized Algorithm R over the batch: fill, then accept index j with
        # probability k/(n_seen+j+1) replacing a uniform slot
        fill = min(max(self.k - len(self.items), 0), n)
        self.items.extend(vals[:fill])
        rest = n - fill
        if rest > 0:
            j = np.arange(rest, dtype=np.int64) + self.n_seen + fill + 1
            accept = self.rng.random(rest) < (self.k / j)
            slots = self.rng.integers(0, self.k, size=rest)
            for idx in np.nonzero(accept)[0]:
                self.items[int(slots[idx])] = vals[fill + int(idx)]
        self.n_seen += n

    def merge(self, other: "ReservoirSample") -> "ReservoirSample":
        if self.k != other.k:
            raise ValueError("reservoir k mismatch")
        n1, n2 = self.n_seen, other.n_seen
        if n2 == 0:
            return self
        if n1 == 0:
            self.items = list(other.items)
            self.n_seen = n2
            return self
        k_out = min(self.k, n1 + n2)
        # exact hypergeometric split: choosing how many of the k_out output slots
        # come from stream 1 as Hypergeometric(n1+n2, n1, k_out) makes the merged
        # reservoir a uniform k_out-subset of the union for ANY fill levels —
        # including partially-filled inputs (n_i < k), where the old binomial
        # draw needed clamping and produced undersized/biased merges. The
        # hypergeometric support guarantees take1 <= min(k_out, n1) = len(items)
        # and take2 <= min(k_out, n2), so no clamping is ever needed.
        take1 = int(self.rng.hypergeometric(n1, n2, k_out))
        take2 = k_out - take1
        pick1 = self.rng.choice(len(self.items), size=take1, replace=False)
        pick2 = self.rng.choice(len(other.items), size=take2, replace=False)
        self.items = [self.items[i] for i in pick1] + [other.items[i] for i in pick2]
        self.n_seen = n1 + n2
        return self

    def sample(self) -> list:
        return list(self.items)

    @property
    def size_bytes(self) -> int:
        return 16 * len(self.items)

    def to_bytes(self) -> bytes:
        meta = {"k": self.k, "seed": self.seed, "n_seen": self.n_seen, "items": self.items}
        return pack_state(self.kind, meta, [])

    @classmethod
    def from_bytes(cls, blob: bytes) -> "ReservoirSample":
        kind, meta, _ = unpack_state(blob)
        assert kind == cls.kind
        sk = cls(meta["k"], meta["seed"])
        sk.items = meta["items"]
        sk.n_seen = meta["n_seen"]
        return sk


register_sketch(ReservoirSample.kind, ReservoirSample)
