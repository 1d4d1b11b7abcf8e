"""Counting Bloom filter — the deletable member of the Bloom family.

Public-knowledge design (Fan, Cao, Almeida, Broder, "Summary Cache", ToN 2000):
the bit array of the classic filter (same textbook geometry and Kirsch–
Mitzenmacher probe sequence as ``BloomSketch`` — SURVEY.md §1-2) becomes an
array of small counters; insert increments the k probe counters, delete
decrements them, membership is "all k counters > 0". The reference repo has no
deletable variant — this extends the family for pipelines that retire expired
documents from a membership index without a rebuild (the epoch/incremental
dedup use case).

Guarantees (under the standard contract that only previously-inserted items are
deleted, each at most as many times as inserted):

- zero false negatives for items still in the set;
- false-positive rate ≤ the classic filter's at equal (m, k) — counters > 0
  exactly where the classic filter has 1 bits for the same inserts;
- deletes are EXACT inverses: insert(A ∪ B); delete(B) leaves counters
  element-wise identical to insert(A) (tested), as long as no counter ever
  saturated;
- saturation safety: counters pin at ``SATURATE`` (2^16 − 1; reached only past
  ~65k colliding inserts on one counter) and pinned counters are never
  decremented — a conservative rule that preserves no-false-negatives at the
  cost of unremovable fp on those probes.

Merge is element-wise SATURATING addition — associative and commutative
(``min(a+b+c, s)`` composes), so partial filters built per block tree-merge like
every other sketch here. In-memory counters are int32 for overflow-free
``np.add.at`` scatters; the wire format is uint16 (counters are ≤ SATURATE by
invariant), 2 B per counter.
"""

from __future__ import annotations

import numpy as np

from raysketch.hashing import CLASSIC_SEEDS, hash_pair
from raysketch.sketches.base import pack_state, register_sketch, unpack_state
from raysketch.sketches.bloom import bloom_geometry

_U32 = np.uint32

SATURATE = (1 << 16) - 1


class CountingBloom:
    """Deletable Bloom filter over ``(h1, h2)`` uint32 hash pairs."""

    kind = "cbloom"

    def __init__(
        self,
        capacity: int,
        fp_rate: float = 0.01,
        hash_algo: str = "xxh64",
        seeds: tuple[int, int] = CLASSIC_SEEDS,
    ):
        self.capacity = int(capacity)
        self.fp_rate = float(fp_rate)
        self.hash_algo = hash_algo
        self.seeds = tuple(seeds)
        self.m, self.k = bloom_geometry(self.capacity, self.fp_rate)
        self._cnt = np.zeros(self.m, dtype=np.int32)
        self.count = 0  # net elements (inserts − deletes)

    # -- hash-level API -----------------------------------------------------------

    def _positions(self, h1: np.ndarray, h2: np.ndarray, i: int) -> np.ndarray:
        with np.errstate(over="ignore"):
            g = h1.astype(_U32, copy=False) + _U32(i) * h2.astype(_U32, copy=False)
        pos = g.astype(np.int64)
        pos %= self.m
        return pos

    def update_hashes(self, h1: np.ndarray, h2: np.ndarray) -> None:
        n = len(h1)
        if n == 0:
            return
        for i in range(self.k):
            pos = self._positions(h1, h2, i)
            np.add.at(self._cnt, pos, 1)
        # pin: int32 cannot overflow within one call (adds ≤ n per counter)
        np.minimum(self._cnt, SATURATE, out=self._cnt)
        self.count += n

    def delete_hashes(self, h1: np.ndarray, h2: np.ndarray) -> None:
        """Exact inverse of ``update_hashes`` for items known to be present.
        Saturated counters are pinned (never decremented); everything else
        decrements once per probe occurrence, floored at zero as a guard."""
        n = len(h1)
        if n == 0:
            return
        for i in range(self.k):
            pos = self._positions(h1, h2, i)
            pinned = self._cnt[pos] >= SATURATE
            np.subtract.at(self._cnt, pos[~pinned], 1)
        np.maximum(self._cnt, 0, out=self._cnt)
        self.count -= n

    def probe_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        n = len(h1)
        if n == 0:
            return np.empty(0, dtype=bool)
        hits = np.ones(n, dtype=bool)
        for i in range(self.k):
            hits &= self._cnt[self._positions(h1, h2, i)] > 0
        return hits

    # -- column-level convenience -------------------------------------------------

    def _pair(self, col):
        return hash_pair(col, algo=self.hash_algo, seeds=self.seeds)

    def update_column(self, col) -> None:
        h1, h2 = self._pair(col)
        self.update_hashes(h1, h2)

    def delete_column(self, col) -> None:
        h1, h2 = self._pair(col)
        self.delete_hashes(h1, h2)

    def probe_column(self, col) -> np.ndarray:
        h1, h2 = self._pair(col)
        return self.probe_hashes(h1, h2)

    # -- merge / estimate / serialize ---------------------------------------------

    def merge(self, other: "CountingBloom") -> "CountingBloom":
        """Element-wise saturating add — associative/commutative; deletes applied
        in any partial are carried through because they subtracted exactly."""
        if (self.m, self.k, self.hash_algo, self.seeds) != (
            other.m,
            other.k,
            other.hash_algo,
            other.seeds,
        ):
            raise ValueError("cannot merge counting Blooms with different geometry")
        np.add(self._cnt, other._cnt, out=self._cnt)
        np.minimum(self._cnt, SATURATE, out=self._cnt)
        self.count += other.count
        return self

    def subtract(self, other: "CountingBloom") -> "CountingBloom":
        """Distributed-retirement form of delete: ``other`` is a counting Bloom
        built (with the same geometry) over the multiset of items to remove —
        each partial built per block, tree-merged, then subtracted here in one
        array op. Exact inverse when the delete multiset ⊆ the insert multiset
        and nothing saturated; pinned counters stay pinned."""
        if (self.m, self.k, self.hash_algo, self.seeds) != (
            other.m,
            other.k,
            other.hash_algo,
            other.seeds,
        ):
            raise ValueError("cannot subtract counting Blooms with different geometry")
        pinned = self._cnt >= SATURATE
        self._cnt -= np.where(pinned, 0, other._cnt)
        np.maximum(self._cnt, 0, out=self._cnt)
        self.count -= other.count
        return self

    @property
    def total_bits(self) -> int:
        return self.m * 16  # wire width: 16-bit counters

    def fill_ratio(self) -> float:
        return float((self._cnt > 0).mean())

    def estimate_cardinality(self) -> float:
        """Swamidass–Baldi (2007): ``n̂ = −(m/k)·ln(1 − X)`` from the nonzero
        fraction X — the same estimator as the plain filter's, since counter>0
        positions coincide with the classic filter's set bits."""
        x = self.fill_ratio()
        if x >= 1.0:
            return float("inf")
        return -(self.m / self.k) * np.log1p(-x)

    def to_bytes(self) -> bytes:
        meta = {
            "capacity": self.capacity,
            "fp_rate": self.fp_rate,
            "hash_algo": self.hash_algo,
            "seeds": list(self.seeds),
            "m": self.m,
            "k": self.k,
            "count": self.count,
        }
        return pack_state(self.kind, meta, [self._cnt.astype(np.uint16).tobytes()])

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CountingBloom":
        kind, meta, arrays = unpack_state(blob)
        assert kind == cls.kind
        sk = cls.__new__(cls)
        sk.capacity = meta["capacity"]
        sk.fp_rate = meta["fp_rate"]
        sk.hash_algo = meta["hash_algo"]
        sk.seeds = tuple(meta["seeds"])
        sk.m = meta["m"]
        sk.k = meta["k"]
        sk.count = meta["count"]
        sk._cnt = np.frombuffer(arrays[0], dtype=np.uint16).astype(np.int32)
        return sk


register_sketch(CountingBloom.kind, CountingBloom)
