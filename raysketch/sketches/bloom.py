"""Bloom filter — classic and register-blocked variants, plus the partitioned form.

Semantics re-derived from the reference (SURVEY.md §1-2; no code copied):

- geometry: textbook ``m = ceil(-n·ln p / ln²2)`` bits, ``k = round(m/n · ln 2)``
  (the external/clean variants' formula, bloom_filters.h:44-52 / gloom_clean.h:121-133;
  we deliberately do NOT reproduce the ``/ln(2)⁴`` over-allocation bug of bloom.h:236-238
  nor the unsized-filters bug of gloom.h:71-86 — see SURVEY.md §1.4)
- probes: Kirsch–Mitzenmacher double hashing ``g_i = (h1 + i·h2) mod m`` with uint32
  wraparound on the sum, i = 0..k-1 (bloom.h:365-381 semantics)
- blocked variant: ``h1`` picks a 64-bit block, probes ``(h1 + i·h2) mod 64`` for
  i = 1..k-1 within it (gloom.h:285-301 / bloom_filters.h:183-211 semantics)
- merge: bitwise OR of equal-geometry arrays — associative, commutative, idempotent
- invariants: zero false negatives; measured FPR ≤ configured p (simple_benchmark.cpp
  confusion-matrix oracle, lines 163-167/305-313)

Build-side representation is one byte per bit (fast vectorized scatter: a fancy-index
assignment of 1s, duplicate-safe); the canonical serialized/merged form is the packed
little-endian bit array (``np.packbits(bitorder="little")``), 1/8 the size.
"""

from __future__ import annotations

import math

import numpy as np

from raysketch.hashing import CLASSIC_SEEDS, hash_pair, shard_of
from raysketch.sketches.base import pack_state, register_sketch, unpack_state

_U32 = np.uint32
_U64 = np.uint64


def bloom_geometry(capacity: int, fp_rate: float) -> tuple[int, int]:
    """Textbook ``(m, k)`` from ``(n, p)``; m rounded up to a 64-bit boundary."""
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    if not (0.0 < fp_rate < 1.0):
        raise ValueError("fp_rate must be in (0, 1)")
    m = math.ceil(-capacity * math.log(fp_rate) / (math.log(2) ** 2))
    m = max(64, ((m + 63) // 64) * 64)
    k = max(1, round(m / capacity * math.log(2)))
    return m, k


def theoretical_bits_per_item(fp_rate: float) -> float:
    """``-ln p / ln²2`` — 9.585 bits/item at p=0.01 (simple_benchmark.cpp:197-205)."""
    return -math.log(fp_rate) / (math.log(2) ** 2)


class BloomSketch:
    """Single-partition Bloom filter over ``(h1, h2)`` uint32 hash pairs."""

    kind = "bloom"

    def __init__(
        self,
        capacity: int,
        fp_rate: float = 0.01,
        algo: str = "classic",
        hash_algo: str = "xxh64",
        seeds: tuple[int, int] = CLASSIC_SEEDS,
    ):
        self.capacity = int(capacity)
        self.fp_rate = float(fp_rate)
        self.algo = algo
        self.hash_algo = hash_algo
        self.seeds = tuple(seeds)
        self.m, self.k = bloom_geometry(self.capacity, self.fp_rate)
        if algo == "classic":
            self._bits_u8 = np.zeros(self.m, dtype=np.uint8)  # one byte per bit
            self._blocks = None
        elif algo == "blocked":
            self._bits_u8 = None
            self._blocks = np.zeros(self.m // 64, dtype=np.uint64)
        else:
            raise ValueError(f"unknown bloom algo: {algo}")
        self.count = 0  # inserted elements (bloom.h:361 counter)

    # -- hash-level API (the reference's insert_with_hash/contains_with_hash split,
    #    bloom.h:365-399) ----------------------------------------------------------

    def update_hashes(self, h1: np.ndarray, h2: np.ndarray) -> None:
        n = len(h1)
        if n == 0:
            return
        h1 = h1.astype(np.uint32, copy=False)
        h2 = h2.astype(np.uint32, copy=False)
        if self.algo == "classic":
            pos = self._positions(h1, h2)
            self._bits_u8[pos.ravel()] = 1
        else:
            idx, mask = self._block_masks(h1, h2)
            np.bitwise_or.at(self._blocks, idx, mask)
        self.count += n

    def probe_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        n = len(h1)
        if n == 0:
            return np.empty(0, dtype=bool)
        h1 = h1.astype(np.uint32, copy=False)
        h2 = h2.astype(np.uint32, copy=False)
        if self.algo == "classic":
            pos = self._positions(h1, h2)
            return self._bits_u8[pos].all(axis=1)
        idx, mask = self._block_masks(h1, h2)
        return (self._blocks[idx] & mask) == mask

    def _positions(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        # (h1 + i*h2) with uint32 wraparound, then mod m — KM double hashing
        i = np.arange(self.k, dtype=np.uint32)
        with np.errstate(over="ignore"):
            s = h1[:, None] + i[None, :] * h2[:, None]  # uint32 wrap
        return s.astype(np.int64) % self.m

    def _block_masks(self, h1: np.ndarray, h2: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        nblocks = len(self._blocks)
        idx = h1.astype(np.int64) % nblocks
        mask = np.zeros(len(h1), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for i in range(1, max(2, self.k)):
                bit = (h1 + _U32(i) * h2) & _U32(63)
                mask |= _U64(1) << bit.astype(np.uint64)
        return idx, mask

    # -- column-level convenience --------------------------------------------------

    def _pair(self, col):
        return hash_pair(col, algo=self.hash_algo, seeds=self.seeds)

    def update_column(self, col) -> None:
        h1, h2 = self._pair(col)
        self.update_hashes(h1, h2)

    def probe_column(self, col) -> np.ndarray:
        h1, h2 = self._pair(col)
        return self.probe_hashes(h1, h2)

    # -- merge / serialize ---------------------------------------------------------

    def _check_geometry(self, other: "BloomSketch") -> None:
        if (self.m, self.k, self.algo, self.hash_algo, self.seeds) != (
            other.m,
            other.k,
            other.algo,
            other.hash_algo,
            other.seeds,
        ):
            raise ValueError("cannot merge Bloom filters with different geometry")

    def merge(self, other: "BloomSketch") -> "BloomSketch":
        """In-place bitwise-OR merge (associative/commutative/idempotent)."""
        self._check_geometry(other)
        if self.algo == "classic":
            np.bitwise_or(self._bits_u8, other._bits_u8, out=self._bits_u8)
        else:
            np.bitwise_or(self._blocks, other._blocks, out=self._blocks)
        self.count += other.count
        return self

    @property
    def total_bits(self) -> int:
        return self.m

    @property
    def size_bytes(self) -> int:
        return self.m // 8

    def fill_ratio(self) -> float:
        if self.algo == "classic":
            return float(self._bits_u8.mean())
        return float(np.unpackbits(self._blocks.view(np.uint8)).mean())

    def to_bytes(self) -> bytes:
        meta = {
            "capacity": self.capacity,
            "fp_rate": self.fp_rate,
            "algo": self.algo,
            "hash_algo": self.hash_algo,
            "seeds": list(self.seeds),
            "m": self.m,
            "k": self.k,
            "count": self.count,
        }
        if self.algo == "classic":
            packed = np.packbits(self._bits_u8, bitorder="little")
        else:
            packed = self._blocks.view(np.uint8)
        return pack_state(self.kind, meta, [packed.tobytes()])

    @classmethod
    def from_bytes(cls, blob: bytes) -> "BloomSketch":
        kind, meta, arrays = unpack_state(blob)
        assert kind == cls.kind
        sk = cls.__new__(cls)
        sk.capacity = meta["capacity"]
        sk.fp_rate = meta["fp_rate"]
        sk.algo = meta["algo"]
        sk.hash_algo = meta["hash_algo"]
        sk.seeds = tuple(meta["seeds"])
        sk.m = meta["m"]
        sk.k = meta["k"]
        sk.count = meta["count"]
        raw = np.frombuffer(arrays[0], dtype=np.uint8)
        if sk.algo == "classic":
            sk._bits_u8 = np.unpackbits(raw, bitorder="little")[: sk.m].copy()
            sk._blocks = None
        else:
            sk._bits_u8 = None
            sk._blocks = raw.view(np.uint64).copy()
        return sk


class PartitionedBloom:
    """Hash-sharded Bloom filter — the ParallelBloomFilter1/Gloom blueprint
    (parallel_bloom.h:58-127): ``num_shards`` (power of two) independent sub-filters,
    each sized ``capacity/num_shards`` at p; an item belongs to shard
    ``(h1 >> 16) & (num_shards - 1)``. The union of shards is the distributed filter;
    merge is shard-wise OR, so associativity holds shard-by-shard."""

    kind = "partitioned_bloom"

    def __init__(
        self,
        capacity: int,
        fp_rate: float = 0.01,
        num_shards: int = 16,
        algo: str = "classic",
        hash_algo: str = "xxh64",
        seeds: tuple[int, int] = CLASSIC_SEEDS,
    ):
        if num_shards & (num_shards - 1):
            raise ValueError("num_shards must be a power of two")
        self.capacity = int(capacity)
        self.fp_rate = float(fp_rate)
        self.num_shards = num_shards
        per = max(1, math.ceil(capacity / num_shards))
        self.shards = [
            BloomSketch(per, fp_rate, algo=algo, hash_algo=hash_algo, seeds=seeds)
            for _ in range(num_shards)
        ]
        self.hash_algo = hash_algo
        self.seeds = tuple(seeds)

    def update_hashes(self, h1: np.ndarray, h2: np.ndarray) -> None:
        sid = shard_of(h1, self.num_shards)
        for s in np.unique(sid):
            m = sid == s
            self.shards[int(s)].update_hashes(h1[m], h2[m])

    def probe_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        sid = shard_of(h1, self.num_shards)
        out = np.zeros(len(h1), dtype=bool)
        for s in np.unique(sid):
            m = sid == s
            out[m] = self.shards[int(s)].probe_hashes(h1[m], h2[m])
        return out

    def update_column(self, col) -> None:
        h1, h2 = hash_pair(col, algo=self.hash_algo, seeds=self.seeds)
        self.update_hashes(h1, h2)

    def probe_column(self, col) -> np.ndarray:
        h1, h2 = hash_pair(col, algo=self.hash_algo, seeds=self.seeds)
        return self.probe_hashes(h1, h2)

    def merge(self, other: "PartitionedBloom") -> "PartitionedBloom":
        if self.num_shards != other.num_shards:
            raise ValueError("shard count mismatch")
        for a, b in zip(self.shards, other.shards):
            a.merge(b)
        return self

    @property
    def count(self) -> int:
        return sum(s.count for s in self.shards)

    @property
    def total_bits(self) -> int:
        return sum(s.m for s in self.shards)

    def to_bytes(self) -> bytes:
        meta = {
            "capacity": self.capacity,
            "fp_rate": self.fp_rate,
            "num_shards": self.num_shards,
            "hash_algo": self.hash_algo,
            "seeds": list(self.seeds),
        }
        return pack_state(self.kind, meta, [s.to_bytes() for s in self.shards])

    @classmethod
    def from_bytes(cls, blob: bytes) -> "PartitionedBloom":
        kind, meta, arrays = unpack_state(blob)
        assert kind == cls.kind
        sk = cls.__new__(cls)
        sk.capacity = meta["capacity"]
        sk.fp_rate = meta["fp_rate"]
        sk.num_shards = meta["num_shards"]
        sk.hash_algo = meta["hash_algo"]
        sk.seeds = tuple(meta["seeds"])
        sk.shards = [BloomSketch.from_bytes(a) for a in arrays]
        return sk


register_sketch(BloomSketch.kind, BloomSketch)
register_sketch(PartitionedBloom.kind, PartitionedBloom)
