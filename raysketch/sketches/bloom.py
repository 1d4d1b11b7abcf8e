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


_MASK_TABLE_SIZE = 4096  # entries; deterministic (seeded) — merges stay aligned
_MASK_TABLE_SEED = 0xB10F


def _make_mask_table(k: int, size: int = _MASK_TABLE_SIZE, seed: int = _MASK_TABLE_SEED) -> np.ndarray:
    """``size`` random 64-bit masks with exactly ``min(k, 64)`` bits set — the
    MaskTable of the patterned variant (bloom_filters.h:354-536 semantics,
    regenerated from a fixed seed rather than copied). Deterministic so that
    independently-built filters of equal geometry OR-merge correctly."""
    rng = np.random.default_rng(seed + k)
    kk = min(k, 64)
    table = np.zeros(size, dtype=np.uint64)
    for i in range(size):
        bits = rng.choice(64, size=kk, replace=False)
        table[i] = np.bitwise_or.reduce(np.uint64(1) << bits.astype(np.uint64))
    return table


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
        block_bits: int = 64,
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
            self.block_bits = 0
        elif algo == "blocked":
            # block_bits=64: the register-blocked variant (gloom.h:285-301);
            # block_bits=256: the cache-line BlockedBloomFilter layout
            # (bloom_filters.h:94-159) — h1 picks a 4-word block, every probe
            # stays inside those 32 bytes
            if block_bits not in (64, 256):
                raise ValueError("block_bits must be 64 or 256")
            self.block_bits = block_bits
            self.m = max(self.m, block_bits)
            self.m = ((self.m + block_bits - 1) // block_bits) * block_bits
            self._bits_u8 = None
            self._blocks = np.zeros(self.m // 64, dtype=np.uint64)
        elif algo == "patterned":
            # PatternedSimdBloomFilter / MaskTable (bloom_filters.h:354-536):
            # a precomputed table of k-bit 64-bit masks; h1 picks the block, h2
            # picks the mask — insert is ONE vectorized OR per row (no k-loop at
            # all), query one AND+compare. Trades a little FPR (mask reuse) for
            # the fewest memory ops of any variant.
            self.block_bits = 64
            self.m = max(self.m, 64)
            self._bits_u8 = None
            self._blocks = np.zeros(self.m // 64, dtype=np.uint64)
            self.mask_table = _make_mask_table(self.k)
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
            # probe-index loop keeps temporaries at n elements (KM double hashing:
            # probe i is (h1 + i·h2) with uint32 wraparound, then mod m)
            with np.errstate(over="ignore"):
                for i in range(self.k):
                    g = h1 + _U32(i) * h2
                    pos = g.astype(np.int64)
                    pos %= self.m
                    self._bits_u8[pos] = 1
        elif self.algo == "patterned":
            nblocks = len(self._blocks)
            idx = h1.astype(np.int64) % nblocks
            masks = self.mask_table[h2.astype(np.int64) % len(self.mask_table)]
            np.bitwise_or.at(self._blocks, idx, masks)
        elif self.block_bits == 64:
            idx, mask = self._block_masks(h1, h2)
            np.bitwise_or.at(self._blocks, idx, mask)
        else:
            # 256-bit block: probe i sets bit (h1 + i·h2) % 256 inside block h1
            nblocks = self.m // self.block_bits
            base = (h1.astype(np.int64) % nblocks) * (self.block_bits // 64)
            with np.errstate(over="ignore"):
                for i in range(1, max(2, self.k)):
                    bit = (h1 + _U32(i) * h2) & _U32(self.block_bits - 1)
                    word = base + (bit >> _U32(6)).astype(np.int64)
                    np.bitwise_or.at(
                        self._blocks, word, _U64(1) << (bit & _U32(63)).astype(np.uint64)
                    )
        self.count += n

    def probe_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        n = len(h1)
        if n == 0:
            return np.empty(0, dtype=bool)
        h1 = h1.astype(np.uint32, copy=False)
        h2 = h2.astype(np.uint32, copy=False)
        if self.algo == "classic":
            hits = np.ones(n, dtype=bool)
            with np.errstate(over="ignore"):
                for i in range(self.k):
                    g = h1 + _U32(i) * h2
                    pos = g.astype(np.int64)
                    pos %= self.m
                    hits &= self._bits_u8[pos].astype(bool)
            return hits
        if self.algo == "patterned":
            nblocks = len(self._blocks)
            idx = h1.astype(np.int64) % nblocks
            masks = self.mask_table[h2.astype(np.int64) % len(self.mask_table)]
            return (self._blocks[idx] & masks) == masks
        if self.block_bits == 64:
            idx, mask = self._block_masks(h1, h2)
            return (self._blocks[idx] & mask) == mask
        nblocks = self.m // self.block_bits
        base = (h1.astype(np.int64) % nblocks) * (self.block_bits // 64)
        hits = np.ones(n, dtype=bool)
        with np.errstate(over="ignore"):
            for i in range(1, max(2, self.k)):
                bit = (h1 + _U32(i) * h2) & _U32(self.block_bits - 1)
                word = base + (bit >> _U32(6)).astype(np.int64)
                hits &= (self._blocks[word] & (_U64(1) << (bit & _U32(63)).astype(np.uint64))) != 0
        return hits

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
        if (self.m, self.k, self.algo, self.hash_algo, self.seeds, getattr(self, "block_bits", 0)) != (
            other.m,
            other.k,
            other.algo,
            other.hash_algo,
            other.seeds,
            getattr(other, "block_bits", 0),
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

    @classmethod
    def probe_blob(cls, blob: bytes, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """Probe a serialized CLASSIC filter without deserializing it:
        ``from_bytes`` pays an 8x ``unpackbits`` expansion of the whole bit
        array (4.7 MB blob → 37 MB u8 array for a 10^9/256-shard geometry) —
        at GB-scale shard state that expansion dominates shard-routed probe
        wall time. Bits are serialized little-endian packed, so bit ``g``
        lives at ``raw[g >> 3]`` position ``g & 7``; the probe reads only the
        k x n touched bytes. Bitwise-identical to
        ``from_bytes(blob).probe_hashes(h1, h2)`` (tested)."""
        kind, meta, arrays = unpack_state(blob)
        assert kind == cls.kind
        if meta["algo"] != "classic":
            return cls.from_bytes(blob).probe_hashes(h1, h2)
        m, k = meta["m"], meta["k"]
        raw = np.frombuffer(arrays[0], dtype=np.uint8)
        n = len(h1)
        if n == 0:
            return np.empty(0, dtype=bool)
        h1 = h1.astype(np.uint32, copy=False)
        h2 = h2.astype(np.uint32, copy=False)
        hits = np.ones(n, dtype=bool)
        with np.errstate(over="ignore"):
            for i in range(k):
                g = h1 + _U32(i) * h2
                pos = g.astype(np.int64)
                pos %= m
                hits &= ((raw[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1).astype(bool)
        return hits

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

    def estimate_cardinality(self) -> float:
        """Swamidass–Baldi (2007) inserted-count estimate from the fill ratio:
        ``n̂ = −(m/k)·ln(1 − X)``. Exact-expectation for the classic uniform
        probe layout; for blocked/patterned layouts the uniformity assumption
        is approximate and the estimate skews with the extra collisions."""
        x = self.fill_ratio()
        if x >= 1.0:
            return float("inf")
        return -(self.m / self.k) * math.log1p(-x)

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
            "block_bits": self.block_bits,
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
        sk.block_bits = meta.get("block_bits", 64 if meta["algo"] in ("blocked", "patterned") else 0)
        if sk.algo == "patterned":
            sk.mask_table = _make_mask_table(sk.k)  # deterministic — not serialized
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
    merge is shard-wise OR, so associativity holds shard-by-shard.

    Representation: all shards share one geometry ``(m_shard, k)``, stored as a
    single flat bit array addressed ``shard·m_shard + (h1 + i·h2) % m_shard`` — so
    update/probe are ONE vectorized pass regardless of shard count (no per-shard
    Python loop; that loop was a 60× slowdown on small batches)."""

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
        if algo != "classic":
            raise ValueError("PartitionedBloom supports algo='classic' (blocked: use BloomSketch)")
        self.capacity = int(capacity)
        self.fp_rate = float(fp_rate)
        self.num_shards = num_shards
        self.algo = algo
        self.hash_algo = hash_algo
        self.seeds = tuple(seeds)
        per = max(1, math.ceil(capacity / num_shards))
        self.shard_capacity = per
        self.m_shard, self.k = bloom_geometry(per, fp_rate)
        # representation: one byte per bit (fast fancy-index scatter) while the
        # build array is modest; packed uint64 words (8x smaller, bitwise_or.at
        # scatter) for large filters. Serialized form is identical either way
        # (little-endian packed bits), so merge/checkpoint interop across reprs.
        total = self.m_shard * num_shards
        self._repr = "u8" if total <= (1 << 27) else "packed"
        if self._repr == "u8":
            self._bits_u8 = np.zeros(total, dtype=np.uint8)
            self._words = None
        else:
            self._bits_u8 = None
            self._words = np.zeros(total // 64, dtype=np.uint64)
        self.shard_counts = np.zeros(num_shards, dtype=np.int64)

    def update_hashes(self, h1: np.ndarray, h2: np.ndarray) -> None:
        n = len(h1)
        if n == 0:
            return
        h1 = h1.astype(np.uint32, copy=False)
        h2 = h2.astype(np.uint32, copy=False)
        sid = shard_of(h1, self.num_shards).astype(np.int64)
        # shard-ordered processing: the scatter touches one m_shard-sized region at
        # a time (cache-resident) instead of random-writing the whole array
        order = np.argsort(sid, kind="stable")
        h1o, h2o = h1[order], h2[order]
        base = sid[order] * self.m_shard
        # probe-index loop keeps temporaries at n elements (no (n,k) 2D arrays)
        with np.errstate(over="ignore"):
            for i in range(self.k):
                g = h1o + _U32(i) * h2o  # uint32 wrap (KM probe i)
                pos = g.astype(np.int64)
                pos %= self.m_shard
                pos += base
                if self._repr == "u8":
                    self._bits_u8[pos] = 1
                else:
                    word = pos >> 6
                    bit = _U64(1) << (pos & 63).astype(np.uint64)
                    np.bitwise_or.at(self._words, word, bit)
        self.shard_counts += np.bincount(sid, minlength=self.num_shards)

    def probe_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        n = len(h1)
        if n == 0:
            return np.empty(0, dtype=bool)
        h1 = h1.astype(np.uint32, copy=False)
        h2 = h2.astype(np.uint32, copy=False)
        sid = shard_of(h1, self.num_shards).astype(np.int64)
        order = np.argsort(sid, kind="stable")
        h1o, h2o = h1[order], h2[order]
        base = sid[order] * self.m_shard
        hits = np.ones(n, dtype=bool)
        with np.errstate(over="ignore"):
            for i in range(self.k):
                g = h1o + _U32(i) * h2o
                pos = g.astype(np.int64)
                pos %= self.m_shard
                pos += base
                if self._repr == "u8":
                    hits &= self._bits_u8[pos].astype(bool)
                else:
                    word = pos >> 6
                    bit = _U64(1) << (pos & 63).astype(np.uint64)
                    hits &= (self._words[word] & bit) != 0
        out = np.empty(n, dtype=bool)
        out[order] = hits
        return out

    def update_column(self, col) -> None:
        h1, h2 = hash_pair(col, algo=self.hash_algo, seeds=self.seeds)
        self.update_hashes(h1, h2)

    def probe_column(self, col) -> np.ndarray:
        h1, h2 = hash_pair(col, algo=self.hash_algo, seeds=self.seeds)
        return self.probe_hashes(h1, h2)

    def merge(self, other: "PartitionedBloom") -> "PartitionedBloom":
        if (self.num_shards, self.m_shard, self.k, self.hash_algo, self.seeds) != (
            other.num_shards,
            other.m_shard,
            other.k,
            other.hash_algo,
            other.seeds,
        ):
            raise ValueError("shard geometry mismatch")
        if self._repr == "u8":
            np.bitwise_or(self._bits_u8, other._bits_u8, out=self._bits_u8)
        else:
            np.bitwise_or(self._words, other._words, out=self._words)
        self.shard_counts += other.shard_counts
        return self

    # -- per-shard access (checkpointing / shuffle build assemble) ---------------

    def shard_sketch(self, sid: int) -> BloomSketch:
        """A standalone BloomSketch copy of one shard (for per-shard checkpoints)."""
        sk = BloomSketch(
            self.shard_capacity, self.fp_rate, algo="classic", hash_algo=self.hash_algo, seeds=self.seeds
        )
        assert (sk.m, sk.k) == (self.m_shard, self.k)
        if self._repr == "u8":
            sk._bits_u8[:] = self._bits_u8[sid * self.m_shard : (sid + 1) * self.m_shard]
        else:
            w = self.m_shard // 64
            words = self._words[sid * w : (sid + 1) * w]
            sk._bits_u8[:] = np.unpackbits(
                words.view(np.uint8), bitorder="little"
            )[: self.m_shard]
        sk.count = int(self.shard_counts[sid])
        return sk

    def set_shard(self, sid: int, sk: BloomSketch) -> None:
        if (sk.m, sk.k) != (self.m_shard, self.k):
            raise ValueError("shard geometry mismatch")
        if self._repr == "u8":
            self._bits_u8[sid * self.m_shard : (sid + 1) * self.m_shard] = sk._bits_u8
        else:
            w = self.m_shard // 64
            packed = np.packbits(sk._bits_u8, bitorder="little")
            self._words[sid * w : (sid + 1) * w] = packed.view(np.uint64)
        self.shard_counts[sid] = sk.count

    @property
    def count(self) -> int:
        return int(self.shard_counts.sum())

    @property
    def total_bits(self) -> int:
        return self.m_shard * self.num_shards

    def to_bytes(self) -> bytes:
        meta = {
            "capacity": self.capacity,
            "fp_rate": self.fp_rate,
            "num_shards": self.num_shards,
            "hash_algo": self.hash_algo,
            "seeds": list(self.seeds),
            "counts": self.shard_counts.tolist(),
        }
        if self._repr == "u8":
            packed = np.packbits(self._bits_u8, bitorder="little")
        else:
            packed = self._words.view(np.uint8)  # little-endian words == packed bits
        return pack_state(self.kind, meta, [packed.tobytes()])

    @classmethod
    def from_bytes(cls, blob: bytes) -> "PartitionedBloom":
        kind, meta, arrays = unpack_state(blob)
        assert kind == cls.kind
        sk = cls(
            meta["capacity"],
            meta["fp_rate"],
            num_shards=meta["num_shards"],
            hash_algo=meta["hash_algo"],
            seeds=tuple(meta["seeds"]),
        )
        raw = np.frombuffer(arrays[0], dtype=np.uint8)
        if sk._repr == "u8":
            sk._bits_u8 = np.unpackbits(raw, bitorder="little")[: sk.total_bits].copy()
        else:
            sk._words = raw.view(np.uint64).copy()
        sk.shard_counts = np.array(meta["counts"], dtype=np.int64)
        return sk

    @classmethod
    def merge_blobs(cls, blobs) -> bytes:
        """OR-merge serialized filters WITHOUT unpacking the bit arrays (the merge
        is bit-OR, which commutes with the packed representation) — the fan-in
        merge stage runs on m/8 bytes per blob instead of m."""
        it = iter(blobs)
        first = bytes(next(it))
        kind, meta, arrays = unpack_state(first)
        assert kind == cls.kind
        acc = np.frombuffer(arrays[0], dtype=np.uint8).copy()
        counts = np.array(meta["counts"], dtype=np.int64)
        for blob in it:
            kind2, meta2, arrays2 = unpack_state(bytes(blob))
            assert kind2 == cls.kind
            for key in ("capacity", "fp_rate", "num_shards", "hash_algo", "seeds"):
                if meta2[key] != meta[key]:
                    raise ValueError(f"merge_blobs geometry mismatch on {key}")
            np.bitwise_or(acc, np.frombuffer(arrays2[0], dtype=np.uint8), out=acc)
            counts += np.array(meta2["counts"], dtype=np.int64)
        meta["counts"] = counts.tolist()
        return pack_state(cls.kind, meta, [acc.tobytes()])


register_sketch(BloomSketch.kind, BloomSketch)
register_sketch(PartitionedBloom.kind, PartitionedBloom)
