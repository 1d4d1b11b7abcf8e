"""HyperLogLog — distinct-count sketch (Flajolet, Fusy, Gandouet, Meunier 2007).

Absent in the reference, required by the north rule (BASELINE.json): same mergeable
UDAF shape as the Bloom filter (SURVEY.md §2.4 "Aggregations"). 64-bit hash variant
(no large-range correction needed); small-range linear counting per the paper.
Merge = element-wise register max. Standard error σ = 1.04/√m.
"""

from __future__ import annotations

import math

import numpy as np

from raysketch.hashing import hash_column
from raysketch.sketches.base import pack_state, register_sketch, unpack_state

_U64 = np.uint64


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (no float round-off near 2^53+)."""
    x = x.copy()
    bl = np.zeros(x.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        t = x >> _U64(s)
        m = t != 0
        bl += s * m
        x = np.where(m, t, x)
    bl += x != 0
    return bl


class HyperLogLog:
    kind = "hll"

    def __init__(self, precision: int = 14, hash_algo: str = "xxh64", seed: int = 0):
        if not (4 <= precision <= 18):
            raise ValueError("precision must be in [4, 18]")
        self.p = precision
        self.m = 1 << precision
        self.hash_algo = hash_algo
        self.seed = seed
        self.registers = np.zeros(self.m, dtype=np.uint8)

    @property
    def rel_error(self) -> float:
        return 1.04 / math.sqrt(self.m)

    def update_hashes(self, h: np.ndarray) -> None:
        """h: uint64 hash values, one per item."""
        h = h.astype(np.uint64, copy=False)
        idx = (h >> _U64(64 - self.p)).astype(np.int64)
        w = h << _U64(self.p)  # remaining q = 64-p bits, left-aligned
        # rank = leading zeros of w within the q-bit window, +1; w==0 → q+1
        rank = (64 - _bit_length_u64(w) + 1).astype(np.uint8)
        np.minimum(rank, 64 - self.p + 1, out=rank)
        np.maximum.at(self.registers, idx, rank)

    def update_column(self, col) -> None:
        self.update_hashes(hash_column(col, algo=self.hash_algo, seed=self.seed))

    def estimate(self) -> float:
        m = self.m
        if m >= 128:
            alpha = 0.7213 / (1 + 1.079 / m)
        elif m == 64:
            alpha = 0.709
        elif m == 32:
            alpha = 0.697
        else:
            alpha = 0.673
        regs = self.registers.astype(np.float64)
        e = alpha * m * m / np.sum(np.exp2(-regs))
        if e <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                return m * math.log(m / zeros)
        return float(e)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if (self.p, self.hash_algo, self.seed) != (other.p, other.hash_algo, other.seed):
            raise ValueError("HLL parameter mismatch")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    @property
    def size_bytes(self) -> int:
        return self.m

    def to_bytes(self) -> bytes:
        meta = {"p": self.p, "hash_algo": self.hash_algo, "seed": self.seed}
        return pack_state(self.kind, meta, [self.registers.tobytes()])

    @classmethod
    def from_bytes(cls, blob: bytes) -> "HyperLogLog":
        kind, meta, arrays = unpack_state(blob)
        assert kind == cls.kind
        sk = cls.__new__(cls)
        sk.p = meta["p"]
        sk.m = 1 << sk.p
        sk.hash_algo = meta["hash_algo"]
        sk.seed = meta["seed"]
        sk.registers = np.frombuffer(arrays[0], dtype=np.uint8).copy()
        return sk


register_sketch(HyperLogLog.kind, HyperLogLog)
