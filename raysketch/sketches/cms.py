"""Count-min sketch — frequency estimation (Cormode & Muthukrishnan 2005).

Absent in the reference, required by the north rule. Row hashes come from the same
Kirsch–Mitzenmacher double-hashing discipline the reference's Bloom filter uses
(row j probes ``(h1 + j·h2) mod width``), which preserves the CMS guarantees.
Overestimate-only; error ≤ ε·N with probability ≥ 1−δ where ε = e/width,
δ = e^−depth. Merge = element-wise add.
"""

from __future__ import annotations

import math

import numpy as np

from raysketch.hashing import CLASSIC_SEEDS, hash_pair
from raysketch.sketches.base import pack_state, register_sketch, unpack_state

_U32 = np.uint32


class CountMinSketch:
    kind = "cms"

    def __init__(
        self,
        width: int | None = None,
        depth: int | None = None,
        eps: float | None = None,
        delta: float | None = None,
        hash_algo: str = "xxh64",
        seeds: tuple[int, int] = CLASSIC_SEEDS,
    ):
        if width is None:
            eps = eps if eps is not None else 1e-4
            width = math.ceil(math.e / eps)
        if depth is None:
            delta = delta if delta is not None else 1e-3
            depth = math.ceil(math.log(1.0 / delta))
        self.width = int(width)
        self.depth = int(depth)
        self.hash_algo = hash_algo
        self.seeds = tuple(seeds)
        self.table = np.zeros((self.depth, self.width), dtype=np.int64)
        self.total = 0  # N — total weight added

    @property
    def eps(self) -> float:
        return math.e / self.width

    @property
    def delta(self) -> float:
        return math.exp(-self.depth)

    def _row(self, h1: np.ndarray, h2: np.ndarray, j: int) -> np.ndarray:
        """Row-j column indices via KM double hashing with uint32 wrap — a 1-D
        temporary per depth row (multi-MB 2-D temps are up to 100× slower inside
        Ray workers; see CLAUDE.md)."""
        with np.errstate(over="ignore"):
            g = h1 + np.uint32(j) * h2
        pos = g.astype(np.int64)
        pos %= self.width
        return pos

    def update_hashes(self, h1: np.ndarray, h2: np.ndarray, weights=None) -> None:
        n = len(h1)
        if n == 0:
            return
        h1 = h1.astype(np.uint32, copy=False)
        h2 = h2.astype(np.uint32, copy=False)
        if weights is None:
            w = np.ones(n, dtype=np.int64)
        else:
            w = np.asarray(weights, dtype=np.int64)
        for j in range(self.depth):
            # bincount-based scatter-add: faster than np.add.at for large n
            self.table[j] += np.bincount(
                self._row(h1, h2, j), weights=w, minlength=self.width
            ).astype(np.int64)
        self.total += int(w.sum())

    def query_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        h1 = h1.astype(np.uint32, copy=False)
        h2 = h2.astype(np.uint32, copy=False)
        est = self.table[0][self._row(h1, h2, 0)]
        for j in range(1, self.depth):
            np.minimum(est, self.table[j][self._row(h1, h2, j)], out=est)
        return est

    def update_column(self, col, weights=None) -> None:
        h1, h2 = hash_pair(col, algo=self.hash_algo, seeds=self.seeds)
        self.update_hashes(h1, h2, weights)

    def query_column(self, col) -> np.ndarray:
        h1, h2 = hash_pair(col, algo=self.hash_algo, seeds=self.seeds)
        return self.query_hashes(h1, h2)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (self.width, self.depth, self.hash_algo, self.seeds) != (
            other.width,
            other.depth,
            other.hash_algo,
            other.seeds,
        ):
            raise ValueError("CMS parameter mismatch")
        self.table += other.table
        self.total += other.total
        return self

    @property
    def size_bytes(self) -> int:
        return self.table.nbytes

    def to_bytes(self) -> bytes:
        meta = {
            "width": self.width,
            "depth": self.depth,
            "hash_algo": self.hash_algo,
            "seeds": list(self.seeds),
            "total": self.total,
        }
        return pack_state(self.kind, meta, [self.table.tobytes()])

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CountMinSketch":
        kind, meta, arrays = unpack_state(blob)
        assert kind == cls.kind
        sk = cls.__new__(cls)
        sk.width = meta["width"]
        sk.depth = meta["depth"]
        sk.hash_algo = meta["hash_algo"]
        sk.seeds = tuple(meta["seeds"])
        sk.total = meta["total"]
        sk.table = (
            np.frombuffer(arrays[0], dtype=np.int64).reshape(sk.depth, sk.width).copy()
        )
        return sk


register_sketch(CountMinSketch.kind, CountMinSketch)
