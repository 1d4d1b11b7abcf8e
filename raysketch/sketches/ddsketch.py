"""DDSketch — fully-mergeable quantile sketch with RELATIVE-error guarantee
(Masson, Rim, Lee — "DDSketch: A Fast and Fully-Mergeable Quantile Sketch with
Relative-Error Guarantees", VLDB 2019; retrieved in PAPERS.md).

Values are placed in log-γ buckets (γ = (1+α)/(1−α)); the estimate for any
quantile is the bucket midpoint ``2γ^i/(γ+1)``, which is within relative error α
of the true value. Negative values use a mirrored store; zeros a counter.
Merge = bucket-wise count addition (exact — the merged sketch equals the sketch
of the concatenated stream). Bucket collapse (lowest indices folded together)
bounds memory at ``max_buckets`` per store, preserving the guarantee for
quantiles above the collapsed mass (per the paper).
"""

from __future__ import annotations

import math

import numpy as np

from raysketch.sketches.base import pack_state, register_sketch, unpack_state


class DDSketch:
    kind = "ddsketch"

    def __init__(self, alpha: float = 0.01, max_buckets: int = 2048):
        if not (0 < alpha < 1):
            raise ValueError("alpha must be in (0, 1)")
        self.alpha = float(alpha)
        self.gamma = (1 + alpha) / (1 - alpha)
        self._log_gamma = math.log(self.gamma)
        self.max_buckets = int(max_buckets)
        self.pos: dict[int, int] = {}  # bucket index -> count (x > 0)
        self.neg: dict[int, int] = {}  # mirrored for x < 0 (index of |x|)
        self.zero_count = 0
        self.total = 0

    # -- update ------------------------------------------------------------------

    def _indices(self, x: np.ndarray) -> np.ndarray:
        return np.ceil(np.log(x) / self._log_gamma).astype(np.int64)

    def update(self, values) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        self.total += len(v)
        self.zero_count += int((v == 0).sum())
        for store, vals in ((self.pos, v[v > 0]), (self.neg, -v[v < 0])):
            if len(vals) == 0:
                continue
            idx, counts = np.unique(self._indices(vals), return_counts=True)
            for i, c in zip(idx.tolist(), counts.tolist()):
                store[i] = store.get(i, 0) + c
            self._collapse(store)

    def _collapse(self, store: dict[int, int]) -> None:
        while len(store) > self.max_buckets:
            keys = sorted(store)
            lo, lo2 = keys[0], keys[1]
            store[lo2] += store.pop(lo)

    # -- query -------------------------------------------------------------------

    def _bucket_value(self, i: int) -> float:
        return 2.0 * (self.gamma**i) / (self.gamma + 1)

    def quantile(self, q: float) -> float:
        if self.total == 0:
            return math.nan
        q = min(max(q, 0.0), 1.0)
        rank = q * (self.total - 1)
        # ascending order: negatives (most negative first), zeros, positives
        acc = 0
        for i in sorted(self.neg, reverse=True):
            acc += self.neg[i]
            if acc > rank:
                return -self._bucket_value(i)
        acc += self.zero_count
        if acc > rank:
            return 0.0
        for i in sorted(self.pos):
            acc += self.pos[i]
            if acc > rank:
                return self._bucket_value(i)
        return self._bucket_value(max(self.pos)) if self.pos else 0.0

    def quantiles(self, qs) -> np.ndarray:
        return np.array([self.quantile(q) for q in qs])

    # -- merge / serialize -------------------------------------------------------

    def merge(self, other: "DDSketch") -> "DDSketch":
        if abs(self.alpha - other.alpha) > 1e-12 or self.max_buckets != other.max_buckets:
            raise ValueError("DDSketch parameter mismatch")
        for store, ostore in ((self.pos, other.pos), (self.neg, other.neg)):
            for i, c in ostore.items():
                store[i] = store.get(i, 0) + c
            self._collapse(store)
        self.zero_count += other.zero_count
        self.total += other.total
        return self

    @property
    def size_bytes(self) -> int:
        return 16 * (len(self.pos) + len(self.neg)) + 16

    def to_bytes(self) -> bytes:
        meta = {
            "alpha": self.alpha,
            "max_buckets": self.max_buckets,
            "zero_count": self.zero_count,
            "total": self.total,
        }
        pk = np.array(sorted(self.pos), dtype=np.int64)
        pv = np.array([self.pos[i] for i in pk.tolist()], dtype=np.int64)
        nk = np.array(sorted(self.neg), dtype=np.int64)
        nv = np.array([self.neg[i] for i in nk.tolist()], dtype=np.int64)
        return pack_state(
            self.kind, meta, [pk.tobytes(), pv.tobytes(), nk.tobytes(), nv.tobytes()]
        )

    @classmethod
    def from_bytes(cls, blob: bytes) -> "DDSketch":
        kind, meta, arrays = unpack_state(blob)
        assert kind == cls.kind
        sk = cls(meta["alpha"], meta["max_buckets"])
        sk.zero_count = meta["zero_count"]
        sk.total = meta["total"]
        pk = np.frombuffer(arrays[0], dtype=np.int64)
        pv = np.frombuffer(arrays[1], dtype=np.int64)
        nk = np.frombuffer(arrays[2], dtype=np.int64)
        nv = np.frombuffer(arrays[3], dtype=np.int64)
        sk.pos = dict(zip(pk.tolist(), pv.tolist()))
        sk.neg = dict(zip(nk.tolist(), nv.tolist()))
        return sk


register_sketch(DDSketch.kind, DDSketch)
