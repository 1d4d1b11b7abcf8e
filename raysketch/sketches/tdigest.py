"""t-digest — quantile sketch (Dunning & Ertl, "Computing extremely accurate
quantiles using t-digests"). Merging-digest variant with the k1 scale function,
vectorized: incoming values are buffered, and compression assigns sorted points to
clusters by integer k-index (``floor(k1(q))``) and reduces each cluster to a weighted
centroid with one ``np.add.reduceat`` pass — no per-centroid Python loop.

Absent in the reference, required by the north rule. Merge = concatenate centroid
sets + recompress (estimate-equal, not bitwise: the digest family is order-sensitive
within its error bound — see SURVEY.md §5 test plan).
"""

from __future__ import annotations

import math

import numpy as np

from raysketch.sketches.base import pack_state, register_sketch, unpack_state

_BUFFER_CAP = 65536


class TDigest:
    kind = "tdigest"

    def __init__(self, compression: float = 200.0):
        self.compression = float(compression)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._buf: list[np.ndarray] = []
        self._buf_n = 0
        self.total = 0.0
        self.min = math.inf
        self.max = -math.inf

    # -- k1 scale function: k(q) = δ/(2π)·asin(2q−1) ------------------------------

    def _k(self, q: np.ndarray) -> np.ndarray:
        return self.compression / (2 * math.pi) * np.arcsin(np.clip(2 * q - 1, -1, 1))

    def update(self, values) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        self.total += len(v)
        self._buf.append(v)
        self._buf_n += len(v)
        if self._buf_n >= _BUFFER_CAP:
            self._compress()

    def _compress(self, force: bool = False) -> None:
        # invariant: self.means is sorted outside of this call; update() only
        # appends to the buffer, merge() concatenates then forces a compress
        if not force and self._buf_n == 0:
            return
        vals = [self.means] + self._buf
        wts = [self.weights] + [np.ones(len(b)) for b in self._buf]
        m = np.concatenate(vals)
        w = np.concatenate(wts)
        self._buf = []
        self._buf_n = 0
        if len(m) == 0:
            return
        order = np.argsort(m, kind="stable")
        m = m[order]
        w = w[order]
        W = w.sum()
        cumw = np.cumsum(w)
        q_mid = (cumw - w / 2) / W
        kidx = np.floor(self._k(q_mid)).astype(np.int64)
        # cluster boundaries where the k-index changes
        starts = np.nonzero(np.diff(kidx, prepend=kidx[0] - 1))[0]
        cw = np.add.reduceat(w, starts)
        cm = np.add.reduceat(m * w, starts) / cw
        self.means = cm
        self.weights = cw

    def quantile(self, q: float) -> float:
        self._compress()
        if len(self.means) == 0:
            return math.nan
        if len(self.means) == 1:
            return float(self.means[0])
        q = min(max(q, 0.0), 1.0)
        W = self.weights.sum()
        target = q * W
        cumw = np.cumsum(self.weights) - self.weights / 2
        if target <= cumw[0]:
            # interpolate between min and first centroid
            frac = target / max(cumw[0], 1e-300)
            return float(self.min + frac * (self.means[0] - self.min))
        if target >= cumw[-1]:
            denom = max(W - cumw[-1], 1e-300)
            frac = (target - cumw[-1]) / denom
            return float(self.means[-1] + frac * (self.max - self.means[-1]))
        i = np.searchsorted(cumw, target) - 1
        span = cumw[i + 1] - cumw[i]
        frac = (target - cumw[i]) / max(span, 1e-300)
        return float(self.means[i] + frac * (self.means[i + 1] - self.means[i]))

    def quantiles(self, qs) -> np.ndarray:
        return np.array([self.quantile(q) for q in qs])

    def cdf(self, x: float) -> float:
        self._compress()
        if len(self.means) == 0:
            return math.nan
        W = self.weights.sum()
        cumw = np.cumsum(self.weights) - self.weights / 2
        return float(np.interp(x, self.means, cumw / W, left=0.0, right=1.0))

    def merge(self, other: "TDigest") -> "TDigest":
        if self.compression != other.compression:
            raise ValueError("t-digest compression mismatch")
        other._compress()
        if len(other.means):
            self.means = np.concatenate([self.means, other.means])
            self.weights = np.concatenate([self.weights, other.weights])
        self.total += other.total
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        self._compress(force=True)
        return self

    @property
    def size_bytes(self) -> int:
        return self.means.nbytes + self.weights.nbytes

    def to_bytes(self) -> bytes:
        self._compress()
        meta = {
            "compression": self.compression,
            "total": self.total,
            "min": None if math.isinf(self.min) else self.min,
            "max": None if math.isinf(self.max) else self.max,
        }
        return pack_state(self.kind, meta, [self.means.tobytes(), self.weights.tobytes()])

    @classmethod
    def from_bytes(cls, blob: bytes) -> "TDigest":
        kind, meta, arrays = unpack_state(blob)
        assert kind == cls.kind
        sk = cls(meta["compression"])
        sk.total = meta["total"]
        sk.min = math.inf if meta["min"] is None else meta["min"]
        sk.max = -math.inf if meta["max"] is None else meta["max"]
        sk.means = np.frombuffer(arrays[0], dtype=np.float64).copy()
        sk.weights = np.frombuffer(arrays[1], dtype=np.float64).copy()
        return sk


register_sketch(TDigest.kind, TDigest)
