"""KLL — quantile sketch (Karnin, Lang, Liberty 2016; see PAPERS.md: KLL± VLDB 2021,
EDBT 2023 experimental study). Compactor-array implementation: level ℓ holds items of
weight 2^ℓ; when a level exceeds its capacity ``max(2, ceil(k·c^(H−ℓ)))`` (c = 2/3)
it is sorted and every other item (random offset) is promoted to level ℓ+1.

Absent in the reference, required by the north rule. Merge = level-wise concatenation
+ compaction (estimate-equal within the published rank-error bound ~O(1/k)).
Randomness is a per-instance seeded generator → deterministic given insertion order.
"""

from __future__ import annotations

import math

import numpy as np

from raysketch.sketches.base import pack_state, register_sketch, unpack_state

_C = 2.0 / 3.0


class KLL:
    kind = "kll"

    def __init__(self, k: int = 200, seed: int = 42):
        self.k = int(k)
        self.seed = int(seed)
        self._rng = np.random.default_rng(seed)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.total = 0
        self.min = math.inf
        self.max = -math.inf

    def _capacity(self, level: int) -> int:
        height = len(self.levels) - 1
        return max(2, math.ceil(self.k * (_C ** (height - level))))

    def update(self, values) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        self.total += len(v)
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compact()

    def _compact(self) -> None:
        while True:
            for lvl in range(len(self.levels)):
                if len(self.levels[lvl]) > self._capacity(lvl):
                    arr = np.sort(self.levels[lvl], kind="stable")
                    off = int(self._rng.integers(0, 2))
                    promoted = arr[off::2]
                    self.levels[lvl] = np.empty(0, dtype=np.float64)
                    if lvl + 1 >= len(self.levels):
                        self.levels.append(np.empty(0, dtype=np.float64))
                    self.levels[lvl + 1] = np.concatenate([self.levels[lvl + 1], promoted])
                    break
            else:
                return

    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        vals, wts = [], []
        for lvl, arr in enumerate(self.levels):
            if len(arr):
                vals.append(arr)
                wts.append(np.full(len(arr), 2**lvl, dtype=np.float64))
        if not vals:
            return np.empty(0), np.empty(0)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float) -> float:
        v, w = self._weighted_items()
        if len(v) == 0:
            return math.nan
        cumw = np.cumsum(w)
        target = min(max(q, 0.0), 1.0) * cumw[-1]
        i = int(np.searchsorted(cumw, target, side="left"))
        i = min(i, len(v) - 1)
        return float(v[i])

    def quantiles(self, qs) -> np.ndarray:
        v, w = self._weighted_items()
        if len(v) == 0:
            return np.full(len(list(qs)), math.nan)
        cumw = np.cumsum(w)
        out = []
        for q in qs:
            target = min(max(q, 0.0), 1.0) * cumw[-1]
            i = min(int(np.searchsorted(cumw, target, side="left")), len(v) - 1)
            out.append(v[i])
        return np.array(out)

    def rank(self, x: float) -> float:
        """Estimated fraction of items ≤ x."""
        v, w = self._weighted_items()
        if len(v) == 0:
            return math.nan
        i = np.searchsorted(v, x, side="right")
        return float(w[:i].sum() / w.sum())

    def merge(self, other: "KLL") -> "KLL":
        if self.k != other.k:
            raise ValueError("KLL k mismatch")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for lvl, arr in enumerate(other.levels):
            if len(arr):
                self.levels[lvl] = np.concatenate([self.levels[lvl], arr])
        self.total += other.total
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        self._compact()
        return self

    @property
    def size_bytes(self) -> int:
        return sum(a.nbytes for a in self.levels)

    def to_bytes(self) -> bytes:
        meta = {
            "k": self.k,
            "seed": self.seed,
            "total": self.total,
            "min": None if math.isinf(self.min) else self.min,
            "max": None if math.isinf(self.max) else self.max,
            "nlevels": len(self.levels),
        }
        return pack_state(self.kind, meta, [a.tobytes() for a in self.levels])

    @classmethod
    def from_bytes(cls, blob: bytes) -> "KLL":
        kind, meta, arrays = unpack_state(blob)
        assert kind == cls.kind
        sk = cls(meta["k"], meta["seed"])
        sk.total = meta["total"]
        sk.min = math.inf if meta["min"] is None else meta["min"]
        sk.max = -math.inf if meta["max"] is None else meta["max"]
        sk.levels = [np.frombuffer(a, dtype=np.float64).copy() for a in arrays]
        if not sk.levels:
            sk.levels = [np.empty(0, dtype=np.float64)]
        return sk


register_sketch(KLL.kind, KLL)
