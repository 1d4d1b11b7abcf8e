"""Theta (KMV) sketch — distinct counting with SET ALGEBRA (union / intersection
/ difference estimates), after the K-Minimum-Values / theta-sketch construction
(Beyer et al. 2007 "On Synopses for Distinct-Value Estimation"; Dasgupta et al.
2016 theta-sketch framework — both public literature).

State: the k smallest 64-bit hashes below threshold θ (as a sorted uint64 array)
plus θ itself. Estimate = (|S|−1)/ρ(θ) for a full sketch (ρ = θ/2⁶⁴), |S| exact
while not full. Union: merge-keep-k-smallest (θ = min). Intersection/difference:
filter both sets below min θ — the classic set-operation capability Bloom filters
lack (SURVEY.md §2.4 "approximate intersect/except").

Relative standard error ≈ 1/√(k−1).
"""

from __future__ import annotations

import math

import numpy as np

from raysketch.hashing import hash_column
from raysketch.sketches.base import pack_state, register_sketch, unpack_state

_MAX64 = float(1 << 64)


class ThetaSketch:
    kind = "theta"

    def __init__(self, k: int = 4096, hash_algo: str = "xxh64", seed: int = 0):
        if k < 16:
            raise ValueError("k must be >= 16")
        self.k = int(k)
        self.hash_algo = hash_algo
        self.seed = seed
        self.values = np.empty(0, dtype=np.uint64)  # sorted distinct hashes < theta
        self.theta = np.uint64(0xFFFFFFFFFFFFFFFF)

    @property
    def rel_error(self) -> float:
        return 1.0 / math.sqrt(self.k - 1)

    def update_hashes(self, h: np.ndarray) -> None:
        h = np.unique(h.astype(np.uint64, copy=False))
        h = h[h < self.theta]
        if len(h) == 0:
            return
        merged = np.unique(np.concatenate([self.values, h]))
        if len(merged) > self.k:
            self.theta = merged[self.k]  # (k+1)-th smallest becomes the threshold
            merged = merged[: self.k]
        self.values = merged

    def update_column(self, col) -> None:
        self.update_hashes(hash_column(col, algo=self.hash_algo, seed=self.seed))

    def estimate(self) -> float:
        rho = float(self.theta) / _MAX64
        if rho >= 1.0:
            return float(len(self.values))  # not yet full → exact
        return (len(self.values)) / rho

    # -- set algebra ---------------------------------------------------------------

    def _check(self, other: "ThetaSketch") -> None:
        if (self.k, self.hash_algo, self.seed) != (other.k, other.hash_algo, other.seed):
            raise ValueError("theta sketch parameter mismatch")

    def merge(self, other: "ThetaSketch") -> "ThetaSketch":
        """Union (in place)."""
        self._check(other)
        theta = min(self.theta, other.theta)
        merged = np.unique(np.concatenate([self.values, other.values]))
        merged = merged[merged < theta]
        if len(merged) > self.k:
            theta = merged[self.k]
            merged = merged[: self.k]
        self.values = merged
        self.theta = theta
        return self

    def intersect_estimate(self, other: "ThetaSketch") -> float:
        self._check(other)
        theta = min(self.theta, other.theta)
        a = self.values[self.values < theta]
        b = other.values[other.values < theta]
        common = np.intersect1d(a, b, assume_unique=True)
        rho = float(theta) / _MAX64
        return len(common) / rho if rho < 1.0 else float(len(common))

    def difference_estimate(self, other: "ThetaSketch") -> float:
        """Estimate of |A \\ B|."""
        self._check(other)
        theta = min(self.theta, other.theta)
        a = self.values[self.values < theta]
        b = other.values[other.values < theta]
        only_a = np.setdiff1d(a, b, assume_unique=True)
        rho = float(theta) / _MAX64
        return len(only_a) / rho if rho < 1.0 else float(len(only_a))

    # -- serialize -----------------------------------------------------------------

    @property
    def size_bytes(self) -> int:
        return self.values.nbytes + 8

    def to_bytes(self) -> bytes:
        meta = {
            "k": self.k,
            "hash_algo": self.hash_algo,
            "seed": self.seed,
            "theta": int(self.theta),
        }
        return pack_state(self.kind, meta, [self.values.tobytes()])

    @classmethod
    def from_bytes(cls, blob: bytes) -> "ThetaSketch":
        kind, meta, arrays = unpack_state(blob)
        assert kind == cls.kind
        sk = cls(meta["k"], meta["hash_algo"], meta["seed"])
        sk.theta = np.uint64(meta["theta"])
        sk.values = np.frombuffer(arrays[0], dtype=np.uint64).copy()
        return sk


register_sketch(ThetaSketch.kind, ThetaSketch)
