"""Deterministic mergeable weighted sample without replacement.

Efraimidis–Spirakis A-ES keys (Inf. Process. Lett. 97(5), 2006 — public) with
HASH-DERIVED uniforms: item x with weight w > 0 gets key

    key(x) = ln(u_x) / w,   u_x = (xxh64(x, seed) + 0.5) / 2^64 ∈ (0, 1)

and the sample is the k items with the LARGEST keys (ln(u)/w is monotone in
the classical u^(1/w)). Because u_x is a fixed function of the VALUE, the
sample is a deterministic function of the weighted multiset: merges (top-k of
a union) are bitwise partition- and order-independent — the distributed build
equals the single-process build exactly, which the tests assert. Over the
seed ensemble the inclusion probabilities are those of A-ES weighted sampling
without replacement; for a FIXED seed it is one reproducible realization
(the same trade hash-based consistent sampling always makes).

Absent in the reference; the weighted companion of [[reservoir.py]]'s uniform
sample — the standard tool for weight-proportional data mixing.

Value-type restriction: sampled VALUES are serialized as JSON inside the state
blob, so values must be JSON-encodable scalars (int / float / str / bool).
Binary (bytes) value columns are rejected at update time with a clear error —
use a string or integer surrogate key for opaque payloads.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raysketch.sketches.base import pack_state, register_sketch, unpack_state


class WeightedReservoir:
    kind = "wreservoir"

    def __init__(self, k: int = 1000, seed: int = 0):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        self.seed = int(seed)
        # items: list of (key, value, weight), kept sorted by (-key, value)
        self.items: list = []
        self.n_seen = 0

    def _keys(self, values: pa.Array, weights: np.ndarray) -> np.ndarray:
        from raysketch.hashing import hash_column

        h = hash_column(values, algo="xxh64", seed=self.seed).astype(np.uint64)
        u = (h.astype(np.float64) + 0.5) / 18446744073709551616.0
        with np.errstate(divide="ignore"):
            return np.log(u) / weights

    def update_columns(self, values: pa.Array, weights) -> None:
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        w = np.asarray(weights, dtype=np.float64)
        if len(values) == 0:
            return
        if not bool(np.all(w > 0)):  # also rejects NaN, which fails both <= and >
            raise ValueError("weights must be > 0")
        if pa.types.is_binary(values.type) or pa.types.is_large_binary(values.type):
            # to_bytes JSON-encodes values; bytes would fail there, long after
            # the build started — reject up front (see module docstring)
            raise TypeError(
                "WeightedReservoir values must be JSON-encodable scalars "
                "(int/float/str/bool); got a binary column — sample a surrogate key instead"
            )
        key = self._keys(values, w)
        n = len(key)
        self.n_seen += n
        # batch-side top-k before touching Python objects
        if n > self.k:
            top = np.argpartition(-key, self.k - 1)[: self.k]
        else:
            top = np.arange(n)
        vals = values.take(pa.array(top)).to_pylist()
        cand = list(zip(key[top].tolist(), vals, w[top].tolist()))
        self._absorb(cand)

    def _absorb(self, cand: list) -> None:
        merged = sorted(self.items + cand, key=lambda t: (-t[0], t[1]))
        self.items = merged[: self.k]

    def merge(self, other: "WeightedReservoir") -> "WeightedReservoir":
        if self.k != other.k or self.seed != other.seed:
            raise ValueError("weighted reservoir config mismatch")
        self._absorb(list(other.items))
        self.n_seen += other.n_seen
        return self

    def sample(self) -> list:
        return [v for _, v, _ in self.items]

    def sample_rows(self) -> list:
        return [(v, w) for _, v, w in self.items]

    @property
    def size_bytes(self) -> int:
        # key + weight floats plus the value payload (strings at their encoded
        # length; numeric/bool values as 8-byte scalars)
        payload = sum(len(v.encode()) if isinstance(v, str) else 8 for _, v, _ in self.items)
        return 16 * len(self.items) + payload

    def to_bytes(self) -> bytes:
        meta = {
            "k": self.k,
            "seed": self.seed,
            "n_seen": self.n_seen,
            "items": [[float(a), v, float(w)] for a, v, w in self.items],
        }
        return pack_state(self.kind, meta, [])

    @classmethod
    def from_bytes(cls, blob: bytes) -> "WeightedReservoir":
        kind, meta, _ = unpack_state(blob)
        assert kind == cls.kind
        sk = cls(meta["k"], meta["seed"])
        sk.items = [(a, v, w) for a, v, w in meta["items"]]
        sk.n_seen = meta["n_seen"]
        return sk


register_sketch(WeightedReservoir.kind, WeightedReservoir)
