"""Deduplication pipelines over a document table.

All Ray-Data-first (SURVEY.md §2.4 "Set ops / dedup" + task mandate):

- **exact_dedup**: vectorized xxh64 content fingerprint → ``groupby(fingerprint)``
  → keep the min-id row per group. The only row shuffle is over the (tiny)
  fingerprint column + id, not document bodies, when ``payload=False``.
- **minhash_lsh_dedup**: word-shingle → n_perm MinHash (vectorized: one hash pass
  over every shingle of the batch, ``(a·h+b)`` permutations, ``minimum.reduceat``
  per doc) → band → ``groupby(band, band_hash)`` candidate buckets → signature-
  Jaccard verify → min-label clustering.
- **simhash_dedup**: 64-bit SimHash per doc, Hamming-≤r candidates via 4×16-bit
  band buckets, verified by exact Hamming distance.
- **ngram_jaccard_verify**: exact shingle-set Jaccard for candidate pairs.
- **embedding_cosine_dedup**: random-hyperplane bucket (embedding SimHash) →
  within-bucket cosine verify ≥ threshold.

The Bloom anti-join (probe.py) complements these: a key reported absent is
DEFINITELY new (no false negatives) — the exact-negative dedup of SURVEY.md §2.4.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raysketch.hashing import column_spans, hash_column, murmur3_32_vec, xxh64_vec

_MERSENNE61 = np.uint64((1 << 61) - 1)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Keep exactly one row (the minimum ``id_col``) per distinct ``text_col``.

    Hash-partitioned: rows are grouped by the 64-bit content fingerprint, so equal
    texts co-locate; within a group the min-id row survives. Collision probability
    at 64 bits is ~n²/2⁶⁵ — negligible below ~10⁹ docs; use a 128-bit pair of
    fingerprints beyond that."""

    def add_fp(batch: pa.Table) -> pa.Table:
        h = hash_column(batch.column(text_col).combine_chunks(), algo="xxh64", seed=0)
        return batch.append_column("__fp", pa.array(h.astype(np.int64)))  # groupby-friendly

    def keep_first(group: pa.Table) -> pa.Table:
        ids = np.asarray(group.column(id_col))
        return group.take([int(np.argmin(ids))]).drop_columns(["__fp"])

    return (
        ds.map_batches(add_fp, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__fp")
        .map_groups(keep_first, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# shingles + minhash
# ---------------------------------------------------------------------------


def _word_shingle_hashes(texts: pa.Array, k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """All word k-shingles of every doc, hashed (xxh64) in ONE vectorized pass.

    Returns ``(hashes, doc_offsets)`` with doc i owning
    ``hashes[doc_offsets[i]:doc_offsets[i+1]]``. Tokenization is the only per-doc
    Python; hashing is batched over the concatenated shingle bytes."""
    tok_lists = [t.split() if t else [] for t in texts.to_pylist()]
    shingles: list[bytes] = []
    counts = np.zeros(len(tok_lists) + 1, dtype=np.int64)
    for i, toks in enumerate(tok_lists):
        if len(toks) >= k:
            sh = [" ".join(toks[j : j + k]).encode() for j in range(len(toks) - k + 1)]
        elif toks:
            sh = [" ".join(toks).encode()]
        else:
            sh = [b""]
        shingles.extend(sh)
        counts[i + 1] = len(sh)
    offsets = np.cumsum(counts)
    lengths = np.fromiter((len(s) for s in shingles), count=len(shingles), dtype=np.int64)
    starts = np.zeros(len(shingles), dtype=np.int64)
    if len(shingles) > 1:
        np.cumsum(lengths[:-1], out=starts[1:])
    data = np.frombuffer(b"".join(shingles), dtype=np.uint8)
    return xxh64_vec(data, starts, lengths, 0), offsets


def minhash_signatures(texts: pa.Array, n_perm: int = 128, k: int = 3, seed: int = 7) -> np.ndarray:
    """(n_docs, n_perm) uint64 MinHash signatures via universal-hash permutations
    ``(a·h + b) mod 2⁶¹−1`` and a per-permutation ``minimum.reduceat`` over each
    doc's shingle segment."""
    hashes, offsets = _word_shingle_hashes(texts, k)
    n_docs = len(offsets) - 1
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_MERSENNE61), size=n_perm, dtype=np.uint64)
    b = rng.integers(0, int(_MERSENNE61), size=n_perm, dtype=np.uint64)
    sig = np.empty((n_docs, n_perm), dtype=np.uint64)
    starts = offsets[:-1]
    with np.errstate(over="ignore"):
        h61 = hashes % _MERSENNE61
        for p in range(n_perm):  # n_perm vector ops over all shingles of the batch
            perm = (a[p] * h61 + b[p]) % _MERSENNE61
            sig[:, p] = np.minimum.reduceat(perm, starts) if len(perm) else 0
    empty = offsets[1:] == offsets[:-1]
    if empty.any():
        sig[empty] = np.iinfo(np.uint64).max
    return sig


def signature_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> np.ndarray:
    """Estimated Jaccard = fraction of agreeing MinHash coordinates."""
    return (sig_a == sig_b).mean(axis=-1)


def minhash_lsh_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 3,
    threshold: float = 0.8,
    seed: int = 7,
) -> pa.Table:
    """Near-duplicate clustering. Returns a small table ``(doc_id, cluster_id)``
    for every doc that belongs to a near-dup cluster (cluster_id = min doc_id).

    Stages: signature+band rows per doc (flat_map shape) → groupby(band, key) →
    candidate pairs verified by signature Jaccard ≥ threshold → min-label
    union-find on the (small) verified edge list."""
    rows_per_band = n_perm // bands

    def sig_and_bands(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).combine_chunks()
        ids = np.asarray(batch.column(id_col))
        sig = minhash_signatures(texts, n_perm, shingle_k, seed)
        n = len(ids)
        # band key = xxh64 of the band's row bytes
        band_ids = np.repeat(np.arange(bands, dtype=np.int32), n)
        doc_ids = np.tile(ids, bands)
        keys = np.empty(bands * n, dtype=np.uint64)
        sig_views = []
        for bnd in range(bands):
            seg = np.ascontiguousarray(sig[:, bnd * rows_per_band : (bnd + 1) * rows_per_band])
            raw = seg.view(np.uint8).reshape(n, -1)
            data = raw.ravel()
            starts = np.arange(n, dtype=np.int64) * raw.shape[1]
            lengths = np.full(n, raw.shape[1], dtype=np.int64)
            keys[bnd * n : (bnd + 1) * n] = xxh64_vec(data, starts, lengths, 0)
            sig_views.append(seg)
        sig_blobs = [sig[i].tobytes() for i in range(n)]
        return pa.table(
            {
                "band": pa.array(band_ids),
                "key": pa.array(keys.astype(np.int64)),
                id_col: pa.array(np.tile(ids, bands)),
                "sig": pa.array(sig_blobs * bands, type=pa.binary()),
            }
        )

    band_rows = ds.select_columns([id_col, text_col]).map_batches(
        sig_and_bands, batch_format="pyarrow", zero_copy_batch=True
    )

    def candidate_pairs(group: pa.Table) -> pa.Table:
        if group.num_rows < 2:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        ids = np.asarray(group.column(id_col))
        order = np.argsort(ids)
        ids = ids[order]
        sigs = np.stack(
            [np.frombuffer(group.column("sig")[int(i)].as_py(), dtype=np.uint64) for i in order]
        )
        # verify all pairs in the bucket against the anchor-min doc and each other
        a_out, b_out = [], []
        for i in range(len(ids) - 1):
            jac = signature_jaccard(sigs[i + 1 :], sigs[i])
            hits = np.nonzero(jac >= threshold)[0]
            for h in hits:
                a_out.append(int(ids[i]))
                b_out.append(int(ids[i + 1 + h]))
        return pa.table({"a": pa.array(a_out, pa.int64()), "b": pa.array(b_out, pa.int64())})

    edges = band_rows.groupby(["band", "key"]).map_groups(candidate_pairs, batch_format="pyarrow")
    edge_rows = edges.take_all()  # verified near-dup edges — small relative to corpus
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for r in edge_rows:
        ra, rb = find(r["a"]), find(r["b"])
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    members = sorted({x for r in edge_rows for x in (r["a"], r["b"])})
    return pa.table(
        {
            id_col: pa.array(members, pa.int64()),
            "cluster_id": pa.array([find(m) for m in members], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def simhash64(texts: pa.Array, seed: int = 0) -> np.ndarray:
    """64-bit SimHash over word tokens: sign-sum of token-hash bit columns."""
    tok_lists = [t.split() if t else [] for t in texts.to_pylist()]
    all_toks: list[bytes] = []
    counts = np.zeros(len(tok_lists) + 1, dtype=np.int64)
    for i, toks in enumerate(tok_lists):
        all_toks.extend(t.encode() for t in toks)
        counts[i + 1] = len(toks)
    offsets = np.cumsum(counts)
    if not all_toks:
        return np.zeros(len(tok_lists), dtype=np.uint64)
    lengths = np.fromiter((len(t) for t in all_toks), count=len(all_toks), dtype=np.int64)
    starts = np.zeros(len(all_toks), dtype=np.int64)
    np.cumsum(lengths[:-1], out=starts[1:])
    data = np.frombuffer(b"".join(all_toks), dtype=np.uint8)
    th = xxh64_vec(data, starts, lengths, seed)
    # bits → ±1 contributions, summed per doc per bit position
    bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int32
    )
    contrib = 2 * bits - 1
    sums = np.add.reduceat(contrib, offsets[:-1], axis=0)
    empty = offsets[1:] == offsets[:-1]
    out = (sums > 0).astype(np.uint64)
    fingerprints = np.zeros(len(tok_lists), dtype=np.uint64)
    for b in range(64):
        fingerprints |= out[:, b] << np.uint64(b)
    fingerprints[empty] = 0
    return fingerprints


def hamming64(a: np.ndarray, b) -> np.ndarray:
    x = np.bitwise_xor(a, b)
    cnt = np.zeros(a.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    return cnt


def simhash_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    seed: int = 0,
) -> pa.Table:
    """Near-dup pairs by SimHash: 4×16-bit band buckets guarantee any pair with
    Hamming ≤ 3 shares at least one band (pigeonhole); verified exactly within
    buckets. Returns ``(doc_id, cluster_id)``."""

    def sim_and_bands(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).combine_chunks()
        ids = np.asarray(batch.column(id_col))
        fp = simhash64(texts, seed)
        n = len(ids)
        band_ids = np.repeat(np.arange(4, dtype=np.int32), n)
        keys = np.concatenate(
            [((fp >> np.uint64(16 * bnd)) & np.uint64(0xFFFF)).astype(np.int64) for bnd in range(4)]
        )
        return pa.table(
            {
                "band": pa.array(band_ids),
                "key": pa.array(keys),
                id_col: pa.array(np.tile(ids, 4)),
                "fp": pa.array(np.tile(fp, 4).astype(np.int64)),
            }
        )

    band_rows = ds.select_columns([id_col, text_col]).map_batches(
        sim_and_bands, batch_format="pyarrow", zero_copy_batch=True
    )

    def pairs(group: pa.Table) -> pa.Table:
        if group.num_rows < 2:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        ids = np.asarray(group.column(id_col))
        order = np.argsort(ids)
        ids = ids[order]
        fp = np.asarray(group.column("fp"))[order].astype(np.uint64)
        a_out, b_out = [], []
        for i in range(len(ids) - 1):
            hd = hamming64(fp[i + 1 :], fp[i])
            for h in np.nonzero(hd <= max_hamming)[0]:
                a_out.append(int(ids[i]))
                b_out.append(int(ids[i + 1 + h]))
        return pa.table({"a": pa.array(a_out, pa.int64()), "b": pa.array(b_out, pa.int64())})

    edges = band_rows.groupby(["band", "key"]).map_groups(pairs, batch_format="pyarrow")
    edge_rows = edges.take_all()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for r in edge_rows:
        ra, rb = find(r["a"]), find(r["b"])
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    members = sorted({x for r in edge_rows for x in (r["a"], r["b"])})
    return pa.table(
        {
            id_col: pa.array(members, pa.int64()),
            "cluster_id": pa.array([find(m) for m in members], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# exact n-gram jaccard (verification oracle for the LSH path)
# ---------------------------------------------------------------------------


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    ta, tb = text_a.split(), text_b.split()
    sa = {" ".join(ta[i : i + k]) for i in range(max(1, len(ta) - k + 1))}
    sb = {" ".join(tb[i : i + k]) for i in range(max(1, len(tb) - k + 1))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


# ---------------------------------------------------------------------------
# embedding near-dup
# ---------------------------------------------------------------------------


def embedding_matrix(col) -> np.ndarray:
    """(n, d) float32 matrix from an Arrow list<float> column — zero-copy reshape
    of the flat values buffer (assumes fixed-length lists)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    values = np.asarray(col.values)
    offs = np.asarray(col.offsets)
    widths = np.diff(offs)
    d = int(widths[0]) if len(widths) else 0
    if len(widths) and not (widths == d).all():
        raise ValueError("embedding lists must be fixed-length")
    base = int(offs[0]) if len(offs) else 0
    return values[base : base + len(col) * d].reshape(len(col), d)


def embedding_cosine_dedup(
    ds,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 16,
    seed: int = 5,
    dim: int | None = None,
) -> pa.Table:
    """Near-dup pairs among embeddings: random-hyperplane LSH bucket (n_planes-bit
    key) then exact cosine ≥ threshold within buckets. Returns (id, cluster_id)."""
    rng = np.random.default_rng(seed)
    planes_by_dim: dict[int, np.ndarray] = {}

    def bucket(batch: pa.Table) -> pa.Table:
        V = embedding_matrix(batch.column(emb_col))
        d = V.shape[1]
        if d not in planes_by_dim:
            planes_by_dim[d] = np.random.default_rng(seed).normal(size=(d, n_planes))
        P = planes_by_dim[d]
        signs = (V @ P) > 0
        key = np.zeros(len(V), dtype=np.int64)
        for b in range(n_planes):
            key |= signs[:, b].astype(np.int64) << b
        norms = np.linalg.norm(V, axis=1, keepdims=True)
        Vn = V / np.maximum(norms, 1e-12)
        return pa.table(
            {
                "key": pa.array(key),
                id_col: batch.column(id_col),
                "vec": pa.array(list(Vn.astype(np.float32))),
            }
        )

    buckets = ds.select_columns([id_col, emb_col]).map_batches(
        bucket, batch_format="pyarrow", zero_copy_batch=True
    )

    def pairs(group: pa.Table) -> pa.Table:
        if group.num_rows < 2:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        ids = np.asarray(group.column(id_col))
        order = np.argsort(ids)
        ids = ids[order]
        V = embedding_matrix(group.column("vec"))[order]
        sims = V @ V.T
        a_idx, b_idx = np.nonzero(np.triu(sims >= threshold, k=1))
        return pa.table(
            {"a": pa.array(ids[a_idx], pa.int64()), "b": pa.array(ids[b_idx], pa.int64())}
        )

    edges = buckets.groupby("key").map_groups(pairs, batch_format="pyarrow")
    edge_rows = edges.take_all()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for r in edge_rows:
        ra, rb = find(r["a"]), find(r["b"])
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    members = sorted({x for r in edge_rows for x in (r["a"], r["b"])})
    return pa.table(
        {
            id_col: pa.array(members, pa.int64()),
            "cluster_id": pa.array([find(m) for m in members], pa.int64()),
        }
    )
