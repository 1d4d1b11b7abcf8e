"""Deduplication pipelines over a document table.

All Ray-Data-first (SURVEY.md §2.4 "Set ops / dedup" + task mandate), designed so
no stage makes a Python call per GROUP (Ray's ``map_groups`` costs a UDF call per
group — fatal when most groups are singletons, which is the dedup regime):

- **exact_dedup**: vectorized xxh64 content fingerprint → native
  ``groupby(fp).aggregate(Min(id))`` (Arrow-vectorized) → hash **join** of the
  winner ids back to the input. Shuffled payload: fingerprints + ids, then one
  row per survivor.
- **minhash_lsh_dedup**: word-shingle → n_perm MinHash (vectorized: one hash pass
  over every shingle of the batch, ``(a·h+b) mod M61`` permutations,
  ``minimum.reduceat`` per doc) → band-salted bucket key (NARROW: two int64s per
  (doc, band) — signatures never cross the wire) → native count → hot buckets
  broadcast → candidate collect → **exact n-gram Jaccard verify** on just the
  candidates' texts → min-label union-find.
- **simhash_dedup**: 64-bit SimHash, 4×16-bit band buckets (pigeonhole: Hamming ≤3
  ⟹ some band equal), hot buckets via native count, exact Hamming verify.
- **embedding_cosine_dedup**: random-hyperplane bucket key → hot buckets via
  native count → within-bucket cosine verify ≥ threshold.

The Bloom anti-join (probe.py) complements these: a key reported absent is
DEFINITELY new (no false negatives) — exact-negative dedup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from raysketch.hashing import hash_column, xxh64_vec

_MERSENNE61 = np.uint64((1 << 61) - 1)


def _clusters_from_edges(edges: list[tuple[int, int]]) -> pa.Table:
    """Union-find min-label clustering of a (small, verified) edge list."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    members = sorted({x for e in edges for x in e})
    return pa.table(
        {
            "doc_id": pa.array(members, pa.int64()),
            "cluster_id": pa.array([find(m) for m in members], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 16,
    strategy: str = "auto",
):
    """Keep exactly one row (the minimum ``id_col``) per distinct ``text_col``.

    Winner selection is a native (Arrow-vectorized) ``groupby(fp).min(id)`` over
    narrow (fp, id) rows — document bodies never enter the shuffle. The winner
    rows are then recovered either by a broadcast id filter (``strategy="broadcast"``,
    right when the winner-id list fits the object store comfortably) or a hash
    join (``strategy="join"``, the 10^9+-winners regime). ``auto`` picks broadcast
    under 5M winners. 64-bit fingerprint collisions are ~n²/2⁶⁵ — negligible below
    ~10⁹ docs; use a 128-bit fingerprint pair beyond that."""
    from ray.data.aggregate import Min

    def add_fp(batch: pa.Table) -> pa.Table:
        h = hash_column(batch.column(text_col).combine_chunks(), algo="xxh64", seed=0)
        return pa.table(
            {"__fp": pa.array(h.astype(np.int64)), id_col: batch.column(id_col)}
        )

    winners = (
        ds.map_batches(add_fp, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__fp")
        .aggregate(Min(id_col, alias_name="__winner"))
        .select_columns(["__winner"])
        .map_batches(
            lambda b: pa.table({id_col: b.column("__winner")}), batch_format="pyarrow"
        )
    )
    if strategy == "auto":
        winners = winners.materialize()
        strategy = "broadcast" if winners.count() <= 5_000_000 else "join"
    if strategy == "broadcast":
        import ray

        ids = np.sort(
            np.array([r[id_col] for r in winners.take_all()], dtype=np.int64)
        )
        ref = ray.put(ids)

        def keep_winners(batch: pa.Table) -> pa.Table:
            w = ray.get(ref)
            vals = np.asarray(batch.column(id_col))
            idx = np.clip(np.searchsorted(w, vals), 0, len(w) - 1)
            return batch.filter(pa.array(w[idx] == vals))

        return ds.map_batches(keep_winners, batch_format="pyarrow", zero_copy_batch=True)
    return ds.join(winners, "inner", num_partitions, on=(id_col,))


# ---------------------------------------------------------------------------
# shingles + minhash
# ---------------------------------------------------------------------------


_SHINGLE_P = np.uint64(0x100000001B3)  # FNV-ish odd multiplier for position mixing
_EMPTY_DOC_HASH = np.uint64(0xEF46DB3751D8E999)  # xxh64(b"", 0)


def _token_hashes(texts: pa.Array, seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Whitespace-token xxh64 hashes for every doc, fully vectorized: Arrow
    ``utf8_split_whitespace`` (C tokenizer) → one hash pass over the flat token
    buffer → empty tokens dropped. Returns ``(token_hashes, doc_token_offsets)``."""
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lists = pc.utf8_split_whitespace(texts)
    offs = np.asarray(lists.offsets).astype(np.int64)
    flat = lists.values
    from raysketch.hashing import column_spans

    data, starts, lengths = column_spans(flat)
    nonempty = lengths > 0
    th_all = xxh64_vec(data, starts, lengths, seed)
    # robust per-doc nonempty counts (reduceat mishandles empty segments)
    cs = np.zeros(len(nonempty) + 1, dtype=np.int64)
    np.cumsum(nonempty, out=cs[1:])
    d = cs[offs[1:]] - cs[offs[:-1]]
    doc_offs = np.zeros(len(d) + 1, dtype=np.int64)
    np.cumsum(d, out=doc_offs[1:])
    return th_all[nonempty], doc_offs


def _word_shingle_hashes(texts: pa.Array, k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """All word k-shingle fingerprints of every doc in ONE vectorized pass.

    A shingle's fingerprint is an order-sensitive mix of its k token hashes
    (``acc = acc·P + rotl(t, 13·pos)``) — the shingle *set* is isomorphic to the
    string-shingle set up to 64-bit collisions, with zero per-doc Python.
    Returns ``(hashes, doc_offsets)``; doc i owns ``hashes[off[i]:off[i+1]]``.
    Docs with 0 < tokens < k contribute one shingle over their tokens; empty
    docs one constant."""
    th, doc_offs = _token_hashes(texts)
    d = np.diff(doc_offs)
    ndoc = len(d)
    s = np.where(d > 0, np.maximum(d - k + 1, 1), 1)
    out_offs = np.zeros(ndoc + 1, dtype=np.int64)
    np.cumsum(s, out=out_offs[1:])
    out = np.empty(out_offs[-1], dtype=np.uint64)
    T = len(th)

    def _mix(arrays: list[np.ndarray]) -> np.ndarray:
        acc = np.zeros(len(arrays[0]), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for pos, t in enumerate(arrays):
                r = np.uint64((13 * pos + 7) % 64)
                acc = acc * _SHINGLE_P + ((t << r) | (t >> np.uint64(64 - int(r))))
        return acc

    # full-width shingles: start j valid iff j and j+k-1 fall in the same doc
    if T >= k:
        docid = np.repeat(np.arange(ndoc, dtype=np.int64), d)
        shifted = [th[pos : T - k + 1 + pos] for pos in range(k)]
        valid = docid[: T - k + 1] == docid[k - 1 :]
        sh = _mix(shifted)[valid]
    else:
        sh = np.empty(0, dtype=np.uint64)
    is_short = d < k  # includes empty docs
    out_short = np.repeat(is_short, s)
    out[~out_short] = sh
    # short docs: one shingle over their <k tokens (vector gathers per length)
    if is_short.any():
        short_vals = np.full(int(is_short.sum()), _EMPTY_DOC_HASH, dtype=np.uint64)
        short_docs = np.nonzero(is_short)[0]
        short_d = d[short_docs]
        for dl in range(1, k):
            m = short_d == dl
            if not m.any():
                continue
            tok0 = doc_offs[short_docs[m]]
            short_vals[m] = _mix([th[tok0 + pos] for pos in range(dl)])
        out[out_short] = short_vals
    return out, out_offs


def minhash_signatures(texts: pa.Array, n_perm: int = 128, k: int = 3, seed: int = 7) -> np.ndarray:
    """(n_docs, n_perm) uint64 MinHash signatures."""
    hashes, offsets = _word_shingle_hashes(texts, k)
    n_docs = len(offsets) - 1
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_MERSENNE61), size=n_perm, dtype=np.uint64)
    b = rng.integers(0, int(_MERSENNE61), size=n_perm, dtype=np.uint64)
    sig = np.empty((n_docs, n_perm), dtype=np.uint64)
    starts = offsets[:-1]
    with np.errstate(over="ignore"):
        h61 = hashes % _MERSENNE61
        for p in range(n_perm):
            perm = (a[p] * h61 + b[p]) % _MERSENNE61
            sig[:, p] = np.minimum.reduceat(perm, starts) if len(perm) else 0
    empty = offsets[1:] == offsets[:-1]
    if empty.any():
        sig[empty] = np.iinfo(np.uint64).max
    return sig


def signature_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> np.ndarray:
    return (sig_a == sig_b).mean(axis=-1)


def _band_keys(sig: np.ndarray, bands: int) -> np.ndarray:
    """(n_docs, bands) int64 band-salted bucket keys (xxh64 of each band's rows;
    the band index is folded into the seed so one ``key`` column suffices)."""
    n, n_perm = sig.shape
    rows_per_band = n_perm // bands
    keys = np.empty((n, bands), dtype=np.int64)
    for bnd in range(bands):
        seg = np.ascontiguousarray(sig[:, bnd * rows_per_band : (bnd + 1) * rows_per_band])
        raw = seg.view(np.uint8).reshape(n, -1)
        starts = np.arange(n, dtype=np.int64) * raw.shape[1]
        lengths = np.full(n, raw.shape[1], dtype=np.int64)
        keys[:, bnd] = xxh64_vec(raw.ravel(), starts, lengths, 1000 + bnd).astype(np.int64)
    return keys


def _hot_bucket_members(band_rows, id_col: str, extra_cols: tuple[str, ...] = ()) -> pd.DataFrame:
    """Native count-agg over bucket keys → broadcast hot keys → collect only the
    rows that land in buckets with ≥2 members (the candidate set).

    ``band_rows`` is materialized because it feeds two consumers (the count-agg
    and the hot filter). Scale note: at 10^12 docs the materialized band rows are
    ~bands×16 B/doc of object-store/spill footprint; if that is too much, drop the
    materialize and let Ray recompute the (cheap, map-only) band stage for the
    second pass — storage vs. recompute, both correct."""
    from ray.data.aggregate import Count

    import ray

    band_rows = band_rows.materialize()
    counts = band_rows.groupby("key").aggregate(Count(alias_name="n"))
    hot = counts.filter(expr="n > 1")
    hot_keys = np.array([r["key"] for r in hot.select_columns(["key"]).take_all()], dtype=np.int64)
    if len(hot_keys) == 0:
        return pd.DataFrame(columns=["key", id_col, *extra_cols])
    hot_keys.sort()
    ref = ray.put(hot_keys)

    def keep_hot(batch: pa.Table) -> pa.Table:
        hk = ray.get(ref)
        keys = np.asarray(batch.column("key"))
        idx = np.searchsorted(hk, keys)
        idx = np.clip(idx, 0, len(hk) - 1)
        return batch.filter(pa.array(hk[idx] == keys))

    members = band_rows.map_batches(keep_hot, batch_format="pyarrow", zero_copy_batch=True)
    return members.to_pandas()


def _pairs_from_members(members: pd.DataFrame, id_col: str, max_bucket: int = 256) -> set[tuple[int, int]]:
    pairs: set[tuple[int, int]] = set()
    for _, grp in members.groupby("key"):
        ids = np.unique(grp[id_col].to_numpy())
        if len(ids) < 2:
            continue
        if len(ids) > max_bucket:
            ids = ids[:max_bucket]  # degenerate bucket cap (logged upstream)
        for i in range(len(ids) - 1):
            for j in range(i + 1, len(ids)):
                pairs.add((int(ids[i]), int(ids[j])))
    return pairs


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
    """Near-duplicate clustering: returns ``(doc_id, cluster_id)`` (cluster_id =
    min member id) for every doc in a verified near-dup cluster.

    Verification is EXACT n-gram Jaccard ≥ threshold on the candidates' texts
    (fetched for candidates only via broadcast semi-join), so LSH affects recall
    but never precision."""

    def bandrows(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).combine_chunks()
        ids = np.asarray(batch.column(id_col))
        sig = minhash_signatures(texts, n_perm, shingle_k, seed)
        keys = _band_keys(sig, bands)
        return pa.table(
            {
                "key": pa.array(keys.ravel()),
                id_col: pa.array(np.repeat(ids, bands)),
            }
        )

    band_rows = ds.select_columns([id_col, text_col]).map_batches(
        bandrows, batch_format="pyarrow", zero_copy_batch=True
    )
    members = _hot_bucket_members(band_rows, id_col)
    pairs = _pairs_from_members(members, id_col)
    if not pairs:
        return pa.table({"doc_id": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.int64())})

    # fetch candidate texts only (broadcast semi-join on ids), verify exactly
    from raysketch.pipeline.probe import exact_semi_join

    cand_ids = sorted({x for p in pairs for x in p})
    cand = exact_semi_join(ds.select_columns([id_col, text_col]), cand_ids, id_col).take_all()
    text_of = {r[id_col]: r[text_col] for r in cand}
    verified = [
        (a, b) for a, b in pairs if ngram_jaccard(text_of[a], text_of[b], shingle_k) >= threshold
    ]
    return _clusters_from_edges(verified)


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def simhash64(texts: pa.Array, seed: int = 0) -> np.ndarray:
    """64-bit SimHash over word tokens: sign-sum of token-hash bit columns.
    Fully vectorized (Arrow tokenizer + one hash pass); the bit loop keeps
    temporaries 1-D (cumsum segment sums), avoiding (T, 64) matrices."""
    th, doc_offs = _token_hashes(texts, seed)
    ndoc = len(doc_offs) - 1
    fingerprints = np.zeros(ndoc, dtype=np.uint64)
    if len(th) == 0:
        return fingerprints
    cs = np.empty(len(th) + 1, dtype=np.int64)
    for b in range(64):
        contrib = (2 * ((th >> np.uint64(b)) & np.uint64(1)).astype(np.int64)) - 1
        cs[0] = 0
        np.cumsum(contrib, out=cs[1:])
        sums = cs[doc_offs[1:]] - cs[doc_offs[:-1]]
        fingerprints |= (sums > 0).astype(np.uint64) << np.uint64(b)
    empty = doc_offs[1:] == doc_offs[:-1]
    fingerprints[empty] = 0
    return fingerprints


def hamming64(a: np.ndarray, b) -> np.ndarray:
    x = np.bitwise_xor(a, b)
    cnt = np.zeros(np.shape(x), dtype=np.int64)
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
    """Near-dup clusters by SimHash: 4×16-bit band buckets (pigeonhole-complete for
    Hamming ≤ 3), hot buckets via native count, exact Hamming verify."""

    def bandrows(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).combine_chunks()
        ids = np.asarray(batch.column(id_col))
        fp = simhash64(texts, seed)
        keys = np.empty((len(ids), 4), dtype=np.int64)
        for bnd in range(4):
            keys[:, bnd] = (
                ((fp >> np.uint64(16 * bnd)) & np.uint64(0xFFFF)).astype(np.int64)
                | (np.int64(bnd + 1) << np.int64(48))
            )
        return pa.table(
            {
                "key": pa.array(keys.ravel()),
                id_col: pa.array(np.repeat(ids, 4)),
                "fp": pa.array(np.repeat(fp, 4).astype(np.int64)),
            }
        )

    band_rows = ds.select_columns([id_col, text_col]).map_batches(
        bandrows, batch_format="pyarrow", zero_copy_batch=True
    )
    members = _hot_bucket_members(band_rows, id_col, extra_cols=("fp",))
    edges: set[tuple[int, int]] = set()
    for _, grp in members.groupby("key"):
        grp = grp.drop_duplicates(subset=id_col).sort_values(id_col)
        ids = grp[id_col].to_numpy()
        fp = grp["fp"].to_numpy().astype(np.uint64)
        for i in range(len(ids) - 1):
            hd = hamming64(fp[i + 1 :], fp[i])
            for hj in np.nonzero(hd <= max_hamming)[0]:
                edges.add((int(ids[i]), int(ids[i + 1 + hj])))
    return _clusters_from_edges(sorted(edges))


# ---------------------------------------------------------------------------
# exact n-gram jaccard (the verification oracle for the LSH path)
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
    """(n, d) float matrix from an Arrow list<float> column — zero-copy reshape of
    the flat values buffer (fixed-length lists)."""
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
) -> pa.Table:
    """Near-dup clusters among embeddings: random-hyperplane LSH bucket key, hot
    buckets via native count, exact cosine ≥ threshold verify. Output column names
    are (doc_id, cluster_id) for uniformity."""

    def bucket(batch: pa.Table) -> pa.Table:
        V = embedding_matrix(batch.column(emb_col)).astype(np.float64)
        d = V.shape[1]
        P = np.random.default_rng(seed).normal(size=(d, n_planes))
        signs = (V @ P) > 0
        key = np.zeros(len(V), dtype=np.int64)
        for b in range(n_planes):
            key |= signs[:, b].astype(np.int64) << b
        return pa.table({"key": pa.array(key), id_col: batch.column(id_col)})

    band_rows = ds.select_columns([id_col, emb_col]).map_batches(
        bucket, batch_format="pyarrow", zero_copy_batch=True
    )
    members = _hot_bucket_members(band_rows, id_col)
    pairs = _pairs_from_members(members, id_col)
    if not pairs:
        return pa.table({"doc_id": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.int64())})

    from raysketch.pipeline.probe import exact_semi_join

    cand_ids = sorted({x for p in pairs for x in p})
    cand = exact_semi_join(ds.select_columns([id_col, emb_col]), cand_ids, id_col).take_all()
    vec_of = {r[id_col]: np.asarray(r[emb_col], dtype=np.float64) for r in cand}
    verified = []
    for a, b in pairs:
        va, vb = vec_of[a], vec_of[b]
        cos = float(va @ vb / max(np.linalg.norm(va) * np.linalg.norm(vb), 1e-12))
        if cos >= threshold:
            verified.append((a, b))
    return _clusters_from_edges(verified)
