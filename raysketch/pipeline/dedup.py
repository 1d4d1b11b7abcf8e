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
  broadcast → DISTRIBUTED pair emission per bucket block → Bloom-prefiltered
  hash joins attach candidate texts → **exact shingle-set Jaccard verify** in
  map_batches → distributed min-label propagation. No stage funnels candidates
  through the driver (web corpora are ~30% near-dup: candidates are O(dataset)).
- **simhash_dedup**: 64-bit SimHash, 4×16-bit band buckets (pigeonhole: Hamming ≤3
  ⟹ some band equal), hot buckets via native count, exact Hamming verify.
- **embedding_cosine_dedup**: random-hyperplane bucket key → hot buckets via
  native count → within-bucket cosine verify ≥ threshold.

The Bloom anti-join (probe.py) complements these: a key reported absent is
DEFINITELY new (no false negatives) — exact-negative dedup.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raysketch.hashing import hash_column, xxh64_vec
from raysketch.pipeline.contracts import require_non_null_ids

_MERSENNE61 = np.uint64((1 << 61) - 1)


def _clusters_from_edges(edges: list[tuple[int, int]]) -> pa.Table:
    """Union-find min-label clustering of a small edge list — the DRIVER-SIDE
    ORACLE used by tests to validate the distributed ``connected_components``;
    production pipelines use the distributed path."""
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

    Winner selection is ``groupby(fp).min(id)`` in spirit, computed WITHOUT the
    native aggregate: fingerprints are mostly singletons (dups are the rare
    case), and the hash aggregator's per-group machinery collapses on
    singleton-heavy keys (the r3 lesson — 147 s vs ~10 s on 20M keys,
    BASELINE.md). Instead: in-batch partial min (one row per distinct fp per
    block) → keyed HASH_SHUFFLE repartition → per-block final min. Bitwise-
    identical winners (min is associative; hash partitioning co-locates each
    fp). Document bodies never enter the shuffle. The winner rows are then
    recovered either by a broadcast id filter (``strategy="broadcast"``,
    right when the winner-id list fits the object store comfortably) or a hash
    join (``strategy="join"``, the 10^9+-winners regime). ``auto`` picks broadcast
    under 5M winners. 64-bit fingerprint collisions are ~n²/2⁶⁵ — negligible below
    ~10⁹ docs; use a 128-bit fingerprint pair beyond that."""

    def add_fp(batch: pa.Table) -> pa.Table:
        require_non_null_ids(batch, id_col, "exact_dedup")
        h = hash_column(batch.column(text_col).combine_chunks(), algo="xxh64", seed=0)
        return pa.table(
            {"__fp": pa.array(h.astype(np.int64)), id_col: batch.column(id_col)}
        )

    def block_min(batch: pa.Table) -> pa.Table:
        fp = np.asarray(batch.column("__fp"))
        ids = np.asarray(batch.column(id_col))
        order = np.lexsort((ids, fp))
        fps, idss = fp[order], ids[order]
        first = np.ones(len(fps), dtype=bool)
        first[1:] = fps[1:] != fps[:-1]
        return pa.table({"__fp": fps[first], id_col: idss[first]})

    pre = ds.map_batches(add_fp, batch_format="pyarrow", zero_copy_batch=True).map_batches(
        block_min, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    if pre.count() == 0:
        # ds.sort on an all-empty Dataset is undefined across Ray versions
        # (the _emit_pairs guard); empty input dedups to itself
        return ds
    # final min via the range-sort exchange (the r4 lesson: the keyed hash
    # repartition's aggregator machinery loses ~5x to ds.sort on singleton-
    # heavy keys). A fingerprint may straddle adjacent sorted blocks, so each
    # block emits its first/last fp's partial min flagged __edge; the driver
    # re-mins the <= 2-per-block edge rows exactly. Min-of-mins == global min,
    # so winners stay bitwise-identical to the hash-partitioned path.
    import ray as _ray

    def block_min_edge(batch: pa.Table) -> pa.Table:
        fp = np.asarray(batch.column("__fp"))
        ids = np.asarray(batch.column(id_col))
        if len(fp) == 0:
            return pa.table(
                {
                    "__fp": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    "__edge": pa.array([], pa.bool_()),
                }
            )
        order = np.lexsort((ids, fp))
        fps, idss = fp[order], ids[order]
        first = np.ones(len(fps), dtype=bool)
        first[1:] = fps[1:] != fps[:-1]
        uf, ui = fps[first], idss[first]
        edge = np.zeros(len(uf), dtype=bool)
        edge[0] = True
        edge[-1] = True
        return pa.table({"__fp": uf, id_col: ui, "__edge": pa.array(edge)})

    parts = (
        pre.sort("__fp")
        .map_batches(block_min_edge, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    edge_pdf = (
        parts.filter(expr="__edge == True").select_columns(["__fp", id_col]).to_pandas()
    )
    winners = parts.filter(expr="__edge == False").map_batches(
        lambda b: pa.table({id_col: b.column(id_col)}), batch_format="pyarrow"
    )
    if len(edge_pdf) > 0 and "__fp" in edge_pdf.columns:
        fix = edge_pdf.groupby("__fp", as_index=False)[id_col].min()
        winners = winners.union(
            _ray.data.from_arrow(
                pa.table({id_col: pa.array(fix[id_col].to_numpy(), pa.int64())})
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
    # skipped-empty keyed blocks are SCHEMA-LESS and Acero joins reject them
    # ("no match for FieldRef") — plain-repartition coalesce, as in _emit_pairs
    return ds.join(winners.repartition(num_blocks=num_partitions), "inner", num_partitions, on=(id_col,))


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
                # (64 - r) % 64 keeps the counter-shift < 64 when r == 0
                # (pos ≡ 29 mod 64): shifting a uint64 by 64 is C UB in numpy
                r = np.uint64((13 * pos + 7) % 64)
                acc = acc * _SHINGLE_P + ((t << r) | (t >> np.uint64((64 - int(r)) % 64)))
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


_PAIR_SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)


def _pairwise_jaccard(
    ha: np.ndarray, oa: np.ndarray, hb: np.ndarray, ob: np.ndarray, chunk_bytes: int = 4 << 20
) -> np.ndarray:
    """Exact set-Jaccard of segment i of (ha, oa) vs segment i of (hb, ob) for
    all i — ZERO per-pair Python (VERDICT r2 item 2).

    Kernel choice is MEASURED (BASELINE.md r3 notes, 20k pairs × ~100 shingles):
    padded row-wise ``np.sort(axis=1)`` runs 146k pairs/s vs 49k for the old
    per-pair ``np.unique``/``intersect1d`` loop and 1.6k (!) for a merged-global-
    lexsort formulation — at ~100-element segments, global n·log n sorts lose
    badly to row-parallel small sorts. Each side is padded to the chunk's max
    segment length with a sentinel, row-sorted, deduped in place (dup → sentinel
    → one more row sort), then the concatenated rows are row-sorted once more
    and intersections are adjacent-equal counts per row. Chunked so the 2-D
    temporaries stay ~``chunk_bytes`` (multi-MB 2-D temps measured up to 100×
    slower inside Ray workers). A genuine hash equal to the all-ones sentinel
    would be dropped (p = 2^-64 per shingle — ignored)."""
    n = len(oa) - 1
    if n == 0:
        return np.empty(0, dtype=np.float64)
    out = np.empty(n, dtype=np.float64)
    da, db = np.diff(oa), np.diff(ob)
    mmax = int(max(da.max(initial=0), db.max(initial=0), 1))
    rows_per_chunk = max(256, int(chunk_bytes // (16 * mmax)))

    def pad_sorted_unique(h, offs, d, lo, hi):
        rows = hi - lo
        dseg = d[lo:hi]
        m = int(max(dseg.max(initial=0), 1))
        P = np.full((rows, m), _PAIR_SENTINEL, dtype=np.uint64)
        s, e = int(offs[lo]), int(offs[hi])
        seg = h[s:e]
        ridx = np.repeat(np.arange(rows, dtype=np.int64), dseg)
        cidx = np.arange(len(seg), dtype=np.int64) - np.repeat(offs[lo:hi] - s, dseg)
        P[ridx, cidx] = seg
        P.sort(axis=1)
        dup = np.zeros((rows, m), dtype=bool)
        dup[:, 1:] = (P[:, 1:] == P[:, :-1]) & (P[:, 1:] != _PAIR_SENTINEL)
        if dup.any():
            P[dup] = _PAIR_SENTINEL
            P.sort(axis=1)
        cnt = (P != _PAIR_SENTINEL).sum(axis=1)
        return P, cnt

    for lo in range(0, n, rows_per_chunk):
        hi = min(lo + rows_per_chunk, n)
        A, na = pad_sorted_unique(ha, oa, da, lo, hi)
        B, nb = pad_sorted_unique(hb, ob, db, lo, hi)
        C = np.concatenate([A, B], axis=1)
        C.sort(axis=1)
        inter = ((C[:, 1:] == C[:, :-1]) & (C[:, 1:] != _PAIR_SENTINEL)).sum(axis=1)
        union = na + nb - inter
        out[lo:hi] = np.where(union == 0, 1.0, inter / np.maximum(union, 1))
    return out


def _sorted_unique_segments(h: np.ndarray, offs: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sort + dedup every segment of ``(h, offs)`` in ONE lexsort pass (no
    per-doc Python). Returns ``(values, seg_ids, per_seg_counts)``."""
    nseg = len(offs) - 1
    if len(h) == 0:
        return h, np.empty(0, dtype=np.int64), np.zeros(nseg, dtype=np.int64)
    d = np.diff(offs)
    seg = np.repeat(np.arange(nseg, dtype=np.int64), d)
    order = np.lexsort((h, seg))
    hs, ss = h[order], seg[order]
    keep = np.empty(len(hs), dtype=bool)
    keep[0] = True
    keep[1:] = (hs[1:] != hs[:-1]) | (ss[1:] != ss[:-1])
    hu, su = hs[keep], ss[keep]
    return hu, su, np.bincount(su, minlength=nseg)


def _pack_u64_binary(values: np.ndarray, counts: np.ndarray) -> pa.Array:
    """Pack segmented uint64 arrays into a pyarrow ``large_binary`` column
    (segment i gets ``counts[i]`` 8-byte little-endian words) — zero per-row
    Python. Always int64 offsets: immune to the 2 GiB int32-offset wrap, and
    — the real constraint — ONE type across every block of the column. A
    per-block size-triggered binary/large_binary promotion would hand
    downstream joins (the ``sh_a``/``sh_b`` payloads, line_dedup's
    ``__drop_blob``) blocks with conflicting schemas exactly in the regime
    the promotion targets. The 4 extra offset bytes/row are noise next to
    the multi-hundred-byte blobs the rows carry. Acero joins carry
    large_binary payloads (verified); ``_unpack_u64_binary`` reads both
    offset widths."""
    byte_offs = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts * 8, out=byte_offs[1:])
    return pa.Array.from_buffers(
        pa.large_binary(),
        len(counts),
        [None, pa.py_buffer(byte_offs.tobytes()), pa.py_buffer(np.ascontiguousarray(values).tobytes())],
    )


def _unpack_u64_binary(arr) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of ``_pack_u64_binary`` for a (possibly chunked / large_)binary
    column: one buffer copy, no per-row Python. Returns ``(values, offsets)``
    in the ``_word_shingle_hashes`` convention (offsets in u64 words)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_large_binary(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    bufs = arr.buffers()
    raw_offs = np.frombuffer(bufs[1], dtype=off_dtype)[arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    payload = data[raw_offs[0] : raw_offs[-1]]
    values = np.frombuffer(payload.tobytes(), dtype=np.uint64)
    return values, (raw_offs - raw_offs[0]) // 8


def _pairwise_jaccard_presorted(
    ha: np.ndarray, oa: np.ndarray, hb: np.ndarray, ob: np.ndarray, chunk_bytes: int = 4 << 20
) -> np.ndarray:
    """``_pairwise_jaccard`` for inputs whose segments are ALREADY sorted+unique
    (the packed-shingle-set payload path): skips both per-side row sorts and the
    dedup pass — one padded scatter per side (padding with the max-valued
    sentinel keeps rows sorted) + a single concatenated row sort."""
    n = len(oa) - 1
    if n == 0:
        return np.empty(0, dtype=np.float64)
    out = np.empty(n, dtype=np.float64)
    da, db = np.diff(oa), np.diff(ob)
    mmax = int(max(da.max(initial=0), db.max(initial=0), 1))
    rows_per_chunk = max(256, int(chunk_bytes // (16 * mmax)))

    def pad(h, offs, d, lo, hi):
        rows = hi - lo
        dseg = d[lo:hi]
        m = int(max(dseg.max(initial=0), 1))
        P = np.full((rows, m), _PAIR_SENTINEL, dtype=np.uint64)
        s, e = int(offs[lo]), int(offs[hi])
        seg = h[s:e]
        ridx = np.repeat(np.arange(rows, dtype=np.int64), dseg)
        cidx = np.arange(len(seg), dtype=np.int64) - np.repeat(offs[lo:hi] - s, dseg)
        P[ridx, cidx] = seg
        return P

    for lo in range(0, n, rows_per_chunk):
        hi = min(lo + rows_per_chunk, n)
        A, B = pad(ha, oa, da, lo, hi), pad(hb, ob, db, lo, hi)
        na, nb = da[lo:hi], db[lo:hi]
        C = np.concatenate([A, B], axis=1)
        C.sort(axis=1)
        inter = ((C[:, 1:] == C[:, :-1]) & (C[:, 1:] != _PAIR_SENTINEL)).sum(axis=1)
        union = na + nb - inter
        out[lo:hi] = np.where(union == 0, 1.0, inter / np.maximum(union, 1))
    return out


def _shingle_payload_map(text_col: str, id_col: str, shingle_k: int):
    """payload_map for ``_attach_pair_payload``: replace candidate texts with
    their packed sorted-unique shingle sets so (a) each candidate doc is
    shingled ONCE, not once per pair it appears in, and (b) the pair joins ship
    compact u×8-byte sets instead of raw text."""

    def pack(batch: pa.Table) -> pa.Table:
        h, offs = _word_shingle_hashes(batch.column(text_col).combine_chunks(), shingle_k)
        hu, _, cnt = _sorted_unique_segments(h, offs)
        return pa.table({id_col: batch.column(id_col), "sh": _pack_u64_binary(hu, cnt)})

    def apply(ds):
        return (
            ds.map_batches(pack, batch_format="pyarrow", zero_copy_batch=True),
            "sh",
        )

    return apply


def minhash_signatures(texts: pa.Array, n_perm: int = 128, k: int = 3, seed: int = 7) -> np.ndarray:
    """(n_docs, n_perm) uint64 MinHash signatures."""
    hashes, offsets = _word_shingle_hashes(texts, k)
    return _signatures_from_hashes(hashes, offsets, n_perm, seed)


def _signatures_from_hashes(
    hashes: np.ndarray, offsets: np.ndarray, n_perm: int = 128, seed: int = 7
) -> np.ndarray:
    """MinHash core over precomputed shingle hashes (lets callers that also need
    the shingle sets — e.g. the size-filter ``u`` — shingle exactly once)."""
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


def _num_partitions(default: int = 8) -> int:
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", default)) if ray.is_initialized() else default
    return max(4, min(32, ncpu))


def _partitions_for(rows: int, per_partition: int = 1_000_000) -> int:
    """Exchange width sized by DATA VOLUME, capped by cluster width. Every hash
    exchange spawns ~num_partitions aggregator actors — sizing by CPU count alone
    makes tiny exchanges pay tens of seconds of actor spin-up for rows that fit
    one partition."""
    return max(2, min(_num_partitions(), rows // per_partition + 1))


def _hot_members(band_rows, id_col: str, extra_cols: tuple[str, ...] = (), broadcast_limit: int = 5_000_000):
    """Native count-agg over bucket keys → the rows that land in buckets with ≥2
    members (the candidate set), AS A DATASET — members never funnel through the
    driver.

    Hot-key recovery switches on cardinality: ≤ ``broadcast_limit`` hot buckets
    (≤40 MB of int64 keys) are collected once, sorted, ``ray.put`` and applied
    as a vectorized searchsorted filter; beyond that (the web-corpus regime —
    ~30% near-dup ⇒ hot buckets are O(dataset)) the hot keys stay distributed
    and the filter is an inner hash join on the narrow (key) column.

    ``band_rows`` is materialized because it feeds two consumers (the count-agg
    and the hot filter). Scale note: at 10^12 docs the materialized band rows are
    ~bands×16 B/doc of object-store/spill footprint; if that is too much, drop the
    materialize and let Ray recompute the (cheap, map-only) band stage for the
    second pass — storage vs. recompute, both correct."""
    import ray

    band_rows = band_rows.materialize()
    n_band_rows = band_rows.count()
    # bucket keys are mostly SINGLETONS (hot buckets are the rare case), so the
    # native count aggregate pays per-group machinery for nearly every row —
    # the r3 singleton-collapse lesson (BASELINE.md). Count via in-batch
    # partials + the range-sort exchange with boundary fixup
    # (``decontam._df_counts`` — measured 5x faster than the keyed hash
    # repartition on singleton-heavy keys), thresholded in the block pass so
    # only hot keys ever leave it. Identical hot set.
    from raysketch.pipeline.decontam import _df_counts

    def count_partial(t: pa.Table) -> pa.Table:
        k = np.asarray(t.column("key"))
        uk, c = np.unique(k, return_counts=True)
        return pa.table({"h": uk, "c": c.astype(np.int64)})

    inc = band_rows.map_batches(count_partial, batch_format="pyarrow", zero_copy_batch=True)
    hot = (
        _df_counts(inc, out_col="c", min_count=2)
        .map_batches(
            lambda t: pa.table({"key": t.column("h")}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )
    n_hot = hot.count()
    if n_hot == 0:
        return None, n_band_rows
    if n_hot > broadcast_limit:
        # plain-repartition coalesce: hot now comes from map_batches, whose
        # skipped-empty blocks would hand Acero schema-less partitions
        hot = hot.repartition(_partitions_for(n_hot))
        return band_rows.join(hot, "inner", _partitions_for(n_band_rows), on=("key",)), n_band_rows
    hot_keys = np.array([r["key"] for r in hot.take_all()], dtype=np.int64)
    hot_keys.sort()
    ref = ray.put(hot_keys)

    def keep_hot(batch: pa.Table) -> pa.Table:
        hk = ray.get(ref)
        keys = np.asarray(batch.column("key"))
        idx = np.searchsorted(hk, keys)
        idx = np.clip(idx, 0, len(hk) - 1)
        return batch.filter(pa.array(hk[idx] == keys))

    return band_rows.map_batches(keep_hot, batch_format="pyarrow", zero_copy_batch=True), n_band_rows


def _emit_pairs(
    members,
    id_col: str,
    extra_cols: tuple[str, ...] = (),
    max_bucket: int = 256,
    num_partitions: int | None = None,
    pair_filter=None,
    emit_extras: bool = True,
):
    """Distributed candidate-pair emission: HASH_SHUFFLE the hot-bucket member
    rows by bucket key so each output block holds whole buckets, then ONE
    vectorized task per block emits every within-bucket (a < b) pair — buckets
    are grouped by size so the pair indices (``np.triu_indices``) are built once
    per distinct size and broadcast across all buckets of that size (no per-pair,
    no per-bucket-of-common-size Python). Pairs produced by multiple bands are
    deduped by a native groupby on (a, b) (extras ride along via Min — they are
    functions of the id, identical across duplicates).

    Oversized buckets (degenerate keys: boilerplate shingles, all-zero simhash
    bands) are truncated to ``max_bucket`` members — O(bucket²) pair blowup is
    capped at the source, same rule as the reference candidate cap.

    ``pair_filter(extras_a, extras_b) -> bool mask`` prunes candidate pairs
    INSIDE the emission task, before anything enters the (a, b) dedup exchange —
    used for the exactness-preserving PPJoin size/positional filters (a true
    pair passes the filter in EVERY bucket it shares, so any-bucket survival +
    dedup keeps it). ``emit_extras=False`` drops filter-only extras from the
    output so the dedup groupby stays 2 int64 columns wide."""
    from ray.data.context import ShuffleStrategy

    if num_partitions is None:
        num_partitions = _num_partitions()
    members.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    # without this, every hash aggregation on this chain defaults to 200
    # partitions — 200 mostly-empty blocks per groupby on small/medium data
    members.context.default_hash_shuffle_parallelism = num_partitions
    parts = members.repartition(num_blocks=num_partitions, keys=["key"])
    out_schema = {"a": pa.int64(), "b": pa.int64()}
    out_extras = extra_cols if emit_extras else ()
    for c in out_extras:
        out_schema[f"{c}_a"] = pa.int64()
        out_schema[f"{c}_b"] = pa.int64()

    def pairs_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({c: pa.array([], t) for c, t in out_schema.items()})
        key = np.asarray(batch.column("key").combine_chunks())
        ids = np.asarray(batch.column(id_col).combine_chunks())
        extras = {c: np.asarray(batch.column(c).combine_chunks()) for c in extra_cols}
        order = np.lexsort((ids, key))
        key, ids = key[order], ids[order]
        extras = {c: v[order] for c, v in extras.items()}
        new_b = np.empty(len(key), dtype=bool)
        new_b[0] = True
        np.not_equal(key[1:], key[:-1], out=new_b[1:])
        bounds = np.append(np.nonzero(new_b)[0], len(key))
        sizes = np.minimum(np.diff(bounds), max_bucket)
        cols: dict[str, list] = {c: [] for c in out_schema}
        for s in np.unique(sizes):
            if s < 2:
                continue
            starts = bounds[:-1][sizes == s]
            iu, ju = np.triu_indices(int(s), k=1)
            ai = (starts[:, None] + iu[None, :]).ravel()
            bi = (starts[:, None] + ju[None, :]).ravel()
            keep = ids[ai] < ids[bi]  # ids ascend within a bucket; drops dups
            ai, bi = ai[keep], bi[keep]
            if pair_filter is not None and len(ai):
                mask = pair_filter(
                    {c: v[ai] for c, v in extras.items()},
                    {c: v[bi] for c, v in extras.items()},
                )
                ai, bi = ai[mask], bi[mask]
            cols["a"].append(ids[ai])
            cols["b"].append(ids[bi])
            for c in out_extras:
                cols[f"{c}_a"].append(extras[c][ai])
                cols[f"{c}_b"].append(extras[c][bi])
        return pa.table(
            {
                c: pa.array(
                    np.concatenate(cols[c]) if cols[c] else np.empty(0, dtype=np.int64),
                    out_schema[c],
                )
                for c in out_schema
            }
        )

    raw = parts.map_batches(pairs_block, batch_format="pyarrow", batch_size=None)

    # pair dedup WITHOUT the native aggregate: candidate pairs are singleton-
    # heavy (a pair shares 1-2 buckets), the aggregator's collapse shape
    # (BASELINE.md round-3). Per-block Arrow group_by (C++) → keyed
    # repartition → per-block final pass; Min-of-mins ≡ global Min, so the
    # extras semantics are identical.
    ecols = [f"{c}_{s}" for c in out_extras for s in ("a", "b")]

    def pair_reduce(t: pa.Table) -> pa.Table:
        if not ecols:
            return t.group_by(["a", "b"]).aggregate([])
        res = t.group_by(["a", "b"]).aggregate([(c, "min") for c in ecols])
        return pa.table(
            {
                "a": res.column("a"),
                "b": res.column("b"),
                **{c: res.column(f"{c}_min") for c in ecols},
            }
        )

    pre = raw.map_batches(pair_reduce, batch_format="pyarrow", zero_copy_batch=True)
    # final dedup/min via the range-sort exchange (the r4 sort-vs-hash-shuffle
    # lesson): sort by (a, b), finalize interior pairs vectorized in-block,
    # re-min the <= 2-per-block boundary pairs driver-side. Min-of-mins keeps
    # the extras semantics identical to the keyed-repartition path.
    import ray as _ray

    out_cols = ["a", "b", *ecols]
    pre = pre.materialize()
    n_pairs = pre.count()
    if n_pairs == 0:
        # ds.sort on an all-empty Dataset is undefined across Ray versions;
        # the typed empty blocks from pairs_block are already the answer
        return pre.repartition(num_blocks=num_partitions)
    from raysketch.pipeline.exchange import _coalesce_overblocked

    # candidate pairs are usually FEW but spread over every emission block —
    # coalesce tiny blocks so the sort isn't hundreds of ~10-row tasks
    pre = _coalesce_overblocked(pre, n_pairs)

    def pair_finalize_edge(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table(
                {
                    **{c: pa.array([], pa.int64()) for c in out_cols},
                    "__edge": pa.array([], pa.bool_()),
                }
            )
        a = np.asarray(t.column("a"))
        b = np.asarray(t.column("b"))
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        new = np.ones(n, dtype=bool)
        new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        starts = np.nonzero(new)[0]
        out = {"a": a[starts], "b": b[starts]}
        for c in ecols:
            out[c] = np.minimum.reduceat(np.asarray(t.column(c))[order], starts)
        edge = np.zeros(len(starts), dtype=bool)
        edge[0] = True
        edge[-1] = True
        cols = {c: pa.array(v, pa.int64()) for c, v in out.items()}
        cols["__edge"] = pa.array(edge)
        return pa.table(cols)

    parts2 = (
        pre.sort(["a", "b"])
        .map_batches(pair_finalize_edge, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    edge_pdf = (
        parts2.filter(expr="__edge == True").select_columns(out_cols).to_pandas()
    )
    deduped = parts2.filter(expr="__edge == False").drop_columns(["__edge"])
    if len(edge_pdf) > 0 and "a" in edge_pdf.columns:
        if ecols:
            fix = edge_pdf.groupby(["a", "b"], as_index=False)[list(ecols)].min()
        else:
            fix = edge_pdf.drop_duplicates(["a", "b"])
        deduped = deduped.union(
            _ray.data.from_arrow(
                pa.table(
                    {c: pa.array(fix[c].to_numpy(), pa.int64()) for c in out_cols}
                )
            )
        )

    # skipped-empty blocks are SCHEMA-LESS; Acero joins downstream reject them
    # ("no match for FieldRef"). A plain repartition coalesces them into typed
    # blocks.
    return deduped.repartition(num_blocks=num_partitions)


def _attach_pair_payload(
    pairs,
    ds,
    id_col: str,
    payload_col: str,
    n_pairs: int,
    broadcast_limit: int = 1_000_000,
    payload_map=None,
):
    """Bring each pair's two payloads (text / embedding) to the pair rows; the
    payloads themselves NEVER visit the driver in either regime.

    - pairs ≤ ``broadcast_limit``: collect only the pair IDS (16 B each),
      broadcast the sorted unique array once via ``ray.put``, exact-filter ``ds``
      to candidates with a vectorized searchsorted stage, then hash-join the
      candidate payload rows to the pairs.
    - larger: a PartitionedBloom over the pair ids (built with the library's own
      distributed build) broadcast-prefilters ``ds`` (no false negatives, ≤p
      extras — the inner join removes extras), so the joins partition only
      candidate-sized inputs. The full corpus never enters a shuffle either way.

    ``payload_map(cand_ds) -> (ds, new_payload_col)`` transforms the CANDIDATE
    rows (post-filter, so only docs that appear in ≥1 pair pay it) before the
    joins — e.g. text → packed shingle sets. Join width is sized so the
    downstream per-pair verify actually parallelizes (pairs are tiny rows but
    verify is the compute-heavy stage)."""
    np_ = _partitions_for(n_pairs, per_partition=25_000)
    narrow = ds.select_columns([id_col, payload_col])
    if n_pairs <= broadcast_limit:
        from raysketch.pipeline.probe import exact_semi_join

        df = pairs.select_columns(["a", "b"]).to_pandas()
        cand_ids = np.unique(np.concatenate([df["a"].to_numpy(), df["b"].to_numpy()]))
        # lazy: the candidate filter streams into both joins inside one plan
        # execution (recomputed once per side — two cheap map stages), instead
        # of paying a separate materialize round-trip
        cand = exact_semi_join(narrow, cand_ids, id_col)
    else:
        from raysketch.pipeline.partitioned import build_partitioned_bloom
        from raysketch.pipeline.probe import bloom_semi_join

        def both_ids(batch: pa.Table) -> pa.Table:
            a = np.asarray(batch.column("a"))
            b = np.asarray(batch.column("b"))
            return pa.table({id_col: pa.array(np.concatenate([a, b]))})

        ids_ds = pairs.map_batches(both_ids, batch_format="pyarrow", zero_copy_batch=True)
        pb, _ = build_partitioned_bloom(
            ids_ds, id_col, capacity=max(2 * n_pairs, 64), num_shards=16
        )
        cand = bloom_semi_join(narrow, pb, id_col)
    if payload_map is not None:
        cand, payload_col = payload_map(cand)
        # the transformed payload feeds BOTH join sides — materialize so the
        # (candidate-only) transform runs once, not once per side
        cand = cand.materialize()
    elif n_pairs > broadcast_limit:
        cand = cand.materialize()  # big regime: avoid re-reading the corpus twice
    left = pairs.join(
        cand.rename_columns({id_col: "a", payload_col: f"{payload_col}_a"}),
        "inner",
        np_,
        on=("a",),
    )
    return left.join(
        cand.rename_columns({id_col: "b", payload_col: f"{payload_col}_b"}),
        "inner",
        np_,
        on=("b",),
    )


def _block_union_find(batch: pa.Table) -> pa.Table:
    """One task's local union-find over its block of edges → min-root star edges
    (node, lbl). Contraction preserves connectivity exactly, keeps every node,
    and collapses bucket cliques (C(s,2) edges) to stars (s edges)."""
    if batch.num_rows == 0:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    a = np.asarray(batch.column("a").combine_chunks())
    b = np.asarray(batch.column("b").combine_chunks())
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for u, v in zip(a.tolist(), b.tolist()):
        ru, rv = find(u), find(v)
        if ru != rv:
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo
    nodes = np.unique(np.concatenate([a, b]))
    roots = np.fromiter((find(int(x)) for x in nodes), count=len(nodes), dtype=np.int64)
    return pa.table({"a": pa.array(nodes), "b": pa.array(roots)})


def connected_components(edges, final_task_edges: int = 5_000_000, max_iters: int = 40, n_edges: int | None = None):
    """Distributed connected components over a verified-edge Dataset.

    ``edges``: Dataset with int64 columns (a, b). Returns a Dataset
    (node, lbl) where lbl is the component's minimum member id.

    Two-level scheme (the MapReduce-CC contraction pattern, Kiveris et al. 2014
    family): (1) one ``map_batches`` pass runs a LOCAL union-find per edge block
    and emits min-root star edges — exact contraction, every node kept, bucket
    cliques collapse C(s,2)→s; (2) if the contracted graph fits
    ``final_task_edges`` (one (node,root) row per candidate node — 16 B each, so
    the default covers 5M dup-cluster members per job in ~80 MB), ONE worker
    task union-finds it exactly; otherwise (3) iterative min-label propagation
    with pointer jumping (label-of-label join each round → O(log n) rounds) runs
    until the monotone label sum reaches fixpoint.

    ``n_edges`` (if the caller already counted) lets small edge sets skip the
    contraction round and go straight to the exact single-task union-find."""
    if n_edges is not None and n_edges <= final_task_edges:
        star = edges
    else:
        star = (
            edges.repartition(
                num_blocks=_partitions_for(n_edges) if n_edges else _num_partitions()
            )
            .map_batches(_block_union_find, batch_format="pyarrow", batch_size=None)
            .materialize()
        )
    if (n_edges if star is edges else star.count()) <= final_task_edges:
        final = star.repartition(num_blocks=1).map_batches(
            lambda b: _block_union_find(b).rename_columns(["node", "lbl"]),
            batch_format="pyarrow",
            batch_size=None,
        )
        return final.materialize()

    # huge-dup-graph fallback: min-label propagation + pointer jumping
    from ray.data.aggregate import Min

    np_ = _num_partitions()

    def sym(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column("a"))
        b = np.asarray(batch.column("b"))
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b])),
                "dst": pa.array(np.concatenate([b, a])),
            }
        )

    e = star.map_batches(sym, batch_format="pyarrow", zero_copy_batch=True).materialize()

    def self_min(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch.column("src"))
        l = np.asarray(batch.column("lbl"))
        return pa.table({"node": pa.array(s), "lbl": pa.array(np.minimum(s, l))})

    labels = (
        e.groupby("src")
        .aggregate(Min("dst", alias_name="lbl"))
        .map_batches(self_min, batch_format="pyarrow")
        .materialize()
    )
    prev_sum = labels.sum("lbl")
    for _ in range(max_iters):
        # neighbor propagation: edges ⋈ labels → candidate label for each dst
        j = e.join(labels.rename_columns({"node": "src"}), "inner", np_, on=("src",))
        cand = j.map_batches(
            lambda b: pa.table({"node": b.column("dst"), "lbl": b.column("lbl")}),
            batch_format="pyarrow",
        )
        # pointer jumping: label-of-label (labels ⋈ labels on lbl=node)
        jump = labels.join(
            labels.rename_columns({"node": "__jn", "lbl": "__jl"}),
            "inner",
            np_,
            on=("lbl",),
            right_on=("__jn",),
        ).map_batches(
            lambda b: pa.table({"node": b.column("node"), "lbl": b.column("__jl")}),
            batch_format="pyarrow",
        )
        labels = (
            labels.union(cand, jump)
            .groupby("node")
            .aggregate(Min("lbl", alias_name="lbl"))
            .materialize()
        )
        s = labels.sum("lbl")
        if s == prev_sum:
            break
        prev_sum = s
    else:
        # with pointer jumping the label sum reaches fixpoint in O(log n)
        # rounds; exhausting max_iters means the labels are NOT final — never
        # hand an unconverged clustering to a consumer silently
        raise RuntimeError(
            f"connected_components: min-label propagation did not reach fixpoint "
            f"within max_iters={max_iters} rounds"
        )
    return labels


def _collect_clusters(edges, n_edges: int | None = None, as_dataset: bool = False):
    """Run distributed CC over a verified-edge Dataset. Default: collect the
    (small — one row per clustered doc) result as a sorted (doc_id, cluster_id)
    table. ``as_dataset=True`` keeps the labels distributed (rename only) — the
    10^12-doc consumer writes them to parquet instead of collecting."""
    labels = connected_components(edges, n_edges=n_edges)
    if as_dataset:
        return labels.rename_columns({"node": "doc_id", "lbl": "cluster_id"})
    df = labels.to_pandas().sort_values("node").reset_index(drop=True)
    return pa.table(
        {
            "doc_id": pa.array(df["node"].to_numpy(), pa.int64()),
            "cluster_id": pa.array(df["lbl"].to_numpy(), pa.int64()),
        }
    )


_EMPTY_CLUSTERS = {
    "doc_id": pa.array([], pa.int64()),
    "cluster_id": pa.array([], pa.int64()),
}


def minhash_lsh_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 3,
    threshold: float = 0.8,
    seed: int = 7,
    as_dataset: bool = False,
):
    """Near-duplicate clustering: returns ``(doc_id, cluster_id)`` (cluster_id =
    min member id) for every doc in a verified near-dup cluster.

    Every stage after the signature map is distributed — nothing funnels through
    the driver (web corpora are ~30% near-dup, so candidates are O(dataset)):
    band rows → native hot-bucket count → HASH_SHUFFLE pair emission per bucket
    block (with the exact size-ratio prefilter ``min(u)/max(u) ≥ t`` — a
    necessity for ``J ≥ t`` since ``J ≤ min/max``) → native (a,b) dedup →
    candidate shingle SETS attached via Bloom-prefiltered hash joins (each
    candidate shingled once, not once per pair) → vectorized presorted
    Jaccard verify in ``map_batches`` → distributed min-label propagation for
    clusters. Verification is EXACT shingle-set Jaccard ≥ threshold, so LSH
    affects recall but never precision."""

    def bandrows(batch: pa.Table) -> pa.Table:
        require_non_null_ids(batch, id_col, "minhash_lsh_dedup")
        texts = batch.column(text_col).combine_chunks()
        ids = np.asarray(batch.column(id_col))
        h, offs = _word_shingle_hashes(texts, shingle_k)
        u = _sorted_unique_segments(h, offs)[2]
        sig = _signatures_from_hashes(h, offs, n_perm, seed)
        keys = _band_keys(sig, bands)
        return pa.table(
            {
                "key": pa.array(keys.ravel()),
                id_col: pa.array(np.repeat(ids, bands)),
                "u": pa.array(np.repeat(u, bands)),
            }
        )

    band_rows = ds.select_columns([id_col, text_col]).map_batches(
        bandrows, batch_format="pyarrow", zero_copy_batch=True
    )
    members, n_band_rows = _hot_members(band_rows, id_col)
    if members is None:
        return pa.table(_EMPTY_CLUSTERS)

    def size_filter(A: dict, B: dict) -> np.ndarray:
        ua = A["u"].astype(np.float64)
        ub = B["u"].astype(np.float64)
        return np.minimum(ua, ub) >= threshold * np.maximum(ua, ub) - 1e-9

    pairs = _emit_pairs(
        members,
        id_col,
        extra_cols=("u",),
        num_partitions=_partitions_for(n_band_rows),
        pair_filter=size_filter,
        emit_extras=False,
    ).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return pa.table(_EMPTY_CLUSTERS)
    with_sets = _attach_pair_payload(
        pairs,
        ds,
        id_col,
        text_col,
        n_pairs,
        payload_map=_shingle_payload_map(text_col, id_col, shingle_k),
    )

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        ha, oa = _unpack_u64_binary(batch.column("sh_a"))
        hb, ob = _unpack_u64_binary(batch.column("sh_b"))
        jac = _pairwise_jaccard_presorted(ha, oa, hb, ob)
        keep = pa.array(jac >= threshold)
        return pa.table(
            {"a": batch.column("a").filter(keep), "b": batch.column("b").filter(keep)}
        )

    edges = with_sets.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return pa.table(_EMPTY_CLUSTERS)
    return _collect_clusters(edges, n_edges, as_dataset)


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (prefix-filtered all-pairs)
# ---------------------------------------------------------------------------


def _prefix_rows(
    h: np.ndarray, offs: np.ndarray, threshold: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-document prefix tokens for the Jaccard prefix filter (Chaudhuri et al.
    SSJoin 2006 / Bayardo et al. All-Pairs 2007): under ANY fixed global total
    order on tokens — here ascending 64-bit shingle hash, which needs no global
    frequency pass — two sets with ``J ≥ t`` must share a token within each
    side's first ``u − ⌈t·u⌉ + 1`` tokens (``u`` = unique-set size). Returns
    ``(prefix_hashes, doc_indices, positions, set_sizes)`` per prefix row —
    ``positions`` (0-based rank of the token in the doc's sorted unique set) and
    ``set_sizes`` feed the PPJoin positional/size pair filters — with every
    segment sorted + deduped in one lexsort pass (no per-doc Python)."""
    if len(h) == 0:
        e = np.empty(0, dtype=np.int64)
        return h, e, e, e
    hu, su, cnt = _sorted_unique_segments(h, offs)
    plen = np.maximum(cnt - np.ceil(threshold * cnt).astype(np.int64) + 1, 0)
    plen[cnt == 0] = 0
    starts = np.concatenate([[0], np.cumsum(cnt)])
    pos = np.arange(len(hu), dtype=np.int64) - starts[su]
    keep2 = pos < plen[su]
    return hu[keep2], su[keep2], pos[keep2], cnt[su[keep2]]


def jaccard_ngram_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.8,
    max_bucket: int = 256,
    as_dataset: bool = False,
):
    """EXACT all-pairs n-gram-Jaccard clustering (no LSH recall loss): returns
    ``(doc_id, cluster_id)`` for every doc in a cluster of pairwise-verified
    ``J(shingles_a, shingles_b) ≥ threshold`` components.

    Candidate generation is the prefix filter (``_prefix_rows``): each doc emits
    only its ``u − ⌈t·u⌉ + 1`` smallest unique shingle hashes as (key, doc) rows
    — at t=0.8 that's ~20% of the shingle volume — and every qualifying pair
    provably shares a prefix key, so completeness is exact (unlike MinHash-LSH,
    which misses with probability (1−s^r)^b). Emitted pairs pass the PPJoin
    size + positional filters (Xiao et al. WWW'08) BEFORE the dedup exchange:
    for a shared prefix token at sorted-set positions (i, j),
    ``|A∩B| ≤ min(i,j) + min(u_a−i, u_b−j)`` and ``J ≥ t`` requires
    ``|A∩B| ≥ t/(1+t)·(u_a+u_b)`` — both exact necessities, so no true pair is
    lost (it passes in every bucket it shares). Downstream reuses the audited
    scale-safe dedup machinery: native hot-key count → HASH_SHUFFLE pair
    emission per bucket block → Bloom-prefiltered payload joins shipping packed
    sorted shingle SETS (each candidate shingled once, not once per pair) →
    vectorized presorted exact-Jaccard verify → distributed connected
    components.

    The single approximation is the ``max_bucket`` truncation of degenerate
    posting lists (a shingle appearing in >256 docs' prefixes — boilerplate);
    precision is still exact (every emitted edge is verified), only recall on
    boilerplate-dominated docs is capped, same policy as the LSH path."""

    def prefixrows(batch: pa.Table) -> pa.Table:
        require_non_null_ids(batch, id_col, "jaccard_ngram_dedup")
        texts = batch.column(text_col).combine_chunks()
        ids = np.asarray(batch.column(id_col))
        h, offs = _word_shingle_hashes(texts, shingle_k)
        ph, pseg, ppos, pu = _prefix_rows(h, offs, threshold)
        return pa.table(
            {
                "key": pa.array(ph.view(np.int64)),
                id_col: pa.array(ids[pseg]),
                "pos": pa.array(ppos),
                "u": pa.array(pu),
            }
        )

    prefix_rows = ds.select_columns([id_col, text_col]).map_batches(
        prefixrows, batch_format="pyarrow", zero_copy_batch=True
    )
    members, n_rows = _hot_members(prefix_rows, id_col)
    if members is None:
        return pa.table(_EMPTY_CLUSTERS)

    def ppjoin_filter(A: dict, B: dict) -> np.ndarray:
        ua = A["u"].astype(np.float64)
        ub = B["u"].astype(np.float64)
        size_ok = np.minimum(ua, ub) >= threshold * np.maximum(ua, ub) - 1e-9
        need = threshold / (1.0 + threshold) * (ua + ub) - 1e-9
        cap = np.minimum(A["pos"], B["pos"]) + np.minimum(ua - A["pos"], ub - B["pos"])
        return size_ok & (cap >= need)

    pairs = _emit_pairs(
        members,
        id_col,
        extra_cols=("pos", "u"),
        max_bucket=max_bucket,
        num_partitions=_partitions_for(n_rows),
        pair_filter=ppjoin_filter,
        emit_extras=False,
    ).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return pa.table(_EMPTY_CLUSTERS)
    with_sets = _attach_pair_payload(
        pairs,
        ds,
        id_col,
        text_col,
        n_pairs,
        payload_map=_shingle_payload_map(text_col, id_col, shingle_k),
    )

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        ha, oa = _unpack_u64_binary(batch.column("sh_a"))
        hb, ob = _unpack_u64_binary(batch.column("sh_b"))
        keep = pa.array(_pairwise_jaccard_presorted(ha, oa, hb, ob) >= threshold)
        return pa.table(
            {"a": batch.column("a").filter(keep), "b": batch.column("b").filter(keep)}
        )

    edges = with_sets.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return pa.table(_EMPTY_CLUSTERS)
    return _collect_clusters(edges, n_edges, as_dataset)


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


_POPCOUNT8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(
    axis=1
).astype(np.uint8)


def hamming64(a: np.ndarray, b) -> np.ndarray:
    """Vectorized 64-bit Hamming distance via a byte-LUT popcount — 8 table
    gathers per element instead of 64 shift/mask passes."""
    x = np.atleast_1d(np.bitwise_xor(np.asarray(a, dtype=np.uint64), np.asarray(b, dtype=np.uint64)))
    by = np.ascontiguousarray(x).view(np.uint8).reshape(len(x), 8)
    return _POPCOUNT8[by].sum(axis=1, dtype=np.int64)


def simhash_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    seed: int = 0,
    as_dataset: bool = False,
):
    """Near-dup clusters by SimHash: 4×16-bit band buckets (pigeonhole-complete for
    Hamming ≤ 3), hot buckets via native count, distributed pair emission, exact
    Hamming verify vectorized in ``map_batches`` (the fingerprints ride the band
    rows, so no text ever re-enters the pipeline), distributed min-label
    clustering — no driver funnel at any stage."""

    def bandrows(batch: pa.Table) -> pa.Table:
        require_non_null_ids(batch, id_col, "simhash_dedup")
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
    members, n_band_rows = _hot_members(band_rows, id_col, extra_cols=("fp",))
    if members is None:
        return pa.table(_EMPTY_CLUSTERS)
    pairs = _emit_pairs(members, id_col, extra_cols=("fp",), num_partitions=_partitions_for(n_band_rows))

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        fpa = np.asarray(batch.column("fp_a").combine_chunks()).view(np.uint64)
        fpb = np.asarray(batch.column("fp_b").combine_chunks()).view(np.uint64)
        keep = pa.array(hamming64(fpa, fpb) <= max_hamming)
        return pa.table(
            {"a": batch.column("a").filter(keep), "b": batch.column("b").filter(keep)}
        )

    edges = pairs.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return pa.table(_EMPTY_CLUSTERS)
    return _collect_clusters(edges, n_edges, as_dataset)


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
    if col.null_count:
        # a null list cell is a zero-length span — it would trip the
        # fixed-length check below with a misleading message
        raise ValueError(
            "embedding column contains null cells — drop or impute null "
            "embeddings before the ANN/dedup stage"
        )
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
    n_planes: int = 8,
    bands: int = 8,
    seed: int = 5,
    as_dataset: bool = False,
):
    """Near-dup clusters among embeddings: BANDED random-hyperplane LSH (a pair
    is a candidate if it agrees on all ``n_planes`` planes of ANY band —
    single-bucket keying misses any near-identical pair a lone hyperplane
    happens to split; with 8×8 banding the miss probability for a pair at
    cosine c is ``(1-(1-θ/π)^8)^8``, θ=arccos(c) — ≈1e-11 for near-identical
    pairs, ~1% at threshold 0.95), hot buckets via native count, distributed
    pair emission (multi-band duplicates deduped by the native (a,b) groupby),
    candidate vectors attached via Bloom-prefiltered hash joins, exact
    cosine ≥ threshold verify vectorized in ``map_batches`` (LSH affects recall,
    never precision), distributed min-label clustering. Output column names are
    (doc_id, cluster_id) for uniformity.

    Scale note: per-band bucket count is 2^n_planes — raise ``n_planes`` (and
    ``bands`` to hold recall) as the corpus grows so expected bucket size stays
    bounded; degenerate buckets are truncated at ``max_bucket`` in the pair
    emitter either way."""

    def bucket(batch: pa.Table) -> pa.Table:
        require_non_null_ids(batch, id_col, "embedding_cosine_dedup")
        V = embedding_matrix(batch.column(emb_col)).astype(np.float64)
        d = V.shape[1]
        P = np.random.default_rng(seed).normal(size=(d, n_planes * bands))
        signs = (V @ P) > 0
        keys = np.empty((len(V), bands), dtype=np.int64)
        for bd in range(bands):
            k = np.zeros(len(V), dtype=np.int64)
            for b in range(n_planes):
                k |= signs[:, bd * n_planes + b].astype(np.int64) << b
            keys[:, bd] = k | (np.int64(bd + 1) << np.int64(48))
        ids = np.asarray(batch.column(id_col))
        return pa.table(
            {"key": pa.array(keys.ravel()), id_col: pa.array(np.repeat(ids, bands))}
        )

    band_rows = ds.select_columns([id_col, emb_col]).map_batches(
        bucket, batch_format="pyarrow", zero_copy_batch=True
    )
    members, n_band_rows = _hot_members(band_rows, id_col)
    if members is None:
        return pa.table(_EMPTY_CLUSTERS)
    pairs = _emit_pairs(members, id_col, num_partitions=_partitions_for(n_band_rows)).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return pa.table(_EMPTY_CLUSTERS)

    # Ray's hash join rejects list<float> non-key fields — carry the vectors as
    # fixed-width float64 binary blobs through the join, decode in the verify
    # task. large_binary (int64 offsets) like every packed blob in this repo:
    # one consistent type across blocks, and a 768-dim float64 embedding is
    # 6 KB/row — a ~350k-row block would wrap int32 offsets.
    def pack_vec(batch: pa.Table) -> pa.Table:
        V = embedding_matrix(batch.column(emb_col)).astype(np.float64)
        n, d = V.shape
        raw = np.ascontiguousarray(V).view(np.uint8)
        offsets = (np.arange(n + 1, dtype=np.int64)) * (d * 8)
        arr = pa.Array.from_buffers(
            pa.large_binary(), n, [None, pa.py_buffer(offsets), pa.py_buffer(raw.ravel())]
        )
        return pa.table({id_col: batch.column(id_col), "__vec": arr})

    packed = ds.select_columns([id_col, emb_col]).map_batches(
        pack_vec, batch_format="pyarrow", zero_copy_batch=True
    )
    with_vecs = _attach_pair_payload(pairs, packed, id_col, "__vec", n_pairs)

    def _unpack(col) -> np.ndarray:
        from raysketch.hashing import column_spans

        data, starts, lengths = column_spans(col)
        d8 = int(lengths[0])
        idx = starts[:, None] + np.arange(d8, dtype=np.int64)[None, :]
        return np.ascontiguousarray(data[idx]).view(np.float64)

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        Va = _unpack(batch.column("__vec_a").combine_chunks())
        Vb = _unpack(batch.column("__vec_b").combine_chunks())
        num = np.einsum("ij,ij->i", Va, Vb)
        den = np.maximum(
            np.linalg.norm(Va, axis=1) * np.linalg.norm(Vb, axis=1), 1e-12
        )
        keep = pa.array(num / den >= threshold)
        return pa.table(
            {"a": batch.column("a").filter(keep), "b": batch.column("b").filter(keep)}
        )

    edges = with_vecs.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return pa.table(_EMPTY_CLUSTERS)
    return _collect_clusters(edges, n_edges, as_dataset)
