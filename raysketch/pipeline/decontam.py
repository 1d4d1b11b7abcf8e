"""Benchmark decontamination and corpus-boilerplate (hot n-gram) detection.

Two webtext-pipeline operators the reference engine's membership machinery
points at but never ships (its whitelist/contains workload is the same
shape — build a set from one corpus, probe another; simple_benchmark.cpp
whitelist reader + confusion loop):

- ``decontaminate``: flag corpus documents sharing >= ``min_overlap``
  distinct word n-grams with a held-out benchmark/eval set (the standard
  n-gram-overlap decontamination used for LLM training corpora).
- ``hot_ngrams``: find n-grams occurring in >= ``min_docs`` distinct
  documents (site boilerplate, license headers, nav text) and recover
  their strings — the input to boilerplate stripping.

Both tokenize once per block with the same whitespace/xxh64 convention as
``raysketch.pipeline.dedup`` and stay hash-only through every wide
exchange; n-gram *strings* are materialized only for the (small,
threshold-bounded) hot set, via a second scan.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from raysketch.hashing import column_spans, xxh64_vec
from raysketch.pipeline.contracts import require_non_null_ids

_NGRAM_P = np.uint64(0x9E3779B185EBCA87)


def _doc_tokens(texts: pa.Array) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Whitespace tokens of every doc: ``(flat_tokens, token_hashes,
    doc_offsets)`` with empty tokens dropped. The hash side is identical to
    ``dedup._token_hashes(seed=0)``; the flat Arrow token array is kept so
    callers can recover n-gram *strings* by position."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lists = pc.utf8_split_whitespace(texts)
    offs = np.asarray(lists.offsets).astype(np.int64)
    flat = lists.values
    data, starts, lengths = column_spans(flat)
    nonempty = lengths > 0
    th = xxh64_vec(data, starts, lengths, 0)[nonempty]
    cs = np.zeros(len(nonempty) + 1, dtype=np.int64)
    np.cumsum(nonempty, out=cs[1:])
    d = cs[offs[1:]] - cs[offs[:-1]]
    doc_offs = np.zeros(len(d) + 1, dtype=np.int64)
    np.cumsum(d, out=doc_offs[1:])
    if not bool(nonempty.all()):
        flat = flat.filter(pa.array(nonempty))
    return flat, th, doc_offs


def _ngram_occurrences(
    th: np.ndarray, doc_offs: np.ndarray, n: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All full-width word n-gram occurrences: ``(start_token_idx, hash,
    doc_idx)``. Docs with fewer than ``n`` tokens emit NOTHING — exactly the
    SQL ``lead()``-window n-gram semantics (no short-doc special case, unlike
    ``dedup._word_shingle_hashes``), so a string-level oracle matches."""
    T = len(th)
    ndoc = len(doc_offs) - 1
    if T < n or ndoc == 0:
        e = np.empty(0, dtype=np.int64)
        return e, np.empty(0, dtype=np.uint64), e
    d = np.diff(doc_offs)
    docid = np.repeat(np.arange(ndoc, dtype=np.int64), d)
    valid = docid[: T - n + 1] == docid[n - 1 :]
    acc = np.zeros(T - n + 1, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for pos in range(n):
            t = th[pos : T - n + 1 + pos]
            # (64 - r) % 64: rotate-by-0 (pos ≡ 29 mod 64) must not shift by 64
            r = np.uint64((13 * pos + 7) % 64)
            acc = acc * _NGRAM_P + ((t << r) | (t >> np.uint64((64 - int(r)) % 64)))
    starts = np.nonzero(valid)[0].astype(np.int64)
    return starts, acc[valid], docid[starts]


def _per_doc_distinct(h: np.ndarray, doc: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Distinct (doc, hash) incidences, one vectorized lexsort pass."""
    if len(h) == 0:
        return h, doc
    order = np.lexsort((h, doc))
    hs, ds = h[order], doc[order]
    first = np.ones(len(hs), dtype=bool)
    first[1:] = (hs[1:] != hs[:-1]) | (ds[1:] != ds[:-1])
    return hs[first], ds[first]


def _size_hash_exchange(ds) -> None:
    """Cap the dataset's hash-exchange width at the cluster width: every hash
    aggregation otherwise defaults to 200 partitions — 200 aggregator-actor
    spin-ups per groupby (the round-2 lesson, BASELINE.md 'Ray-vs-host')."""
    from ray.data.context import ShuffleStrategy

    from raysketch.pipeline.dedup import _num_partitions

    ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ds.context.default_hash_shuffle_parallelism = _num_partitions()


def _df_counts(inc, out_col: str = "n", min_count: int | None = None):
    """Summed counts per hash from ``(h, c)`` incidence partials, WITHOUT the
    native hash aggregate: n-gram/window key universes are singleton-heavy
    (~99% of 20M keys occur once at bench scale) and the aggregator pays
    per-GROUP machinery — measured 147 s at bench scale (BASELINE.md r3).

    The exchange is Ray's range-partitioned ``sort`` — measured ~5x faster
    than the keyed HASH_SHUFFLE repartition on this singleton-heavy shape
    (20M distinct hashes: 3.3 s vs 17.2 s at 8 cpus, identical output).
    After the sort a key may straddle ADJACENT blocks, so each block
    finalizes its interior keys vectorized (unique + bincount) and emits its
    first/last key partials for an exact driver-side re-sum — bounded at
    <= 2 rows per block regardless of data size. Optional ``min_count``
    filters interior keys inside the block pass, so thresholded consumers
    never see the singleton mass."""
    import ray

    inc = inc.materialize()
    if inc.count() == 0:
        # ds.sort on an all-empty Dataset is undefined across Ray versions
        # (the _emit_pairs guard) — emit the typed empty result directly
        return ray.data.from_arrow(
            pa.table({"h": pa.array([], pa.int64()), out_col: pa.array([], pa.int64())})
        )
    s = inc.sort("h")

    def block(t: pa.Table) -> pa.Table:
        h = np.asarray(t.column("h"))
        c = np.asarray(t.column("c"))
        if len(h) == 0:
            return pa.table(
                {
                    "h": pa.array([], pa.int64()),
                    out_col: pa.array([], pa.int64()),
                    "__edge": pa.array([], pa.bool_()),
                }
            )
        uh, inv = np.unique(h, return_inverse=True)
        tot = np.bincount(inv, weights=c).astype(np.int64)
        edge = np.zeros(len(uh), dtype=bool)
        edge[0] = True
        edge[-1] = True
        keep = edge | (tot >= min_count) if min_count is not None else np.ones(len(uh), bool)
        return pa.table(
            {"h": uh[keep], out_col: tot[keep], "__edge": pa.array(edge[keep])}
        )

    parts = s.map_batches(block, batch_format="pyarrow", batch_size=None).materialize()
    edge_pdf = (
        parts.filter(expr="__edge == True").select_columns(["h", out_col]).to_pandas()
    )
    inner = parts.filter(expr="__edge == False").drop_columns(["__edge"])
    if len(edge_pdf) == 0 or "h" not in edge_pdf.columns:
        return inner
    fix = edge_pdf.groupby("h", as_index=False)[out_col].sum()
    if min_count is not None:
        fix = fix[fix[out_col] >= min_count]
    if len(fix) == 0:
        return inner
    fixed = ray.data.from_arrow(
        pa.table(
            {
                "h": pa.array(fix["h"].to_numpy(), pa.int64()),
                out_col: pa.array(fix[out_col].to_numpy(), pa.int64()),
            }
        )
    )
    return inner.union(fixed)


def _in_sorted(sorted_vals: np.ndarray, probe: np.ndarray) -> np.ndarray:
    """Boolean membership of ``probe`` in an ascending-sorted u64 array."""
    if len(sorted_vals) == 0 or len(probe) == 0:
        return np.zeros(len(probe), dtype=bool)
    idx = np.searchsorted(sorted_vals, probe)
    idx[idx == len(sorted_vals)] = 0
    return sorted_vals[idx] == probe


def benchmark_ngram_hashes(
    bench: "ray.data.Dataset", text_col: str = "text", n: int = 4
) -> np.ndarray:
    """Sorted distinct n-gram hashes of a benchmark/eval set.

    Distinct is taken per block task-side; the driver only unions the
    per-block uniques. Benchmark suites are small by nature (10^5–10^7
    n-grams ≪ the corpus being decontaminated), so the result is broadcast
    via ``ray.put`` — the same small-side regime as the bloom/semi-join
    broadcast paths."""

    def block_unique(batch: pa.Table) -> pa.Table:
        _, th, offs = _doc_tokens(batch.column(text_col))
        _, h, _ = _ngram_occurrences(th, offs, n)
        return pa.table({"h": np.unique(h).view(np.int64)})

    parts = [
        np.asarray(b.column("h")).view(np.uint64)
        for b in bench.map_batches(
            block_unique, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow")
    ]
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(parts))


def decontaminate(
    corpus: "ray.data.Dataset",
    bench: "ray.data.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 4,
    min_overlap: int = 1,
) -> "ray.data.Dataset":
    """Rows ``(id_col, overlap_ngrams)`` for corpus docs sharing at least
    ``min_overlap`` DISTINCT word n-grams with the benchmark set.

    Scale shape: the benchmark n-gram hash set is broadcast once
    (``ray.put``), the corpus streams through one ``map_batches`` doing a
    sorted-array membership probe — no shuffle, no driver funnel, per-task
    memory O(|bench|). Overlap counting is per-doc-distinct (a doc repeating
    one contaminated n-gram 50× counts once), matching the SQL
    ``COUNT(DISTINCT)`` semantics."""
    bench_sorted = benchmark_ngram_hashes(bench, text_col=text_col, n=n)
    ref = ray.put(bench_sorted)

    def probe(batch: pa.Table) -> pa.Table:
        bs = ray.get(ref)
        _, th, offs = _doc_tokens(batch.column(text_col))
        _, h, doc = _ngram_occurrences(th, offs, n)
        hd, dd = _per_doc_distinct(h, doc)
        hits = _in_sorted(bs, hd)
        overlap = np.bincount(dd[hits], minlength=batch.num_rows).astype(np.int64)
        keep = overlap >= min_overlap
        # Arrow filter, not np.asarray[mask]: preserves the id column's exact
        # type (a null int64 id would float64-convert to NaN under numpy,
        # drifting the output schema to double — r5 null-id audit)
        return pa.table(
            {
                id_col: batch.column(id_col).combine_chunks().filter(pa.array(keep)),
                "overlap_ngrams": overlap[keep],
            }
        )

    return corpus.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)


def hot_ngrams(
    docs: "ray.data.Dataset",
    *,
    text_col: str = "text",
    n: int = 3,
    min_docs: int = 5,
    hot_switch: int = 5_000_000,
    as_dataset: bool = False,
    _stats: dict | None = None,
):
    """Corpus-level boilerplate: ``(ngram, n_docs)`` for every word n-gram
    appearing in >= ``min_docs`` DISTINCT documents. Returns a sorted
    ``pa.Table`` by default, or the unsorted Dataset with ``as_dataset=True``
    (the 100 TB escape hatch — never collects the hot table at all).

    Two hash-only passes: (1) per-block per-doc-distinct incidence counts
    (8-byte rows) → range-sort block-sum + threshold (``_df_counts``; the
    only wide exchange ships ``(hash, partial_count)`` int64 pairs, never
    strings); (2) a re-scan recovers each hot hash's string + count. The
    recovery has two regimes like ``dup_span_stats``: at <= ``hot_switch``
    hot hashes the ``(hash, n_docs)`` pairs broadcast once (``ray.put``) and
    each block emits its local hits; past it, blocks emit their block-distinct
    ``(h, ngram)`` rows into ONE inner hash-join against the hot table (no
    broadcast of an oversized set). Either way the per-block hits are then
    reduced to ONE representative row per hash DISTRIBUTEDLY
    (``sorted_first_per_key``) — the driver receives only the <= 2-per-block
    edge fixup, O(#blocks), never the old O(hot x blocks) collect (the r4
    'What's wrong #1' fix)."""
    from raysketch.pipeline.dedup import _num_partitions
    from raysketch.pipeline.exchange import sorted_first_per_key

    def partial(batch: pa.Table) -> pa.Table:
        _, th, offs = _doc_tokens(batch.column(text_col))
        _, h, doc = _ngram_occurrences(th, offs, n)
        hd, _ = _per_doc_distinct(h, doc)
        uh, c = np.unique(hd, return_counts=True)
        return pa.table({"h": uh.view(np.int64), "c": c.astype(np.int64)})

    inc = docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    counts = _df_counts(inc, out_col="n_docs", min_count=min_docs).materialize()
    empty = pa.table({"ngram": pa.array([], pa.string()), "n_docs": pa.array([], pa.int64())})
    n_hot = counts.count()
    if n_hot == 0:
        # nothing is hot — skip the recovery scan entirely
        return ray.data.from_arrow(empty) if as_dataset else empty

    if n_hot <= hot_switch:
        hs_l, nd_l = [], []
        for b in counts.iter_batches(batch_format="pyarrow"):
            if b.num_rows:
                hs_l.append(np.asarray(b.column("h")).view(np.uint64))
                nd_l.append(np.asarray(b.column("n_docs")))
        h_all = np.concatenate(hs_l)
        nd_all = np.concatenate(nd_l)
        order = np.argsort(h_all)
        hot_ref = ray.put((h_all[order], nd_all[order]))

        def recover(batch: pa.Table) -> pa.Table:
            hs, nds = ray.get(hot_ref)
            flat, th, offs = _doc_tokens(batch.column(text_col))
            starts, h, _ = _ngram_occurrences(th, offs, n)
            m = _in_sorted(hs, h)
            hm, sm = h[m], starts[m]
            uh, idx = np.unique(hm, return_index=True)
            # vectorized string rebuild: one token-gather per n-gram position +
            # a single element-wise join — no per-hit Python even when the hot
            # set is large (boilerplate-heavy corpora)
            pos = sm[idx]
            cols = [flat.take(pa.array(pos + j)) for j in range(n)]
            strings = pc.binary_join_element_wise(*cols, " ")
            nd = nds[np.searchsorted(hs, uh)]
            return pa.table(
                {
                    "h": uh.view(np.int64),
                    "ngram": strings,
                    "n_docs": pa.array(nd.astype(np.int64)),
                }
            )

        rec = docs.map_batches(recover, batch_format="pyarrow", zero_copy_batch=True)
    else:
        # join regime: the hot set is too big to broadcast — ship each block's
        # DISTINCT (h, ngram) rows once through a hash join with the hot table
        # (plain repartition first coalesces schema-less empty blocks, as in
        # dup_span_stats)
        def recover_all(batch: pa.Table) -> pa.Table:
            flat, th, offs = _doc_tokens(batch.column(text_col))
            starts, h, _ = _ngram_occurrences(th, offs, n)
            uh, idx = np.unique(h, return_index=True)
            pos = starts[idx]
            cols = [flat.take(pa.array(pos + j)) for j in range(n)]
            strings = pc.binary_join_element_wise(*cols, " ")
            return pa.table({"h": uh.view(np.int64), "ngram": strings})

        npart = _num_partitions()
        rec = docs.map_batches(
            recover_all, batch_format="pyarrow", zero_copy_batch=True
        ).join(counts.repartition(npart), "inner", npart, on=("h",))

    reps = sorted_first_per_key(rec, "h", ["ngram", "n_docs"], _stats=_stats)
    out_ds = reps.select_columns(["ngram", "n_docs"])
    if as_dataset:
        return out_ds
    batches = [b for b in out_ds.iter_batches(batch_format="pyarrow") if b.num_rows]
    if not batches:
        return empty
    tbl = pa.concat_tables(batches)
    return tbl.sort_by("ngram")


def _char_window_hashes(
    texts: pa.Array, L: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Rolling polynomial hashes of every length-``L`` character window of
    every doc: ``(hashes, doc_idx, n_windows_per_doc)``. One flat-buffer
    gather+fma pass per window position (L passes total, zero per-row
    Python); hash-distinct ≡ string-distinct up to 64-bit collisions."""
    from raysketch.hashing import column_spans

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    data, starts, lengths = column_spans(texts)
    nwin = np.maximum(lengths - L + 1, 0).astype(np.int64)
    total = int(nwin.sum())
    doc = np.repeat(np.arange(len(nwin), dtype=np.int64), nwin)
    if total == 0:
        return np.empty(0, dtype=np.uint64), doc, nwin
    cum = np.zeros(len(nwin) + 1, dtype=np.int64)
    np.cumsum(nwin, out=cum[1:])
    rel = np.arange(total, dtype=np.int64) - np.repeat(cum[:-1], nwin)
    pos = np.repeat(starts, nwin) + rel
    acc = np.zeros(total, dtype=np.uint64)
    d64 = data.astype(np.uint64)
    with np.errstate(over="ignore"):
        for j in range(L):
            acc = acc * _NGRAM_P + d64[pos + j]
    return acc, doc, nwin


def dup_span_stats(
    docs: "ray.data.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 16,
    dup_switch: int = 5_000_000,
) -> "ray.data.Dataset":
    """Exact-substring duplication signal (the character-level analogue of
    suffix-array dedup, Lee et al. 2022's 'exact substring' criterion at a
    fixed window): per doc, ``(id_col, n_windows, n_dup_windows)`` where a
    window is *dup* iff its exact ``window``-char string occurs in >= 2
    DISTINCT documents. Docs shorter than ``window`` emit no row.

    Two regimes like ``rare_token_stats``: window-hash df is computed with a
    hash-only incidence pass (keyed repartition + per-block multi-group sum —
    see ``_df_counts``); the df>=2 set broadcasts when small, else
    occurrences inner-join the df table on hash."""

    def df_partial(batch: pa.Table) -> pa.Table:
        h, doc, _ = _char_window_hashes(batch.column(text_col), window)
        hd, _ = _per_doc_distinct(h, doc)
        uh, c = np.unique(hd, return_counts=True)
        return pa.table({"h": uh.view(np.int64), "c": c.astype(np.int64)})

    inc = docs.map_batches(df_partial, batch_format="pyarrow", zero_copy_batch=True)
    # thresholded inside the block pass: only df>=2 hashes (the dup set) ever
    # leave it — the singleton mass (most of the window universe) stays local
    dup = _df_counts(inc, out_col="df", min_count=2).materialize()
    n_dup_hashes = dup.count()

    if n_dup_hashes <= dup_switch:
        parts = [
            np.asarray(b.column("h")).view(np.uint64)
            for b in dup.iter_batches(batch_format="pyarrow")
        ]
        ds_sorted = np.sort(np.concatenate(parts)) if parts else np.empty(0, np.uint64)
        ref = ray.put(ds_sorted)

        def score(batch: pa.Table) -> pa.Table:
            dsr = ray.get(ref)
            h, doc, nwin = _char_window_hashes(batch.column(text_col), window)
            m = _in_sorted(dsr, h)
            ndup = np.bincount(doc[m], minlength=batch.num_rows).astype(np.int64)
            keep = nwin > 0
            # Arrow filter preserves the id type (see decontaminate.probe)
            return pa.table(
                {
                    id_col: batch.column(id_col).combine_chunks().filter(pa.array(keep)),
                    "n_windows": nwin[keep],
                    "n_dup_windows": ndup[keep],
                }
            )

        return docs.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)

    def occ_partial(batch: pa.Table) -> pa.Table:
        # the join regime GROUPS by id (np.unique in reagg), where a null id
        # would corrupt — the broadcast regime above stays null-tolerant
        require_non_null_ids(batch, id_col, "dup_span_stats")
        h, doc, nwin = _char_window_hashes(batch.column(text_col), window)
        order = np.lexsort((h, doc))
        hs, ds_ = h[order], doc[order]
        first = np.ones(len(hs), dtype=bool)
        first[1:] = (hs[1:] != hs[:-1]) | (ds_[1:] != ds_[:-1])
        bounds = np.append(np.nonzero(first)[0], len(hs))
        ids = np.asarray(batch.column(id_col))
        return pa.table(
            {
                id_col: ids[ds_[first]],
                "h": hs[first].view(np.int64),
                "occ": np.diff(bounds).astype(np.int64),
                "nw": nwin[ds_[first]].astype(np.int64),
            }
        )

    npart = max(8, min(64, int(ray.cluster_resources().get("CPU", 8))))
    # left_outer against the (pre-thresholded) dup table: occurrences of
    # non-dup windows survive with a null df — needed for n_windows. Plain
    # repartition coalesces any schema-less empty dup blocks before Acero.
    joined = docs.map_batches(
        occ_partial, batch_format="pyarrow", zero_copy_batch=True
    ).join(dup.repartition(npart), "left_outer", npart, on=("h",))

    def reagg(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col))
        occ = np.asarray(batch.column("occ"))
        nw = np.asarray(batch.column("nw"))
        isdup = pc.is_valid(batch.column("df")).to_numpy(zero_copy_only=False)
        uid, inv = np.unique(ids, return_inverse=True)
        ndup = np.bincount(inv, weights=np.where(isdup, occ, 0)).astype(np.int64)
        nwin = np.zeros(len(uid), dtype=np.int64)
        np.maximum.at(nwin, inv, nw)
        return pa.table({id_col: uid, "n_windows": nwin, "__ndup": ndup})

    # per-doc final reduce: doc ids are singleton-heavy (groups ≈ docs), the
    # native-aggregate collapse shape — use the range-sort exchange instead
    from raysketch.pipeline.exchange import sorted_keyed_reduce

    per_doc = sorted_keyed_reduce(
        joined.map_batches(reagg, batch_format="pyarrow", zero_copy_batch=True),
        id_col,
        {"__ndup": "sum", "n_windows": "max"},
    )
    return per_doc.map_batches(
        lambda t: pa.table(
            {
                id_col: t.column(id_col),
                "n_windows": t.column("n_windows"),
                "n_dup_windows": t.column("__ndup"),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _split_line_hashes(batch: pa.Table, text_col: str, sep: str):
    """Per-batch line explode: ``(lists, line_hashes)`` with the repo's
    xxh64(seed=0) convention — shared by both line_dedup regimes."""
    lists = pc.split_pattern(batch.column(text_col).combine_chunks(), sep)
    flat = lists.values
    data, starts, lengths = column_spans(flat)
    return lists, xxh64_vec(data, starts, lengths, 0)


def _rebuild_from_keep(batch: pa.Table, lists, keep: np.ndarray, id_col: str, sep: str) -> pa.Table:
    """Rebuild each doc from its kept lines (one vectorized ListArray/
    binary_join pass) — shared by both line_dedup regimes."""
    offs = np.asarray(lists.offsets).astype(np.int64)
    flat = lists.values
    n = batch.num_rows
    per_doc_total = np.diff(offs)
    ck = np.zeros(len(keep) + 1, dtype=np.int64)
    np.cumsum(keep, out=ck[1:])
    n_kept = ck[offs[1:]] - ck[offs[:-1]]
    new_offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_kept, out=new_offs[1:])
    kept_lines = flat.filter(pa.array(keep)) if not bool(keep.all()) else flat
    lst = pa.ListArray.from_arrays(pa.array(new_offs, pa.int32()), kept_lines)
    clean_text = pc.binary_join(lst, sep)
    return pa.table(
        {
            id_col: batch.column(id_col),
            "clean_text": clean_text,
            "n_kept": pa.array(n_kept, pa.int64()),
            "n_removed": pa.array(per_doc_total - n_kept, pa.int64()),
        }
    )


def line_dedup(
    docs: "ray.data.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 5,
    sep: str = "\n",
    hot_switch: int = 5_000_000,
):
    """CCNet/RefinedWeb-style duplicated-line removal: drop every line that
    appears (verbatim) in >= ``min_docs`` DISTINCT documents — site
    boilerplate, nav text, cookie banners — and rebuild each document from
    its surviving lines. Returns ``(id_col, clean_text, n_kept, n_removed)``.

    Same two-pass, hash-only shape as ``hot_ngrams`` (the reference's
    build-set-then-probe workload generalized to line granularity;
    simple_benchmark.cpp whitelist/confusion loop): (1) per-block
    per-doc-distinct line-hash incidences (8-byte rows) → range-sort
    block-sum + threshold (``_df_counts``) — this exchange ships ``(hash,
    count)`` int64 pairs, never strings; (2) the drop pass, in two regimes
    like ``dup_span_stats``: at <= ``hot_switch`` hot hashes the sorted hot
    set broadcasts once via ``ray.put`` and each block drops matching lines
    locally (no further exchange); past it, docs explode to ``(id, line_no,
    h)`` int rows that inner-join the hot table (the distributed semi-join —
    a CCNet-scale hot set never transits the driver), the dropped line
    numbers co-locate per doc through ONE keyed exchange, and the drop lists
    join back to the docs for the same vectorized rebuild. Outputs are
    identical across regimes (tested)."""
    def partial(batch: pa.Table) -> pa.Table:
        lists, h = _split_line_hashes(batch, text_col, sep)
        offs = np.asarray(lists.offsets).astype(np.int64)
        doc = np.repeat(np.arange(batch.num_rows, dtype=np.int64), np.diff(offs))
        hd, _ = _per_doc_distinct(h, doc)
        uh, c = np.unique(hd, return_counts=True)
        return pa.table({"h": uh.view(np.int64), "c": c.astype(np.int64)})

    inc = docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    counts = _df_counts(inc, out_col="n_docs", min_count=min_docs).materialize()
    n_hot = counts.count()

    if n_hot <= hot_switch:
        if n_hot == 0:
            hot_ref = None
        else:
            parts = [
                np.asarray(b.column("h")).view(np.uint64)
                for b in counts.iter_batches(batch_format="pyarrow")
                if b.num_rows
            ]
            hot_ref = ray.put(np.sort(np.concatenate(parts)))

        def clean(batch: pa.Table) -> pa.Table:
            hs = ray.get(hot_ref) if hot_ref is not None else np.empty(0, np.uint64)
            lists, h = _split_line_hashes(batch, text_col, sep)
            keep = ~_in_sorted(hs, h)
            return _rebuild_from_keep(batch, lists, keep, id_col, sep)

        return docs.map_batches(clean, batch_format="pyarrow", zero_copy_batch=True)

    # join regime
    from raysketch.pipeline.dedup import _num_partitions
    from raysketch.pipeline.export import _keyed_parts

    npart = _num_partitions()

    def explode(batch: pa.Table) -> pa.Table:
        require_non_null_ids(batch, id_col, "line_dedup")
        lists, h = _split_line_hashes(batch, text_col, sep)
        offs = np.asarray(lists.offsets).astype(np.int64)
        d = np.diff(offs)
        ids = np.asarray(batch.column(id_col))
        total = int(offs[-1]) if len(offs) else 0
        line_no = np.arange(total, dtype=np.int64) - np.repeat(offs[:-1], d)
        # explicit id type: an empty (or all-empty-doc) batch would otherwise
        # infer a null-typed column and break block schema unification for
        # string doc ids
        id_type = batch.schema.field(id_col).type
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, d), type=id_type),
                "line_no": pa.array(line_no),
                "h": pa.array(h.view(np.int64)),
            }
        )

    lines = docs.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )
    drops = lines.join(
        counts.select_columns(["h"]).repartition(npart), "inner", npart, on=("h",)
    ).select_columns([id_col, "line_no"])

    from raysketch.pipeline.dedup import _pack_u64_binary, _unpack_u64_binary

    def to_packed(batch: pa.Table) -> pa.Table:
        # Acero joins reject list-typed non-key fields, so the per-doc drop
        # list travels as a packed u64 binary blob (the dedup.py convention)
        m = batch.num_rows
        if m == 0:
            # derive the id column from the batch so string doc ids keep
            # their type (a hardcoded int64 would conflict with sibling
            # blocks at join-schema unification)
            return pa.table(
                {
                    id_col: batch.column(id_col),
                    "__drop_blob": pa.array([], pa.large_binary()),
                }
            )
        ids = np.asarray(batch.column(id_col).combine_chunks())
        ln = np.asarray(batch.column("line_no").combine_chunks())
        order = np.lexsort((ln, ids))
        ids_s, ln_s = ids[order], ln[order]
        new = np.ones(m, dtype=bool)
        new[1:] = ids_s[1:] != ids_s[:-1]
        starts = np.nonzero(new)[0]
        counts = np.diff(np.append(starts, m)).astype(np.int64)
        blob = _pack_u64_binary(ln_s.astype(np.uint64), counts)
        return pa.table({id_col: pa.array(ids_s[starts]), "__drop_blob": blob})

    # whole-doc drop groups must co-locate (list emission — the keyed-
    # repartition case, CLAUDE.md), then the bounded drop lists join back
    drop_lists = _keyed_parts(drops, [id_col], npart).map_batches(
        to_packed, batch_format="pyarrow", batch_size=None
    )
    joined = docs.select_columns([id_col, text_col]).join(
        drop_lists.repartition(npart), "left_outer", npart, on=(id_col,)
    )

    def clean_join(batch: pa.Table) -> pa.Table:
        lists, _h = _split_line_hashes(batch, text_col, sep)
        offs = np.asarray(lists.offsets).astype(np.int64)
        total = int(offs[-1]) if len(offs) else 0
        keep = np.ones(total, dtype=bool)
        dl = pc.fill_null(batch.column("__drop_blob").combine_chunks(), b"")
        vals, voffs = _unpack_u64_binary(dl)
        lens = np.diff(voffs)
        if len(vals):
            doc_of = np.repeat(np.arange(batch.num_rows, dtype=np.int64), lens)
            keep[offs[doc_of] + vals.astype(np.int64)] = False
        return _rebuild_from_keep(batch, lists, keep, id_col, sep)

    return joined.map_batches(clean_join, batch_format="pyarrow", batch_size=None)
