"""Text stages: HTML→text extraction (byte-stable), token counting, quality
scoring, language-ID heuristic, content fingerprinting.

``extract_text`` is the pipeline's per-row invariant surface (BASELINE.json
``input_hint``: byte-identical extracted text per url between the distributed
pipeline and the single-process oracle path). It is fully vectorized: substring
positions via ``pc.find_substring``, then one ragged gather over the flat Arrow
data buffer — no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raysketch.hashing import column_spans, hash_column
from raysketch.pipeline.contracts import require_non_null_ids

_OPEN = b"<p>"
_CLOSE = b"</p>"


def extract_text_array(html: pa.Array) -> pa.Array:
    """Extract the bytes between the first ``<p>`` and the following ``</p>`` of
    each html cell; rows without both markers yield empty strings."""
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    n = len(html)
    if n == 0:
        return pa.array([], type=pa.string())
    # fill_null(-1) BEFORE the int cast: null html rows yield null positions,
    # and to_numpy would surface them as NaN whose int64 cast is undefined
    # (numpy RuntimeWarning; value happens to be INT64_MIN). -1 = "not found"
    # routes nulls through the same empty-string branch as marker-less rows.
    start_rel = (
        pc.fill_null(pc.find_substring(html, _OPEN), -1)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    end_rel = (
        pc.fill_null(pc.find_substring(html, _CLOSE), -1)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    data, starts, lengths = column_spans(html)
    valid = (start_rel >= 0) & (end_rel > start_rel)
    s = np.where(valid, starts + start_rel + len(_OPEN), 0)
    e = np.where(valid, starts + end_rel, 0)
    out_len = (e - s).astype(np.int64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(out_len, out=offsets[1:])
    total = int(offsets[-1])
    # ragged gather: out[j] spans data[s[j] : e[j]]
    idx = np.repeat(s, out_len) + (np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], out_len))
    buf = data[idx] if total else np.empty(0, dtype=np.uint8)
    if total >= 2**31:
        # int32 offsets would silently wrap (same guard as chunk_text_batch);
        # a >2 GiB extracted-text batch means the block size is wrong upstream
        raise ValueError(
            f"extract_text_array: batch extracts {total} text bytes, past the "
            "2 GiB utf8 offset limit — shrink the read/batch size"
        )
    return pa.Array.from_buffers(
        pa.utf8(),
        n,
        [None, pa.py_buffer(offsets.astype(np.int32)), pa.py_buffer(buf)],
    )


def extract_text_batch(batch: pa.Table, html_col: str = "html", out_col: str = "text") -> pa.Table:
    text = extract_text_array(batch.column(html_col))
    if out_col in batch.column_names:
        batch = batch.drop_columns([out_col])
    batch = batch.append_column(out_col, text)
    # project the heavy binary column away immediately (SURVEY.md §7 hard part f)
    return batch.drop_columns([html_col])


# ---------------------------------------------------------------------------
# analysis stages (each SQL-oracle-matchable where noted)
# ---------------------------------------------------------------------------


def token_count_batch(batch: pa.Table, col: str = "text", out: str = "n_tokens") -> pa.Table:
    """Whitespace token count — oracle: ``len(regexp_extract_all(text, '\\S+'))``."""
    counts = pc.count_substring_regex(batch.column(col), r"\S+")
    return batch.append_column(out, pc.cast(counts, pa.int64()))


# GPT-2-style pre-tokenizer, simplified to stay RE2-compatible (no lookahead):
# contractions, space-prefixed letter runs, digit runs, punctuation runs, then
# residual whitespace. Arrow's count_substring_regex and DuckDB's
# regexp_extract_all both run RE2, so the SQL oracle is semantics-identical.
BPE_PRETOKEN_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def token_count_bpe_batch(
    batch: pa.Table, col: str = "text", out: str = "n_bpe_tokens"
) -> pa.Table:
    """BPE-pretokenizer token count (the unit a GPT-2-family tokenizer would
    merge within) — the second token-budget estimator next to the whitespace
    count; vectorized RE2 over the whole column."""
    counts = pc.count_substring_regex(batch.column(col), BPE_PRETOKEN_RE)
    return batch.append_column(out, pc.cast(counts, pa.int64()))


def quality_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Deterministic quality features: char count, token count, mean token length,
    uppercase ratio is skipped (synthetic corpus is lowercase). All SQL-matchable."""
    text = batch.column(col)
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_tokens = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64())
    n_spaces = pc.cast(pc.count_substring(text, " "), pa.int64())
    batch = batch.append_column("q_chars", n_chars)
    batch = batch.append_column("q_tokens", n_tokens)
    batch = batch.append_column("q_spaces", n_spaces)
    mean_tok = pc.divide(
        pc.cast(pc.subtract(n_chars, n_spaces), pa.float64()),
        pc.cast(pc.max_element_wise(n_tokens, 1), pa.float64()),
    )
    return batch.append_column("q_mean_token_len", mean_tok)


_2GRAM_P = np.uint64(0x9E3779B97F4A7C15)  # odd mixer for adjacent-token combine


def _segment_dup_stats(
    h: np.ndarray, seg: np.ndarray, weights: np.ndarray, nseg: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-segment duplicate statistics over (hash, segment) items in ONE lexsort
    pass: ``(n_items, n_distinct, dup_weight, max_run)`` where ``dup_weight``
    sums the weights of every occurrence belonging to a value seen ≥2 times in
    its segment and ``max_run`` is the count of the segment's most frequent
    value."""
    n_items = np.bincount(seg, minlength=nseg)
    n_distinct = np.zeros(nseg, dtype=np.int64)
    dup_weight = np.zeros(nseg, dtype=np.float64)
    max_run = np.zeros(nseg, dtype=np.int64)
    if len(h) == 0:
        return n_items, n_distinct, dup_weight, max_run
    order = np.lexsort((h, seg))
    hs, ss, ws = h[order], seg[order], weights[order]
    new = np.empty(len(hs), dtype=bool)
    new[0] = True
    new[1:] = (hs[1:] != hs[:-1]) | (ss[1:] != ss[:-1])
    run_id = np.cumsum(new) - 1
    run_len = np.bincount(run_id)
    run_seg = ss[new]
    n_distinct += np.bincount(run_seg, minlength=nseg)
    run_w = np.bincount(run_id, weights=ws)
    dup_weight += np.bincount(
        run_seg, weights=np.where(run_len >= 2, run_w, 0.0), minlength=nseg
    )
    np.maximum.at(max_run, run_seg, run_len)
    return n_items, n_distinct, dup_weight, max_run


def repetition_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1, public) — the
    standard web-corpus quality gates, fully vectorized (Arrow split + one
    lexsort per signal, no per-row Python):

    - ``r_dup_line_frac``: ``(n_lines − n_distinct_lines) / n_lines`` over
      ``\\n``-split lines (empty segments count as lines, as in the paper);
    - ``r_dup_line_char_frac``: characters belonging to any line whose text
      occurs ≥2 times in the doc, over total line characters;
    - ``r_top2gram_frac``: occurrences of the most frequent word 2-gram over
      the doc's 2-gram count (occurrence fraction — a deliberate simplification
      of the paper's character fraction, stated here so oracles can match it).

    Every fraction is one float64 division of exact integer counts, so a SQL
    oracle computing the same integers matches bit-exactly."""
    text = batch.column(col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    ndoc = len(text)
    lines = pc.split_pattern(text, "\n")
    offs = np.asarray(lines.offsets).astype(np.int64)
    flat = lines.values
    lseg = np.repeat(np.arange(ndoc, dtype=np.int64), np.diff(offs))
    lh = hash_column(flat)
    lchars = np.asarray(pc.utf8_length(flat)).astype(np.float64)
    n_lines, n_distinct, dup_chars, _ = _segment_dup_stats(lh, lseg, lchars, ndoc)
    tot_chars = np.bincount(lseg, weights=lchars, minlength=ndoc)
    dup_line_frac = np.where(
        n_lines > 0, (n_lines - n_distinct) / np.maximum(n_lines, 1), 0.0
    )
    dup_line_char_frac = np.where(
        tot_chars > 0, dup_chars / np.maximum(tot_chars, 1.0), 0.0
    )

    from raysketch.pipeline.dedup import _token_hashes

    th, doffs = _token_hashes(text)
    tseg = np.repeat(np.arange(ndoc, dtype=np.int64), np.diff(doffs))
    if len(th) >= 2:
        with np.errstate(over="ignore"):
            g = th[:-1] * _2GRAM_P + th[1:]
        valid = tseg[:-1] == tseg[1:]
        g, gseg = g[valid], tseg[:-1][valid]
    else:
        g = np.empty(0, dtype=np.uint64)
        gseg = np.empty(0, dtype=np.int64)
    n2, _, _, max2 = _segment_dup_stats(g, gseg, np.zeros(len(g)), ndoc)
    top2 = np.where(n2 > 0, max2 / np.maximum(n2, 1), 0.0)

    batch = batch.append_column("r_dup_line_frac", pa.array(dup_line_frac, pa.float64()))
    batch = batch.append_column(
        "r_dup_line_char_frac", pa.array(dup_line_char_frac, pa.float64())
    )
    return batch.append_column("r_top2gram_frac", pa.array(top2, pa.float64()))


_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "sich"],
    "fr": ["le", "la", "les", "et", "des", "est", "une", "dans", "que", "pour"],
    "es": ["el", "la", "los", "las", "y", "es", "una", "en", "que", "por"],
    "tr": ["ve", "bir", "bu", "da", "için", "ile", "olarak", "gibi", "çok", "daha"],
    "zh": ["的", "是", "不", "了", "在", "人", "有", "我", "他", "这"],
}


class LangIdStage:
    """Heuristic language ID by function-word hits — stateful stage: the sorted
    marker-hash table is built once per actor (the model-load-in-__init__
    pattern).

    Fully vectorized batch path (no ``to_pylist``, no per-row regex): Arrow
    ``utf8_lower`` → one xxh64 pass over all whitespace tokens of the batch
    (``_token_hashes``) → binary-search lookup against the hashed marker table →
    per-(doc, lang) scores via 1-D cumsum segment sums → argmax. Only the first
    ``max_tokens`` tokens of each document are scored (bounded per-doc cost on
    arbitrarily long web documents — positions past the cap are masked out
    before the cumsum). Ties and zero-score docs resolve exactly as the scalar
    version (first language wins; no hits → "und")."""

    def __init__(self, col: str = "text", out: str = "lang_pred", max_tokens: int = 200):
        from raysketch.hashing import xxh64_scalar

        self.col = col
        self.out = out
        self.max_tokens = int(max_tokens)
        self.langs = list(_LANG_MARKERS)
        hashes, lidx = [], []
        for li, words in enumerate(_LANG_MARKERS.values()):
            for w in words:
                hashes.append(xxh64_scalar(w.encode(), 0))
                lidx.append(li)
        h = np.array(hashes, dtype=np.uint64)
        order = np.argsort(h)
        self.marker_h = h[order]
        self.marker_lang = np.array(lidx, dtype=np.int64)[order]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from raysketch.pipeline.dedup import _token_hashes

        texts = batch.column(self.col).combine_chunks()
        lowered = pc.utf8_lower(texts)
        th, doc_offs = _token_hashes(lowered)
        ndoc = len(doc_offs) - 1
        if len(th) == 0:
            return batch.append_column(self.out, pa.array(["und"] * ndoc, pa.string()))
        idx = np.clip(np.searchsorted(self.marker_h, th), 0, len(self.marker_h) - 1)
        lang_of = np.where(self.marker_h[idx] == th, self.marker_lang[idx], -1)
        # cap: only the first max_tokens tokens of each doc contribute a score
        d = np.diff(doc_offs)
        pos_in_doc = np.arange(len(th), dtype=np.int64) - np.repeat(doc_offs[:-1], d)
        lang_of = np.where(pos_in_doc < self.max_tokens, lang_of, -1)
        best_score = np.zeros(ndoc, dtype=np.int64)
        best_lang = np.full(ndoc, -1, dtype=np.int64)
        cs = np.empty(len(th) + 1, dtype=np.int64)
        cs[0] = 0
        for li in range(len(self.langs)):
            np.cumsum(lang_of == li, out=cs[1:])
            score = cs[doc_offs[1:]] - cs[doc_offs[:-1]]
            better = score > best_score
            best_score = np.where(better, score, best_score)
            best_lang = np.where(better, li, best_lang)
        langs_arr = np.array(self.langs)
        preds = np.where(best_lang >= 0, langs_arr[np.maximum(best_lang, 0)], "und")
        return batch.append_column(self.out, pa.array(preds.tolist(), type=pa.string()))


def fingerprint_batch(batch: pa.Table, col: str = "text", out: str = "fingerprint") -> pa.Table:
    """64-bit content fingerprint (xxh64 of the text bytes) — the content-hash used
    for exact dedup. Vectorized; deterministic."""
    h = hash_column(batch.column(col).combine_chunks(), algo="xxh64", seed=0)
    return batch.append_column(out, pa.array(h))


# ---------------------------------------------------------------------------
# corpus-frequency quality scoring + pattern redaction
# ---------------------------------------------------------------------------


def rare_token_stats(
    docs,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 10,
    common_switch: int = 5_000_000,
):
    """Per-doc rare-token counts: ``(id_col, n_tokens, n_rare)`` where
    ``n_rare`` is the number of token OCCURRENCES whose corpus document
    frequency is below ``min_df`` — the OOV/misspelling-rate quality signal
    of CCNet-style filtering, exactly (no LM, no floats, SQL-checkable).

    Scale shape: pass 1 computes df hash-only (per-doc-distinct incidences →
    keyed repartition + per-block multi-group sum, ``decontam._df_counts`` —
    the native hash aggregate collapses on singleton-heavy key universes).
    The probe side then flags the COMMON complement:
    ``|{t : df_t >= K}| <= (Σ_t df_t)/K``, so the broadcast side is bounded by
    corpus_size/K regardless of vocabulary size — rare tokens (the unbounded
    Zipf tail) never ship anywhere. If the common set still exceeds
    ``common_switch`` the probe switches to a distributed hash join on token
    hash (same regime split as the semi/anti-join and exact-dedup paths).
    """
    import ray

    from raysketch.pipeline.decontam import (
        _df_counts,
        _doc_tokens,
        _in_sorted,
        _per_doc_distinct,
    )

    def df_partial(batch: pa.Table) -> pa.Table:
        _, th, offs = _doc_tokens(batch.column(text_col))
        doc = np.repeat(np.arange(len(offs) - 1, dtype=np.int64), np.diff(offs))
        hd, _ = _per_doc_distinct(th, doc)
        uh, c = np.unique(hd, return_counts=True)
        return pa.table({"h": uh.view(np.int64), "c": c.astype(np.int64)})

    inc = docs.map_batches(df_partial, batch_format="pyarrow", zero_copy_batch=True)
    common = _df_counts(inc, out_col="df", min_count=min_df).materialize()
    n_common = common.count()

    if n_common <= common_switch:
        parts = [
            np.asarray(b.column("h")).view(np.uint64)
            for b in common.iter_batches(batch_format="pyarrow")
        ]
        cs = np.sort(np.concatenate(parts)) if parts else np.empty(0, np.uint64)
        ref = ray.put(cs)

        def score(batch: pa.Table) -> pa.Table:
            csr = ray.get(ref)
            _, th, offs = _doc_tokens(batch.column(text_col))
            n_tokens = np.diff(offs)
            doc = np.repeat(np.arange(len(offs) - 1, dtype=np.int64), n_tokens)
            m = _in_sorted(csr, th)
            ncom = np.bincount(doc[m], minlength=batch.num_rows)
            return pa.table(
                {
                    id_col: batch.column(id_col),
                    "n_tokens": n_tokens.astype(np.int64),
                    "n_rare": (n_tokens - ncom).astype(np.int64),
                }
            )

        return docs.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)

    # distributed-join regime: explode per-doc occurrence counts of each token
    # hash (pre-aggregated in-batch: one row per (doc, distinct token)),
    # left_outer-join the pre-thresholded common table (df null → rare),
    # re-aggregate per doc
    def occ_partial(batch: pa.Table) -> pa.Table:
        # the join regime GROUPS by id downstream (np.unique in reagg) — the
        # broadcast regime above never consumes ids and stays null-tolerant
        require_non_null_ids(batch, id_col, "rare_token_stats")
        _, th, offs = _doc_tokens(batch.column(text_col))
        n_tokens = np.diff(offs)
        doc = np.repeat(np.arange(len(offs) - 1, dtype=np.int64), n_tokens)
        order = np.lexsort((th, doc))
        hs, ds_ = th[order], doc[order]
        first = np.ones(len(hs), dtype=bool)
        first[1:] = (hs[1:] != hs[:-1]) | (ds_[1:] != ds_[:-1])
        bounds = np.append(np.nonzero(first)[0], len(hs))
        occ = np.diff(bounds)
        ids = np.asarray(batch.column(id_col))
        out_ids = ids[ds_[first]]
        out_h = hs[first].view(np.int64)
        out_occ = occ.astype(np.int64)
        out_nt = n_tokens[ds_[first]].astype(np.int64)
        # zero-token docs have no occurrence rows and would VANISH from the
        # join regime (the broadcast regime emits them with n_rare=0): give
        # each a sentinel occ=0 row — even a hash-collision match contributes
        # 0 to the common count, so the result is exact either way
        empty = n_tokens == 0
        if empty.any():
            eids = ids[empty]
            out_ids = np.concatenate([out_ids, eids])
            out_h = np.concatenate([out_h, np.zeros(len(eids), dtype=np.int64)])
            out_occ = np.concatenate([out_occ, np.zeros(len(eids), dtype=np.int64)])
            out_nt = np.concatenate([out_nt, np.zeros(len(eids), dtype=np.int64)])
        return pa.table(
            {id_col: out_ids, "h": out_h, "occ": out_occ, "nt": out_nt}
        )

    npart = max(8, min(64, int(ray.cluster_resources().get("CPU", 8))))
    joined = docs.map_batches(
        occ_partial, batch_format="pyarrow", zero_copy_batch=True
    ).join(common.repartition(npart), "left_outer", npart, on=("h",))

    def reagg(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col))
        occ = np.asarray(batch.column("occ"))
        nt = np.asarray(batch.column("nt"))
        com = pc.is_valid(batch.column("df")).to_numpy(zero_copy_only=False)
        uid, inv = np.unique(ids, return_inverse=True)
        ncom = np.bincount(inv, weights=np.where(com, occ, 0)).astype(np.int64)
        # n_tokens of a doc rides every row; max-per-doc recovers it
        ntok = np.zeros(len(uid), dtype=np.int64)
        np.maximum.at(ntok, inv, nt)
        return pa.table({id_col: uid, "n_tokens": ntok, "__ncom": ncom})

    # per-doc final reduce: doc ids are singleton-heavy (groups ≈ docs), the
    # native-aggregate collapse shape — use the range-sort exchange instead
    from raysketch.pipeline.exchange import sorted_keyed_reduce

    per_doc = sorted_keyed_reduce(
        joined.map_batches(reagg, batch_format="pyarrow", zero_copy_batch=True),
        id_col,
        {"__ncom": "sum", "n_tokens": "max"},
    )
    return per_doc.map_batches(
        lambda t: pa.table(
            {
                id_col: t.column(id_col),
                "n_tokens": t.column("n_tokens"),
                "n_rare": pc.subtract(t.column("n_tokens"), t.column("__ncom")),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


def redact_batch(
    batch: pa.Table,
    col: str = "text",
    pattern: str = _EMAIL_RE,
    replacement: str = "[REDACTED]",
) -> pa.Table:
    """PII-style pattern redaction, fully vectorized (Arrow RE2 kernels):
    counts matches per row and replaces ALL of them. Adds ``n_matches`` and
    ``redacted_len`` and rewrites ``col`` in place. RE2 on both Arrow and
    DuckDB makes the per-row counts/lengths SQL-oracle-checkable."""
    txt = batch.column(col).combine_chunks()
    n = pc.cast(pc.count_substring_regex(txt, pattern), pa.int64())
    red = pc.replace_substring_regex(txt, pattern, replacement)
    out = batch.set_column(batch.schema.get_field_index(col), col, red)
    out = out.append_column("n_matches", n)
    return out.append_column("redacted_len", pc.cast(pc.utf8_length(red), pa.int64()))


def normalize_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Canonical text normalization for dedup/fingerprint pre-passes:
    lowercase → collapse whitespace runs to single spaces → strip. All Arrow
    kernels (utf8_lower / RE2 replace / trim); byte-identical to SQL
    ``trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))`` on ASCII (the
    synthetic corpora; non-ASCII case tables may differ between engines and
    are property-tested, not oracle-checked)."""
    txt = batch.column(col).combine_chunks()
    norm = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(pc.utf8_lower(txt), r"\s+", " ")
    )
    i = batch.schema.get_field_index(col)
    return batch.set_column(i, col, norm)


def bounded_quantile_thresholds(
    ds,
    col: str,
    lo_q: float = 0.05,
    hi_q: float = 0.95,
) -> tuple[int, int]:
    """EXACT distributed quantile thresholds for a BOUNDED-CARDINALITY integer
    column (char/token lengths, small scores): per-block value counts → one
    tiny (value, count) exchange → cumulative scan. ``lo`` is the smallest
    value v with cum_count(v) >= ceil(lo_q·n); ``hi`` the smallest with
    cum_count(v) >= ceil(hi_q·n) — a definition stated from first principles
    so a SQL oracle can reproduce it without engine-specific quantile
    semantics. The driver step is bounded by the number of DISTINCT values
    (the operator's stated assumption), never by rows."""

    def part(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch.column(col)).astype(np.int64)
        uv, c = np.unique(v, return_counts=True)
        return pa.table({"v": uv, "c": c.astype(np.int64)})

    import pandas as pd

    raw = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    if len(raw) == 0 or "v" not in raw.columns:
        # a zero-row counts frame loses its schema through to_pandas (the
        # documented empty-Dataset gotcha) — the groupby below would raise an
        # opaque KeyError; fail with a clear message instead
        raise ValueError(f"bounded_quantile_thresholds: dataset has no rows in column {col!r}")
    counts = (
        raw.groupby("v", as_index=False)["c"]
        .sum()
        .sort_values("v", ignore_index=True)
    )
    cum = counts["c"].cumsum()
    n = int(cum.iloc[-1])
    lo_rank = int(np.ceil(lo_q * n))
    hi_rank = int(np.ceil(hi_q * n))
    lo = int(counts["v"][cum >= lo_rank].iloc[0])
    hi = int(counts["v"][cum >= hi_rank].iloc[0])
    return lo, hi


def length_filter(
    docs,
    *,
    col: str = "n_chars",
    id_col: str = "doc_id",
    lo_q: float = 0.05,
    hi_q: float = 0.95,
):
    """Percentile-based outlier trimming (the web-pipeline length gate), with
    EXACT thresholds: keep rows whose ``col`` lies in the closed interval
    [P_lo, P_hi] computed by ``bounded_quantile_thresholds``. Returns
    ``(filtered_dataset, lo, hi)``; the filter pass is one vectorized
    map_batches, thresholds ride the closure (two scans total, no shuffle)."""
    lo, hi = bounded_quantile_thresholds(docs, col, lo_q, hi_q)

    def keep(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch.column(col)).astype(np.int64)
        return batch.filter(pa.array((v >= lo) & (v <= hi)))

    return docs.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True), lo, hi


# ---------------------------------------------------------------------------
# URL canonicalization (webtext pipelines dedup by canonical URL before any
# content pass; reference anchor: the whitelist key normalization this
# generalizes, simple_benchmark.cpp whitelist reader)
# ---------------------------------------------------------------------------

_URL_RE = r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?P<host>[^/#?]+)(?P<rest>[^#]*)(?P<frag>#.*)?$"


def canonicalize_url_array(urls: pa.Array) -> pa.Array:
    """Vectorized URL canonicalization: lowercase scheme and host, strip the
    scheme's default port (:80 for http, :443 for https), drop the fragment,
    and normalize an empty path to "/". Rows that don't parse as
    scheme://host... pass through unchanged. One ``extract_regex`` + Arrow
    kernels — no per-row Python."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    m = pc.extract_regex(urls, _URL_RE)
    valid = m.is_valid()
    scheme = pc.ascii_lower(pc.struct_field(m, "scheme"))
    host = pc.ascii_lower(pc.struct_field(m, "host"))
    h80 = pc.replace_substring_regex(host, ":80$", "")
    h443 = pc.replace_substring_regex(host, ":443$", "")
    host = pc.if_else(
        pc.equal(scheme, "http"),
        h80,
        pc.if_else(pc.equal(scheme, "https"), h443, host),
    )
    rest = pc.struct_field(m, "rest")
    rest = pc.if_else(pc.equal(rest, ""), pa.scalar("/"), rest)
    canon = pc.binary_join_element_wise(
        scheme, pa.scalar("://"), host, rest, pa.scalar(""), null_handling="replace"
    )
    return pc.if_else(valid, canon, urls)


def canonicalize_url_batch(
    batch: pa.Table, col: str = "url", out: str = "canonical_url"
) -> pa.Table:
    return batch.append_column(out, canonicalize_url_array(batch.column(col)))


# utf8's int32 data-offset ceiling; module-level so the overflow error path is
# testable without a 2 GiB allocation
_UTF8_OFFSET_LIMIT = 2**31


def chunk_text_batch(
    batch: pa.Table,
    col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 256,
    stride: int = 192,
    large: bool = False,
) -> pa.Table:
    """Overlapping-window document chunking (the RAG/embedding-pipeline
    pre-pass): one chunk per window start ``k*stride < len(text)``, each
    ``chunk_size`` bytes, with both chunk boundaries SNAPPED BACK to UTF-8
    codepoint starts (a continuation byte is ``(b & 0xC0) == 0x80``; ≤3
    vectorized snap steps) so every emitted chunk is valid UTF-8 — without
    snapping, a boundary cutting a multi-byte character emits bytes that
    ``pa.Array.from_buffers`` accepts unvalidated and that explode with
    UnicodeDecodeError on first read. On pure-ASCII text the snap is a
    bitwise no-op, so the SQL ``substring`` oracle still matches byte==char;
    on multibyte text ``start_off`` reports the snapped byte offset and no
    byte is lost (the straddling codepoint moves whole into the next chunk).
    Zero-length docs emit no chunks. Fully vectorized: per-doc window
    counts, one ``np.repeat`` fan-out and one ragged byte gather — the
    ``extract_text_array`` pattern.

    ``large=False`` (default) emits utf8 and raises past the 2 GiB
    int32-offset limit; ``large=True`` emits large_utf8 (int64 offsets) for
    EVERY batch. The type must be chosen up front, not promoted per batch —
    a size-triggered per-batch promotion would mix utf8/large_utf8 blocks
    in one column and break schema unification exactly when it fires."""
    if chunk_size < 4:
        # both boundaries of a chunk narrower than one UTF-8 codepoint
        # (max 4 bytes) can snap into the same character, silently emitting
        # empty chunks and LOSING the document bytes
        raise ValueError(
            f"chunk_text_batch: chunk_size must be >= 4 bytes (one UTF-8 "
            f"codepoint); got {chunk_size}"
        )
    chunk_type = pa.large_utf8() if large else pa.utf8()
    text = batch.column(col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    id_arr = batch.column(id_col)
    if isinstance(id_arr, pa.ChunkedArray):
        id_arr = id_arr.combine_chunks()
    data, starts, lengths = column_spans(text)
    n_chunks = np.where(lengths > 0, (lengths + stride - 1) // stride, 0).astype(np.int64)
    total = int(n_chunks.sum())
    if total == 0:
        return pa.table(
            {
                id_col: pa.array([], batch.schema.field(id_col).type),
                "chunk_idx": pa.array([], pa.int64()),
                "start_off": pa.array([], pa.int64()),
                "chunk_text": pa.array([], chunk_type),
            }
        )
    doc_idx = np.repeat(np.arange(len(id_arr), dtype=np.int64), n_chunks)
    bounds = np.zeros(len(id_arr) + 1, dtype=np.int64)
    np.cumsum(n_chunks, out=bounds[1:])
    chunk_idx = np.arange(total, dtype=np.int64) - np.repeat(bounds[:-1], n_chunks)
    start_off = chunk_idx * stride
    doc_start = starts[doc_idx]
    doc_end = doc_start + lengths[doc_idx]
    abs_start = doc_start + start_off
    abs_end = doc_start + np.minimum(start_off + chunk_size, lengths[doc_idx])
    # snap both boundaries BACK to codepoint starts (≤3 continuation bytes per
    # UTF-8 char). A boundary at position p is valid iff data[p] is not a
    # continuation byte or p == doc_end; doc_start is always valid.
    if len(data):
        is_cont = (data & 0xC0) == 0x80
        for _ in range(3):
            mv = (abs_start > doc_start) & is_cont[np.minimum(abs_start, len(data) - 1)]
            abs_start -= mv
            mv = (abs_end < doc_end) & is_cont[np.minimum(abs_end, len(data) - 1)]
            abs_end -= mv
    # degenerate geometry (stride < codepoint width, only possible when
    # stride <= 3): consecutive raw starts can snap to the SAME position —
    # keep the last chunk of each equal-start run (it has the largest end)
    if total > 1:
        dup = np.zeros(total, dtype=bool)
        dup[:-1] = (doc_idx[:-1] == doc_idx[1:]) & (abs_start[:-1] == abs_start[1:])
        if dup.any():
            keep = ~dup
            doc_idx, abs_start, abs_end = doc_idx[keep], abs_start[keep], abs_end[keep]
            doc_start = doc_start[keep]
            total = int(keep.sum())
            first = np.ones(total, dtype=bool)
            first[1:] = doc_idx[1:] != doc_idx[:-1]
            seg = np.nonzero(first)[0]
            counts = np.diff(np.append(seg, total))
            chunk_idx = np.arange(total, dtype=np.int64) - np.repeat(seg, counts)
    start_off = abs_start - doc_start
    clen = abs_end - abs_start
    offsets = np.zeros(total + 1, dtype=np.int64)
    np.cumsum(clen, out=offsets[1:])
    grand = int(offsets[-1])
    idx = np.repeat(abs_start, clen) + (
        np.arange(grand, dtype=np.int64) - np.repeat(offsets[:-1], clen)
    )
    buf = data[idx] if grand else np.empty(0, dtype=np.uint8)
    if large:
        chunks = pa.Array.from_buffers(
            pa.large_utf8(),
            total,
            [None, pa.py_buffer(offsets), pa.py_buffer(buf)],
        )
    elif grand >= _UTF8_OFFSET_LIMIT:
        # int32 offsets would silently wrap (the _pack_u64_binary lesson) —
        # and silently promoting ONLY this batch would mix utf8/large_utf8
        # blocks in one column: fail with the remedy instead
        raise ValueError(
            f"chunk_text_batch: batch expands to {grand} chunk bytes, past the "
            "2 GiB utf8 offset limit — pass large=True (large_utf8 for every "
            "batch) or shrink the batch size"
        )
    else:
        chunks = pa.Array.from_buffers(
            pa.utf8(),
            total,
            [None, pa.py_buffer(offsets.astype(np.int32)), pa.py_buffer(buf)],
        )
    return pa.table(
        {
            # Arrow take, not numpy gather: preserves the id column's exact
            # type (null int64 ids would float64-convert — r5 audit)
            id_col: id_arr.take(pa.array(doc_idx)),
            "chunk_idx": pa.array(chunk_idx),
            "start_off": pa.array(start_off),
            "chunk_text": chunks,
        }
    )
