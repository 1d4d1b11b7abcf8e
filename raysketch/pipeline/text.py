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
    start_rel = pc.find_substring(html, _OPEN).to_numpy(zero_copy_only=False).astype(np.int64)
    end_rel = pc.find_substring(html, _CLOSE).to_numpy(zero_copy_only=False).astype(np.int64)
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
