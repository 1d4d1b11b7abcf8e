"""Driver contract for the graft builder (Ray Data target).

``entry()`` — flagship pipeline on /root/testdata/sf0.001 (Ray already initialised
by the driver; nothing here calls ray.init).
``queries()`` — one callable per implemented pipeline/operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL for EVERY query. Exactly-reproducible
queries state their result directly; approximate/sketch queries emit
deterministic INVARIANT ROWS (exact counts + published-error-bound booleans,
planted-fixture cluster tables) whose SQL counterpart is exactly stateable —
so the driver's hash-compare gate covers all 44 entries. Raw estimates/samples
stay available through the library API and are asserted in tests/.

Column names in each Ray result match the SQL aliases exactly (the driver compares
sorted-by-name columns + order-insensitive value hashes).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# invariant-row helpers: the approximate/sketch queries emit DETERMINISTIC rows
# (exact counts + published-error-bound booleans) that an ANSI-SQL oracle can
# state, so the driver's hash-compare gate covers them too (the pattern proven
# by cms_event_types/heavy_hitters in round 2). The raw estimates/samples stay
# available through the library API and are asserted in tests/.
# ---------------------------------------------------------------------------

_HLL_3SIGMA = 3 * 1.04 / 128.0  # p=14 → 3·(1.04/√2^14) ≈ 0.0244 (Flajolet et al.)


def _distinct_count(ds, cols) -> int:
    """Exact distinct count computed DISTRIBUTED via the block-distinct pattern
    (distinct keys are singleton-heavy — the native aggregator's worst shape)."""
    from raysketch.pipeline.relational import distinct_rows

    key = list(cols) if isinstance(cols, (list, tuple)) else [cols]
    return distinct_rows(ds, key).count()


def _rank_bounds(ds, column: str, values) -> tuple[np.ndarray, np.ndarray]:
    """Distributed empirical rank interval of each value v over ``ds[column]``:
    returns ``(P(x < v), P(x <= v))`` — one vectorized partial-count pass per
    block + a tiny global sum; the column never funnels to the driver."""
    vals = np.asarray(values, dtype=np.float64)
    nv = len(vals)

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(column).to_numpy(zero_copy_only=False).astype(np.float64)
        lt = (x[:, None] < vals[None, :]).sum(axis=0)
        le = (x[:, None] <= vals[None, :]).sum(axis=0)
        cols = {"n": [len(x)]}
        for i in range(nv):
            cols[f"lt{i}"] = [int(lt[i])]
            cols[f"le{i}"] = [int(le[i])]
        return pa.table(cols)

    agg = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).sum(
        ["n"] + [f"lt{i}" for i in range(nv)] + [f"le{i}" for i in range(nv)]
    )
    n = max(int(agg["sum(n)"]), 1)
    lo = np.array([agg[f"sum(lt{i})"] for i in range(nv)], dtype=np.float64) / n
    hi = np.array([agg[f"sum(le{i})"] for i in range(nv)], dtype=np.float64) / n
    return lo, hi


def _count_members(ds, column: str, keys_ds, key_column: str, broadcast_limit: int = 5_000_000):
    """Distributed ``(#rows of ds whose column ∈ keys_ds, #rows of ds)`` with the
    broadcast↔join auto-switch: under ``broadcast_limit`` distinct keys the
    sorted array broadcasts once via ``ray.put`` and each block counts hits with
    one vectorized searchsorted (NO join exchange); beyond it the count comes
    from a native ``left_semi`` hash join. Used by the invariant-row labelers so
    their verification side never costs more than the operator being verified."""
    import ray

    n_keys = keys_ds.count()
    if n_keys > broadcast_limit:
        from raysketch.pipeline.probe import exact_semi_join_ds

        hits = exact_semi_join_ds(ds, keys_ds, column, key_column=key_column).count()
        return hits, ds.count()
    keys = np.sort(keys_ds.to_pandas()[key_column].to_numpy())
    ref = ray.put(keys)

    def part(batch: pa.Table) -> pa.Table:
        k = ray.get(ref)
        x = np.asarray(batch.column(column))
        if len(k) == 0:
            h = 0
        else:
            idx = np.clip(np.searchsorted(k, x), 0, len(k) - 1)
            h = int((k[idx] == x).sum())
        return pa.table({"hits": [h], "n": [batch.num_rows]})

    agg = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).sum(["hits", "n"])
    return int(agg["sum(hits)"]), int(agg["sum(n)"])


def _rank_within(qs, lo: np.ndarray, hi: np.ndarray, eps: float) -> np.ndarray:
    """True where target rank q falls inside [P(x<est) - eps, P(x<=est) + eps]
    (the interval form handles ties/discrete data exactly)."""
    q = np.asarray(qs, dtype=np.float64)
    return (q >= lo - eps) & (q <= hi + eps)


# ---------------------------------------------------------------------------
# exact queries (SQL-oracle-checked)
# ---------------------------------------------------------------------------


def q_dedup_exact(sf_dir: str):
    """Exact dedup of documents by text content (hash-partitioned, min-id survivor)."""
    from raysketch.pipeline.dedup import exact_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = exact_dedup(ds, text_col="text", id_col="doc_id")
    return out.select_columns(["doc_id", "text"]).to_pandas().sort_values("doc_id").reset_index(drop=True)


def q_token_stats(sf_dir: str):
    """Per-document token counts, whitespace AND BPE-pretokenizer in one pass
    (r5 consolidation: both kernels checked by one driver row). The BPE count
    uses an RE2-safe GPT-2-style pattern; Arrow count_substring_regex and
    DuckDB regexp_extract_all both run RE2, so the oracle is the same pattern
    verbatim."""
    from raysketch.pipeline.text import token_count_batch, token_count_bpe_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def both(b: pa.Table) -> pa.Table:
        ws = token_count_batch(b, "text")
        bpe = token_count_bpe_batch(b)
        return pa.table(
            {
                "doc_id": ws.column("doc_id"),
                "n_tokens": ws.column("n_tokens"),
                "n_bpe_tokens": bpe.column("n_bpe_tokens"),
            }
        )

    out = ds.map_batches(both, batch_format="pyarrow", zero_copy_batch=True)
    return out.to_pandas()


def q_repetition_stats(sf_dir: str):
    """Gopher-style repetition signals on a closed-form fixture: doc ``i`` (with
    ``d = i % 4``) is built as line A repeated d+1 times followed by 9 unique
    lines, every line exactly 10 chars, one token per line — so
    dup_line_frac = d/(10+d), dup_line_char_frac = (d+1)·10/((10+d)·10) for
    d ≥ 1 else 0, and top-2-gram frac = max(d,1)/(9+d): each a single float64
    division of exact integers that DuckDB reproduces bit-identically. The
    natural-text behavior is oracle-tested against a Counter reference in
    tests/test_text_events.py."""
    from raysketch.pipeline.text import repetition_batch

    ds = _read(sf_dir, "documents", ["doc_id"])

    def synth(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"))
        texts = []
        for i in ids:
            d = int(i) % 4
            lines = [f"a{i:09d}"] * (d + 1) + [f"b{i:07d}x{j}" for j in range(1, 10)]
            texts.append("\n".join(lines))
        return pa.table({"doc_id": pa.array(ids), "text": pa.array(texts, pa.string())})

    fixture = ds.map_batches(synth, batch_format="pyarrow", zero_copy_batch=True)
    out = fixture.map_batches(
        lambda b: repetition_batch(b).drop_columns(["text"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return out.to_pandas()


def q_quality_stats(sf_dir: str):
    """Per-lang integer quality sums (chars, tokens, docs) via in-batch partials."""
    ds = _read(sf_dir, "documents", ["lang", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        langs = np.asarray(batch.column("lang"))
        chars = pc.utf8_length(batch.column("text")).to_numpy(zero_copy_only=False).astype(np.int64)
        toks = (
            pc.count_substring_regex(batch.column("text"), r"\S+")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        df = pd.DataFrame({"lang": langs, "chars": chars, "toks": toks})
        g = df.groupby("lang", sort=False).agg(n=("chars", "size"), c=("chars", "sum"), t=("toks", "sum")).reset_index()
        return pa.table(
            {
                "lang": pa.array(g["lang"], pa.string()),
                "n": pa.array(g["n"], pa.int64()),
                "c": pa.array(g["c"], pa.int64()),
                "t": pa.array(g["t"], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .aggregate(
            Sum("n", alias_name="n_docs"),
            Sum("c", alias_name="sum_chars"),
            Sum("t", alias_name="sum_tokens"),
        )
        .to_pandas()
    )


def q_window_events(sf_dir: str):
    """Tumbling 1-day windows per event_type (count / min / max — exact values)."""
    from raysketch.pipeline.events import tumbling_window_agg

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    out = tumbling_window_agg(ds, window_s=86400).to_pandas()
    return out[["event_type", "window_start", "n_events", "min_value", "max_value"]]


def q_asof_join(sf_dir: str):
    """As-of join: for each click, the user's latest purchase at-or-before it
    (DuckDB ASOF LEFT JOIN oracle). Distributed as union → keyed HASH_SHUFFLE →
    per-block lexsort + cumulative-max forward fill (events.py::asof_join)."""
    from raysketch.pipeline.events import asof_join

    clicks = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"]).filter(
        expr="event_type == 'click'"
    )
    purchases = _read(sf_dir, "events", ["user_id", "ts", "value", "event_type"]).filter(
        expr="event_type == 'purchase'"
    )
    out = asof_join(clicks, purchases)
    df = out.to_pandas()
    # library emits a nullable int64 (precision-true); the SQL oracle compares
    # through ::DOUBLE so unmatched NULLs align as NaN either way
    df["matched_ts_us"] = df["matched_ts_us"].astype("float64")
    return df


def q_range_join(sf_dir: str):
    """Range (interval) join: every (click, purchase) pair of the same user with
    the purchase inside the hour before the click — exact SQL inequality-join
    oracle; one shuffle, vectorized in-block range matching."""
    from raysketch.pipeline.events import range_join

    clicks = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"]).filter(
        expr="event_type == 'click'"
    )
    purchases = _read(sf_dir, "events", ["user_id", "ts", "value", "event_type"]).filter(
        expr="event_type == 'purchase'"
    )
    return range_join(clicks, purchases, window_us=3_600_000_000).to_pandas()


def q_sessionize(sf_dir: str):
    """Gap-based sessions per user (30-min gap)."""
    from raysketch.pipeline.events import sessionize

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    return sessionize(ds, gap_s=1800).to_pandas()


def _exact_join_keyset(sf_dir: str, ds, column: str, negate: bool, broadcast_limit: int = 5_000_000):
    """Semi/anti join ``ds`` against the >200k-totalprice order keys with the
    broadcast↔join auto-switch (mirrors ``exact_dedup(strategy="auto")``): under
    ``broadcast_limit`` keys the sorted array broadcasts once via ``ray.put``;
    beyond it the key side stays distributed and Ray's native ``left_semi`` /
    ``left_anti`` hash join does the work."""
    from raysketch.pipeline.probe import exact_semi_join, exact_semi_join_ds

    keys_ds = (
        _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
        .filter(expr="o_totalprice > 200000.0")
        .select_columns(["o_orderkey"])
        .materialize()
    )
    if keys_ds.count() <= broadcast_limit:
        keys = keys_ds.to_pandas()["o_orderkey"].to_numpy()
        return exact_semi_join(ds, keys, column, negate=negate)
    return exact_semi_join_ds(ds, keys_ds, column, key_column="o_orderkey", negate=negate)


def q_semi_anti_join(sf_dir: str):
    """Exact semi-join AND anti-join of lineitem against the high-value order
    key set in one driver row (r5 consolidation; both negation paths of the
    set probe — broadcast under 5M keys, native left_semi/left_anti hash join
    beyond). The two sides partition lineitem exactly."""
    import pandas as pd

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity"])
    semi = _exact_join_keyset(sf_dir, li, "l_orderkey", negate=False).to_pandas()
    anti = _exact_join_keyset(sf_dir, li, "l_orderkey", negate=True).to_pandas()
    semi.insert(0, "side", "semi")
    anti.insert(0, "side", "anti")
    return pd.concat([semi, anti], ignore_index=True)


def q_lineitem_agg(sf_dir: str):
    """Distributive aggregate with in-batch partials (sum_qty is integer-valued)."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {
                "f": np.asarray(batch.column("l_returnflag")),
                "s": np.asarray(batch.column("l_linestatus")),
                "q": batch.column("l_quantity").to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby(["f", "s"], sort=False).agg(n=("q", "size"), q=("q", "sum")).reset_index()
        return pa.table(
            {
                "l_returnflag": pa.array(g["f"], pa.string()),
                "l_linestatus": pa.array(g["s"], pa.string()),
                "n": pa.array(g["n"], pa.int64()),
                "q": pa.array(g["q"], pa.float64()),
            }
        )

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("n", alias_name="count_order"), Sum("q", alias_name="sum_qty"))
        .to_pandas()
    )


def q_ann_topk(sf_dir: str):
    """Brute-force cosine top-10 for the vec_id=0 embedding (float64 for parity
    with the SQL double path)."""
    from raysketch.pipeline.ann import ann_cosine_topk

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    q0 = ds.filter(expr="vec_id == 0").take(1)[0]["embedding"]
    out = ann_cosine_topk(ds, np.asarray([q0], dtype=np.float64), k=10)
    return out.select(["vec_id"]).to_pandas()


def q_ann_topk_ds(sf_dir: str):
    """Query-DATASET brute-force cosine top-10 (r4): the first three embeddings
    are the query set, streamed in chunk_q=2 chunks so the chunked re-stream
    path and the per-chunk query-id remap actually execute; merge machinery is
    the same auto driver/tree path as ann_topk."""
    from raysketch.pipeline.ann import ann_topk_ds

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qds = ds.filter(expr="vec_id < 3").map_batches(
        lambda b: pa.table({"query_id": b.column("vec_id"), "embedding": b.column("embedding")}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    out = ann_topk_ds(ds, qds, k=10, chunk_q=2)
    return out.select(["query_id", "vec_id"]).to_pandas()


# ---------------------------------------------------------------------------
# sketch / approximate queries (rows-only driver check; bounds tested in tests/)
# ---------------------------------------------------------------------------


def q_heavy_hitters(sf_dir: str):
    """Frequent-items sketches in one driver row (r5 consolidation): Misra–Gries
    top-20 tokens over all document text (mergeable summary, Agarwal et al.
    PODS'12 merge) UNION count-min point estimates over event types. Both run
    with capacity ≫ key cardinality (MG k=4096 ≫ vocabulary; CMS width 8192 ≫
    5 event types) so no counter is pruned / no cell collides and the estimates
    are EXACT — SQL-oracle-checkable; the approximation bounds are
    property-tested in tests/test_sketches.py on streams that DO overflow."""
    import pandas as pd

    from raysketch.pipeline.build import build_sketch
    from raysketch.sketches.cms import CountMinSketch
    from raysketch.sketches.mg import MisraGries

    def upd(sk, col):
        toks = pc.list_flatten(pc.utf8_split_whitespace(col))
        toks = toks.filter(pc.greater(pc.utf8_length(toks), 0))
        sk.update_column(toks)

    ds = _read(sf_dir, "documents", ["text"])
    mg = build_sketch(ds, "text", lambda: MisraGries(4096), update=upd)
    top = mg.topk(20)
    ev = _read(sf_dir, "events", ["event_type"])
    cms = build_sketch(ev, "event_type", lambda: CountMinSketch(width=8192, depth=5))
    keys = sorted(ev.unique("event_type"))
    est = cms.query_column(pa.array(keys, pa.string()))
    return pd.concat(
        [
            pd.DataFrame(
                {
                    "sketch": "misra_gries",
                    "key": [t for t, _ in top],
                    "est": [int(c) for _, c in top],
                }
            ),
            pd.DataFrame({"sketch": "cms", "key": keys, "est": est.astype("int64")}),
        ],
        ignore_index=True,
    )


def q_reservoir_by_lang(sf_dir: str):
    """Stratified (per-lang) uniform reservoir sampling — the keyed-sketch build
    over reservoir summaries (fixed-size partials: the shuffle moves ≤k sampled
    ids per (block, lang), never rows — the stratified-sampling shape for 10^12
    docs). Oracle-checked invariant row per lang: sample size = min(k, n_lang),
    items seen = n_lang exactly, and every sampled id verified to belong to its
    lang by ONE vectorized distributed pass over documents."""
    import pandas as pd
    import ray

    from raysketch.pipeline.build import build_keyed_sketch, sketch_table_to_dict
    from raysketch.sketches.reservoir import ReservoirSample

    k = 20
    ds = _read(sf_dir, "documents", ["lang", "doc_id"])
    tbl = build_keyed_sketch(ds, "lang", "doc_id", lambda: ReservoirSample(k, seed=42))
    sk = sketch_table_to_dict(tbl, "lang")
    langs = sorted(sk)
    s_ids = np.array(
        [int(i) for lang in langs for i in sk[lang].sample()], dtype=np.int64
    )
    s_lang_idx = np.array(
        [li for li, lang in enumerate(langs) for _ in sk[lang].sample()], dtype=np.int64
    )
    order = np.argsort(s_ids)
    s_ids, s_lang_idx = s_ids[order], s_lang_idx[order]
    ref = ray.put((s_ids, s_lang_idx, np.array(langs)))

    def check(batch: pa.Table) -> pa.Table:
        sid, slang, larr = ray.get(ref)
        ids = np.asarray(batch.column("doc_id"))
        lv = np.asarray(batch.column("lang"))
        cols = {}
        if len(sid) == 0:
            hit = np.zeros(0, dtype=np.int64)
        else:
            idx = np.clip(np.searchsorted(sid, ids), 0, len(sid) - 1)
            m = sid[idx] == ids
            ok = m & (larr[slang[idx]] == lv)
            hit = np.bincount(slang[idx][ok], minlength=len(larr))
        for li in range(len(larr)):
            cols[f"m{li}"] = [int(hit[li]) if len(sid) else 0]
        return pa.table(cols)

    agg = ds.map_batches(check, batch_format="pyarrow", zero_copy_batch=True).sum(
        [f"m{i}" for i in range(len(langs))]
    )
    return pd.DataFrame(
        [
            {
                "lang": lang,
                "sample_size": len(sk[lang].sample()),
                "n_seen": int(sk[lang].n_seen),
                "all_members_valid": bool(
                    int(agg[f"sum(m{li})"]) == len(sk[lang].sample())
                ),
            }
            for li, lang in enumerate(langs)
        ]
    )


def q_extract_invariant(sf_dir: str):
    """Two per-row content invariants in one driver row (r5 consolidation):
    (a) the BASELINE.json input_hint invariant end-to-end — generate the seeded
    web corpus, run the distributed extractor, count byte mismatches against
    the stored text column (must be 0); (b) fingerprint injectivity over the
    real corpus — the vectorized xxh64 fingerprint is a pure function of text,
    so #distinct fingerprints must equal #distinct texts (both computed
    distributed; the guarantee dedup_exact★ rests on). Per-row fingerprints
    are golden-vector- and hypothesis-tested in tests/test_hashing.py."""
    import pandas as pd
    import ray.data as rd

    from raysketch.io.corpus import gen_webpages
    from raysketch.pipeline.text import extract_text_array, fingerprint_batch

    d = gen_webpages("/tmp/raysketch_webcorpus_10k", rows=10000, num_files=4)
    ds = rd.read_parquet(d, columns=["html", "text"])

    def check(batch: pa.Table) -> pa.Table:
        extracted = extract_text_array(batch.column("html"))
        bad = pa.compute.sum(
            pa.compute.not_equal(extracted, batch.column("text").combine_chunks())
        ).as_py()
        return pa.table({"rows": [batch.num_rows], "mismatches": [int(bad or 0)]})

    agg = ds.map_batches(check, batch_format="pyarrow", zero_copy_batch=True).sum(
        ["rows", "mismatches"]
    )

    def fp_i64(b: pa.Table) -> pa.Table:
        t = fingerprint_batch(b, "text")
        # reinterpret the uint64 fingerprint as int64 (bijective) — Ray's hash
        # aggregator round-trips int64 natively, uint64 falls back to pickling
        h = np.asarray(t.column("fingerprint").combine_chunks()).view(np.int64)
        return pa.table({"fingerprint": pa.array(h)})

    from raysketch.pipeline.relational import distinct_rows

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    fps = docs.map_batches(fp_i64, batch_format="pyarrow", zero_copy_batch=True)
    n_docs = docs.count()
    n_fp = distinct_rows(fps, ["fingerprint"]).count()
    n_text = _distinct_count(docs.select_columns(["text"]), "text")
    return pd.DataFrame(
        [
            {
                "rows": int(agg["sum(rows)"]),
                "mismatches": int(agg["sum(mismatches)"]),
                "n_docs": int(n_docs),
                "n_distinct_fp": int(n_fp),
                "n_distinct_text": int(n_text),
            }
        ]
    )


def q_top_per_group(sf_dir: str):
    """Top-3 orders per customer by totalprice (windowed row_number idiom) —
    keyed HASH_SHUFFLE + vectorized segment-rank, no per-group Python."""
    from raysketch.pipeline.relational import top_k_per_group

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
    out = top_k_per_group(
        ds, "o_custkey", "o_totalprice", k=3, descending=True, tiebreak_col="o_orderkey"
    )
    return out.to_pandas()


def q_quantiles_by_lang(sf_dir: str):
    """Keyed t-digest: per-lang quantiles of document length (two-level build),
    reported as per-(lang, q) rank-bound booleans: one distributed count pass
    computes every estimate's empirical rank WITHIN ITS LANG (vectorized
    per-batch partials), checked against the target rank with eps=0.02
    (measured max rank error 0.0069 at sf0.01)."""
    import pandas as pd

    from raysketch.pipeline.build import build_keyed_sketch, sketch_table_to_dict
    from raysketch.sketches.tdigest import TDigest

    ds = _read(sf_dir, "documents", ["lang", "n_chars"])
    tbl = build_keyed_sketch(ds, "lang", "n_chars", lambda: TDigest(200))
    sk = sketch_table_to_dict(tbl, "lang")
    langs = sorted(sk)
    qs = (0.25, 0.5, 0.75)
    E = np.stack([np.asarray(sk[lang].quantiles(list(qs)), dtype=np.float64) for lang in langs])

    def partial(batch: pa.Table) -> pa.Table:
        lv = np.asarray(batch.column("lang"))
        x = batch.column("n_chars").to_numpy(zero_copy_only=False).astype(np.float64)
        cols = {}
        for li_, lang in enumerate(langs):
            xl = x[lv == lang]
            cols[f"n{li_}"] = [len(xl)]
            for qi in range(len(qs)):
                cols[f"lt{li_}_{qi}"] = [int((xl < E[li_, qi]).sum())]
                cols[f"le{li_}_{qi}"] = [int((xl <= E[li_, qi]).sum())]
        return pa.table(cols)

    names = [f"n{i}" for i in range(len(langs))] + [
        f"{p}{i}_{j}" for p in ("lt", "le") for i in range(len(langs)) for j in range(len(qs))
    ]
    agg = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).sum(names)
    rows = []
    for li_, lang in enumerate(langs):
        n = max(int(agg[f"sum(n{li_})"]), 1)
        for qi, q in enumerate(qs):
            lo = agg[f"sum(lt{li_}_{qi})"] / n
            hi = agg[f"sum(le{li_}_{qi})"] / n
            rows.append(
                {"lang": lang, "q": q, "within_bound": bool(lo - 0.02 <= q <= hi + 0.02)}
            )
    return pd.DataFrame(rows)


def q_dedup_incremental(sf_dir: str):
    """Epoch-style incremental dedup (the reference's insert→flush→query cycle):
    build a Bloom over epoch-1 docs, anti-join epoch-2 candidates against it —
    every kept row is DEFINITELY new (no false negatives), rate of dropped
    genuinely-new rows ≤ p."""
    import pandas as pd

    from raysketch.pipeline.partitioned import build_partitioned_bloom
    from raysketch.pipeline.probe import bloom_anti_join

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    n = docs.count()
    epoch1 = docs.filter(expr=f"doc_id < {n // 2}").materialize()
    epoch2 = docs.filter(expr=f"doc_id >= {n // 2}").materialize()
    n1, n2 = epoch1.count(), epoch2.count()
    pb, _ = build_partitioned_bloom(epoch1, "text", capacity=max(n1, 1), num_shards=16)
    new_rows = bloom_anti_join(epoch2, pb, "text")
    # every document text is unique (dedup_exact★ proves it), so ALL epoch-2 rows
    # are genuinely new: rows dropped by the anti-join are exactly the Bloom
    # false positives — rate ≤ 2p (p = 0.01 build target; +3-count slack for
    # tiny epochs at sf0.001)
    dropped = n2 - new_rows.count()
    return pd.DataFrame(
        [
            {
                "epoch1_rows": n1,
                "epoch2_rows": n2,
                "drop_rate_under_2p": bool(dropped <= max(2 * 0.01 * n2, 3.0)),
            }
        ]
    )


def _bloom_membership_setup(
    sf_dir: str, broadcast_limit: int = 5_000_000, refs: bool = False, build: bool = True
):
    """Shared build + labeled-probe-set prep for the membership queries: build the
    partitioned Bloom over lineitem orderkeys, then label the orders keys with
    the exact oracle. The distinct key set is computed DISTRIBUTED (native
    groupby count — the full key column never visits the driver, VERDICT r2
    item 3); under ``broadcast_limit`` distinct keys the sorted array broadcasts
    once via ``ray.put`` for a vectorized searchsorted label stage, beyond it
    the labels come from a left-outer hash join against the distinct keys."""
    import ray
    from ray.data.aggregate import Count

    from raysketch.pipeline.partitioned import build_partitioned_bloom

    li = _read(sf_dir, "lineitem", ["l_orderkey"])
    n = li.count()
    if not build:
        pb = None  # caller builds its own filter (e.g. the checkpoint-dir row)
    elif refs:
        # shard blobs stay in object-store blocks; the driver gets a
        # ShardedBloom handle (refs + routing), never the assembled filter
        from raysketch.pipeline.partitioned import build_partitioned_bloom_refs

        pb, lineage = build_partitioned_bloom_refs(
            li, "l_orderkey", capacity=max(n, 1), num_shards=32
        )
    else:
        pb, lineage = build_partitioned_bloom(li, "l_orderkey", capacity=max(n, 1), num_shards=32)
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])

    from raysketch.pipeline.relational import distinct_rows

    distinct = (
        distinct_rows(li, ["l_orderkey"])
        .map_batches(
            lambda t: t.append_column("__n", pa.array(np.ones(t.num_rows, dtype=np.int64))),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )
    if distinct.count() <= broadcast_limit:
        li_keys = np.sort(distinct.to_pandas()["l_orderkey"].to_numpy().astype(np.int64))
        keys_ref = ray.put(li_keys)

        def label2(batch: pa.Table) -> pa.Table:
            lk = ray.get(keys_ref)
            keys = np.asarray(batch.column("o_orderkey"))
            if len(lk) == 0:
                isin = np.zeros(len(keys), dtype=bool)
            else:
                idx = np.clip(np.searchsorted(lk, keys), 0, len(lk) - 1)
                isin = lk[idx] == keys
            return pa.table({"l_orderkey": pa.array(keys), "is_positive": pa.array(isin)})

        probe_ds = orders.map_batches(label2, batch_format="pyarrow")
    else:
        joined = orders.select_columns(["o_orderkey"]).join(
            distinct.rename_columns({"l_orderkey": "o_orderkey"}),
            "left_outer",
            max(8, min(32, int(ray.cluster_resources().get("CPU", 8)))),
            on=("o_orderkey",),
        )
        probe_ds = joined.map_batches(
            lambda b: pa.table(
                {
                    "l_orderkey": b.column("o_orderkey"),
                    "is_positive": pc.is_valid(b.column("__n")),
                }
            ),
            batch_format="pyarrow",
        )
    return pb, probe_ds


def _cm_frame(pb, cm):
    """Invariant-row form of the confusion matrix: test_count and tp are EXACT
    counts a SQL oracle states directly (fn = 0 makes tp = the true positive
    count — the Bloom no-false-negative guarantee), fp is reported as a
    bound boolean (fp_rate ≤ 2p, p = 0.01 build target, + a 3-count slack for
    tiny negative sets). The raw fp/fp_rate/total_bits metrics stay in bench.py
    extras and tests/."""
    import pandas as pd

    negatives = int(cm["fp"]) + int(cm["tn"])
    fp_ok = int(cm["fp"]) <= max(2 * 0.01 * negatives, 3.0)
    return pd.DataFrame(
        [
            {
                "test_count": int(cm["test_count"]),
                "tp": int(cm["tp"]),
                "fn": int(cm["fn"]),
                "fp_under_2p": bool(fp_ok),
            }
        ]
    )


def q_bloom_membership(sf_dir: str):
    """Flagship: partitioned-Bloom build over lineitem orderkeys + probe +
    confusion matrix vs exact labels (reference protocol,
    simple_benchmark.cpp), run through BOTH probe modes in one driver row (r5
    consolidation): the broadcast probe AND the shard-routed probe (probe rows
    shuffled to the worker owning their sub-filter — gloom.h:216-230
    contains-routing; the too-big-to-broadcast regime). The two modes must be
    bitwise-equal on every confusion cell."""
    from raysketch.pipeline.probe import confusion_matrix, confusion_matrix_shuffle

    pb, probe_ds = _bloom_membership_setup(sf_dir)
    cm_b = confusion_matrix(probe_ds, pb, "l_orderkey")
    cm_s = confusion_matrix_shuffle(probe_ds, pb, "l_orderkey")
    frame = _cm_frame(pb, cm_b)
    frame["modes_bitwise_equal"] = bool(
        all(int(cm_b[k]) == int(cm_s[k]) for k in ("test_count", "tp", "fp", "fn", "tn"))
    )
    return frame


def q_bloom_membership_refs(sf_dir: str):
    """Same membership metrics with NO driver-side filter assembly: the build
    returns a ShardedBloom handle (shard blobs pinned in object-store blocks,
    driver holds refs + a shard→block routing array — the 10^12-key regime,
    VERDICT r3 'What's wrong #1') and the probe routes rows to the blocks.
    Counts are bitwise-equal to q_bloom_membership."""
    from raysketch.pipeline.probe import confusion_matrix_shuffle

    sb, probe_ds = _bloom_membership_setup(sf_dir, refs=True)
    return _cm_frame(sb, confusion_matrix_shuffle(probe_ds, sb, "l_orderkey"))


def q_bloom_membership_ckpt(sf_dir: str):
    """Same membership metrics built INTO and probed FROM a per-shard
    checkpoint directory (r5 refs/ckpt unification — the north rule's
    'resumable from checkpoint' path inside the driver gate): the refs build
    writes atomic shard Parquet files task-side, then probe_partitioned_ckpt
    routes each probe block straight to its shard files — the driver touches
    only the manifest. Counts are bitwise-equal to q_bloom_membership (the
    exact cells are what the SQL oracle states)."""
    import shutil
    import tempfile

    from raysketch.pipeline.partitioned import build_partitioned_bloom_refs
    from raysketch.pipeline.probe import probe_partitioned_ckpt

    ckpt = tempfile.mkdtemp(prefix="raysketch_memb_ckpt_", dir="/tmp")
    try:
        li = _read(sf_dir, "lineitem", ["l_orderkey"])
        n = li.count()
        _, probe_ds = _bloom_membership_setup(sf_dir, build=False)
        build_partitioned_bloom_refs(
            li, "l_orderkey", capacity=max(n, 1), num_shards=32, ckpt_dir=ckpt
        )
        probed = probe_partitioned_ckpt(
            probe_ds, ckpt, "l_orderkey", out_column="__member", keep=("is_positive",)
        )

        def partial_counts(batch: pa.Table) -> pa.Table:
            pred = np.asarray(batch.column("__member").combine_chunks())
            label = np.asarray(batch.column("is_positive").combine_chunks())
            return pa.table(
                {
                    "tp": [int(np.sum(pred & label))],
                    "fp": [int(np.sum(pred & ~label))],
                    "fn": [int(np.sum(~pred & label))],
                    "tn": [int(np.sum(~pred & ~label))],
                }
            )

        agg = probed.map_batches(partial_counts, batch_format="pyarrow").sum(
            ["tp", "fp", "fn", "tn"]
        )
        cm = {c: int(agg[f"sum({c})"]) for c in ("tp", "fp", "fn", "tn")}
        cm["test_count"] = sum(cm.values())
        return _cm_frame(None, cm)
    finally:
        # the counts above are driver-side before this runs — a repeated gate
        # run must not accumulate filter-sized checkpoint dirs in /tmp
        shutil.rmtree(ckpt, ignore_errors=True)


def q_bloom_delete(sf_dir: str):
    """Counting-Bloom retirement (the deletable family member, Fan et al. 2000):
    insert every doc_id (distributed partial build + saturating-add tree merge),
    then retire the 'en' documents by building a SECOND counting filter over the
    retire set and subtracting it — the distributed-delete idiom; both builds
    stream, only blob-sized state reaches the driver. Invariant row the SQL
    oracle states: every surviving doc still probes present (no false
    negatives), retired and never-inserted ids probe at the fp rate ≤ 2p, and
    the net element count is exact."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from raysketch.pipeline.build import build_sketch
    from raysketch.pipeline.probe import probe_dataset
    from raysketch.sketches.counting_bloom import CountingBloom

    docs = _read(sf_dir, "documents", ["doc_id", "lang"])
    n = docs.count()

    def make():
        return CountingBloom(max(n, 64), 0.01)

    inserted = build_sketch(docs, "doc_id", make)
    retire = docs.filter(expr="lang == 'en'")
    cb = inserted.subtract(build_sketch(retire, "doc_id", make))

    def label(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"))
        en = pc.equal(batch.column("lang"), "en")
        return pa.table(
            {
                # surviving + retired ids, and a disjoint never-inserted id range
                "doc_id": pa.array(np.concatenate([ids, ids + 10_000_000])),
                "group": pa.array(
                    np.concatenate(
                        [np.where(np.asarray(en), 1, 0), np.full(len(ids), 2)]
                    ).astype(np.int64)
                ),  # 0=kept 1=retired 2=fresh
            }
        )

    probes = probe_dataset(
        docs.map_batches(label, batch_format="pyarrow", zero_copy_batch=True),
        cb,
        "doc_id",
    )
    agg = (
        probes.map_batches(
            lambda b: pa.table(
                {
                    "group": b.column("group"),
                    "hit": pc.cast(b.column("member"), pa.int64()),
                    "one": pa.array(np.ones(b.num_rows, dtype=np.int64)),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("group")
        .aggregate(Sum("hit", alias_name="hits"), Sum("one", alias_name="total"))
        .to_pandas()
        .set_index("group")
    )
    kept_h, kept_n = int(agg.loc[0, "hits"]), int(agg.loc[0, "total"])
    ret_h, ret_n = int(agg.loc[1, "hits"]), int(agg.loc[1, "total"])
    fr_h, fr_n = int(agg.loc[2, "hits"]), int(agg.loc[2, "total"])
    bound = lambda h, t: bool(h <= max(2 * 0.01 * t, 3.0))  # noqa: E731
    return pd.DataFrame(
        [
            {
                "kept_missing": int(kept_n - kept_h),
                "retired_fp_under_2p": bound(ret_h, ret_n),
                "fresh_fp_under_2p": bound(fr_h, fr_n),
                "net_count": int(cb.count),
            }
        ]
    )


def q_bloom_join_pushdown(sf_dir: str):
    """Bloom-accelerated inner join — the reference library's canonical use
    (semi-join prefiltering, SURVEY.md §2.4): build a partitioned Bloom over the
    keys of the SELECTIVE side (orders with totalprice > 300k, ~1% of orders),
    broadcast-prune lineitem with it BEFORE the join shuffle (no false negatives;
    ≤p false positives), then the exact hash join + per-priority revenue
    aggregate. The prefilter shrinks the join's probe side ~99% without changing
    the result — the output is EXACT and plain-SQL-checkable (revenue summed in
    integer cents so float association order can't perturb the hash compare)."""
    import ray
    from ray.data.aggregate import Count, Sum

    from raysketch.pipeline.partitioned import build_partitioned_bloom
    from raysketch.pipeline.probe import bloom_semi_join

    orders = (
        _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])
        .filter(expr="o_totalprice > 300000.0")
        .select_columns(["o_orderkey", "o_orderpriority"])
        .materialize()
    )
    n_build = orders.count()
    pb, _ = build_partitioned_bloom(orders, "o_orderkey", capacity=max(n_build, 64), num_shards=16)
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"])
    pruned = bloom_semi_join(li, pb, "l_orderkey")

    def cents(batch: pa.Table) -> pa.Table:
        x = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_orderkey": batch.column("l_orderkey"),
                "cents": pa.array(np.rint(x * 100).astype(np.int64)),
            }
        )

    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    joined = pruned.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True).join(
        orders.rename_columns({"o_orderkey": "l_orderkey"}),
        "inner",
        max(8, min(32, ncpu)),
        on=("l_orderkey",),
    )
    return (
        joined.groupby("o_orderpriority")
        .aggregate(Count(alias_name="n_items"), Sum("cents", alias_name="revenue_cents"))
        .to_pandas()
    )


def q_hll_window(sf_dir: str):
    """Approximate distinct users per tumbling 1-day window — the at-scale form
    of ``window_distinct`` (per-window HLL partials merge in fixed size, so the
    shuffle moves blobs, not user ids). Invariant row per window: estimate
    within 3σ of the exact distinct count (itself computed distributed)."""
    import pandas as pd
    from ray.data.aggregate import Count

    from raysketch.pipeline.build import build_keyed_sketch, sketch_table_to_dict
    from raysketch.pipeline.events import _epoch_seconds
    from raysketch.sketches.hll import HyperLogLog

    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def wkey(batch: pa.Table) -> pa.Table:
        epoch = _epoch_seconds(batch.column("ts"))
        window = (epoch // 86400) * 86400
        return pa.table(
            {
                "window_start": pa.array(window.astype(np.int64)),
                "user_id": batch.column("user_id"),
            }
        )

    keyed = ds.map_batches(wkey, batch_format="pyarrow", zero_copy_batch=True)
    tbl = build_keyed_sketch(keyed, "window_start", "user_id", lambda: HyperLogLog(14))
    sk = sketch_table_to_dict(tbl, "window_start")
    pairs = keyed.groupby(["window_start", "user_id"]).aggregate(Count(alias_name="__n"))
    exact = {
        r["window_start"]: r["n_users"]
        for r in pairs.groupby("window_start").aggregate(Count(alias_name="n_users")).take_all()
    }
    return pd.DataFrame(
        [
            {
                "window_start": int(k),
                "within_3sigma": bool(
                    abs(v.estimate() - exact[int(k)]) / max(exact[int(k)], 1) <= _HLL_3SIGMA
                ),
            }
            for k, v in sorted(sk.items(), key=lambda kv: int(kv[0]))
        ]
    )


def q_top_tokens_per_lang(sf_dir: str):
    """Exact top-5 tokens per lang: vectorized tokenize → in-batch (lang, token)
    partial counts (the explode never leaves the task) → native groupby-sum →
    ``top_k_per_group`` (keyed shuffle + vectorized segment-rank). The composed
    form of token_counts_global★ + top_per_group★ over a skewed key."""
    from ray.data.aggregate import Sum

    from raysketch.pipeline.relational import top_k_per_group

    ds = _read(sf_dir, "documents", ["lang", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        texts = batch.column("text").combine_chunks()
        toks = pc.utf8_split_whitespace(texts)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        ok = pc.greater(pc.utf8_length(flat), 0)
        langs = np.repeat(np.asarray(batch.column("lang")), lens)[
            ok.to_numpy(zero_copy_only=False)
        ]
        df = pd.DataFrame({"lang": langs, "token": np.asarray(flat.filter(ok))})
        g = df.groupby(["lang", "token"], sort=False).size().reset_index(name="n")
        return pa.table(
            {
                "lang": pa.array(g["lang"], pa.string()),
                "token": pa.array(g["token"], pa.string()),
                "n": pa.array(g["n"], pa.int64()),
            }
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["lang", "token"])
        .aggregate(Sum("n", alias_name="n"))
    )
    out = top_k_per_group(counts, "lang", "n", k=5, descending=True, tiebreak_col="token")
    return out.to_pandas()


def q_hll_by_lang(sf_dir: str):
    """Keyed (per-lang) HLL distinct texts — skew-safe two-level build; reported
    as the per-key 3σ bound row vs the exact per-lang distinct (distributed
    two-level groupby)."""
    import pandas as pd
    from ray.data.aggregate import Count

    from raysketch.pipeline.build import build_keyed_sketch, sketch_table_to_dict
    from raysketch.sketches.hll import HyperLogLog

    ds = _read(sf_dir, "documents", ["lang", "text"])
    tbl = build_keyed_sketch(ds, "lang", "text", lambda: HyperLogLog(14))
    sk = sketch_table_to_dict(tbl, "lang")
    from raysketch.pipeline.relational import distinct_rows

    pairs = distinct_rows(ds, ["lang", "text"])
    exact = {
        r["lang"]: r["n_distinct"]
        for r in pairs.groupby("lang").aggregate(Count(alias_name="n_distinct")).take_all()
    }
    return pd.DataFrame(
        [
            {
                "lang": k,
                "within_3sigma": bool(
                    abs(v.estimate() - exact[k]) / max(exact[k], 1) <= _HLL_3SIGMA
                ),
            }
            for k, v in sorted(sk.items())
        ]
    )


def _quantile_bound_frame(sf_dir: str, make_sketch, eps: float):
    """Shared invariant-row form for the quantile sketches: build distributed,
    then check each estimate's EMPIRICAL RANK (distributed count pass) against
    the target rank within ``eps`` — the sketch's published rank-error bound
    with ≥3× measured margin (BASELINE.md round-3 notes). Raw quantile values
    are asserted in tests/test_sketches.py."""
    import pandas as pd

    from raysketch.pipeline.build import build_sketch

    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])
    sk = build_sketch(ds, "l_extendedprice", make_sketch)
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    est = np.asarray(sk.quantiles(qs), dtype=np.float64)
    lo, hi = _rank_bounds(ds, "l_extendedprice", est)
    within = _rank_within(qs, lo, hi, eps)
    return pd.DataFrame({"q": qs, "within_bound": within.astype(bool)})


def q_quantile_sketches(sf_dir: str):
    """All three quantile-sketch families in one driver row (r5 consolidation):
    t-digest (Dunning; eps=0.01 — measured ≤0.003 at sf0.01), KLL (k=200,
    Karnin-Lang-Liberty FOCS'16; eps=0.025 — measured 0.0084), and DDSketch
    (relative-value-error ≤ α, VLDB 2019; eps=0.025 — measured 0.0075). Each
    builds distributed and checks its estimates' EMPIRICAL RANKS against the
    published rank-error bound with ≥3× measured margin; raw values are
    asserted in tests/test_sketches.py."""
    import pandas as pd

    from raysketch.sketches.ddsketch import DDSketch
    from raysketch.sketches.kll import KLL
    from raysketch.sketches.tdigest import TDigest

    frames = []
    for name, make, eps in [
        ("tdigest", lambda: TDigest(200), 0.01),
        ("kll", lambda: KLL(200), 0.025),
        ("ddsketch", lambda: DDSketch(alpha=0.01), 0.025),
    ]:
        f = _quantile_bound_frame(sf_dir, make, eps)
        f.insert(0, "sketch", name)
        frames.append(f)
    return pd.concat(frames, ignore_index=True)


def q_ann_ivf_ds(sf_dir: str):
    """IVF ANN with the queries as a DATASET (r5: list co-routing — vectors and
    query fan-out rows keyed-shuffled by IVF list, per-task work list-local),
    reported as the oracle-checkable quality row per query: (a) the co-routed
    path returns rows IDENTICAL to the broadcast single-query IVF path under
    the shared codebook, and (b) recall@10 vs exact brute force ≥ 0.5 on
    average (nprobe=4 of nlist=8 — a 50% scan fraction; measured 0.80 at
    sf0.01). Raw neighbor lists asserted in tests/test_dedup_ann.py."""
    import pandas as pd

    from raysketch.pipeline.ann import (
        ann_cosine_topk,
        ann_ivf_ds,
        ann_ivf_topk,
        train_centroids,
    )
    from raysketch.pipeline.dedup import embedding_matrix

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qtbl = pa.concat_tables(
        list(
            ds.filter(expr="vec_id < 3").iter_batches(batch_format="pyarrow")
        )
    ).sort_by("vec_id")
    Q = embedding_matrix(qtbl.column("embedding")).astype(np.float32)
    C = train_centroids(ds, "embedding", nlist=8)
    ivf = ann_ivf_topk(ds, Q, k=10, nlist=8, nprobe=4, centroids=C).to_pandas()
    qds = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).filter(
        expr="vec_id < 3"
    ).map_batches(
        lambda b: pa.table(
            {"query_id": b.column("vec_id"), "embedding": b.column("embedding")}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    routed = ann_ivf_ds(ds, qds, k=10, nlist=8, nprobe=4, centroids=C).to_pandas()
    bf = ann_cosine_topk(ds, Q.astype(np.float64), k=10).to_pandas()
    rows = []
    for qi in range(3):
        a = ivf[ivf["query_id"] == qi].sort_values("vec_id")["vec_id"].tolist()
        b = routed[routed["query_id"] == qi].sort_values("vec_id")["vec_id"].tolist()
        e = set(bf[bf["query_id"] == qi]["vec_id"])
        rows.append(
            {
                "query_id": qi,
                "paths_identical": bool(a == b),
                "recall_at_least_half": bool(len(e & set(b)) / max(len(e), 1) >= 0.5),
            }
        )
    return pd.DataFrame(rows)


def q_media_pipeline(sf_dir: str):
    """Multimodal plumbing in one driver row (r5 consolidation): deterministic
    fake decode → fixed-dim features (media_type/width per media) JOINED with
    the frame-sampling fan-out (one row per sampled frame). Decode is stubbed
    (no codecs in-container); the Ray-side schema, actor signature and fan-out
    are real."""
    import ray.data as rd

    from raysketch.pipeline.multimodal import gen_media_table, media_features, sample_frames

    ds = rd.from_arrow(gen_media_table(256))
    feats = (
        media_features(ds, feat_dim=8)
        .select_columns(["media_id", "media_type", "width"])
        .to_pandas()
    )
    frames = (
        sample_frames(rd.from_arrow(gen_media_table(256)), every_ms=1000)
        .select_columns(["media_id", "frame_idx"])
        .to_pandas()
    )
    return frames.merge(feats, on="media_id").sort_values(
        ["media_id", "frame_idx"], ignore_index=True
    )


def q_theta_set_ops(sf_dir: str):
    """Theta-sketch set algebra: distinct orderkeys in orders (A) vs those
    referenced by lineitem (B) — union / intersection / difference estimates
    (the approximate intersect/except of SURVEY.md §2.4)."""
    import pandas as pd

    from raysketch.pipeline.build import build_sketch
    from raysketch.sketches.theta import ThetaSketch

    from ray.data.aggregate import Count

    orders = _read(sf_dir, "orders", ["o_orderkey"])
    li = _read(sf_dir, "lineitem", ["l_orderkey"])
    a = build_sketch(orders, "o_orderkey", lambda: ThetaSketch(4096))
    b = build_sketch(li, "l_orderkey", lambda: ThetaSketch(4096))
    inter = a.intersect_estimate(b)
    diff = a.difference_estimate(b)
    union = ThetaSketch.from_bytes(a.to_bytes()).merge(b).estimate()
    # exact counterparts, computed distributed: distinct sets + membership count
    # (broadcast searchsorted under the 5M switch, left_semi join beyond)
    from raysketch.pipeline.relational import distinct_rows

    o_d = distinct_rows(orders, ["o_orderkey"]).materialize()
    l_d = distinct_rows(li, ["l_orderkey"]).materialize()
    nb = l_d.count()
    inter_exact, na = _count_members(o_d, "o_orderkey", l_d, "l_orderkey")
    union_exact = na + nb - inter_exact
    exact = {
        "union": union_exact,
        "intersection": inter_exact,
        "difference_a_minus_b": na - inter_exact,
    }
    # theta k=4096 → RSE ≈ 1/√(k-1) ≈ 1.56%; set-op errors compound relative to
    # the UNION size, so the bound is 3·RSE·|A∪B| (measured ≤ 1.0% at sf0.01)
    tol = 3.0 / np.sqrt(4095) * max(union_exact, 1)
    return pd.DataFrame(
        [
            {"op": op, "within_3sigma": bool(abs(est - exact[op]) <= tol)}
            for op, est in [
                ("union", union),
                ("intersection", inter),
                ("difference_a_minus_b", diff),
            ]
        ]
    )


def q_minhash_dedup(sf_dir: str):
    """MinHash-LSH near-dup clustering with a SQL-checkable planted fixture:
    every doc's 40 tokens are salted unique to its doc_id (cross-doc shingle
    Jaccard is exactly 0 — band collisions die in the exact verify), and every
    10th doc gets a planted near-dup copy at doc_id+10_000_000 with its last 2
    tokens replaced (shingle Jaccard = 36/40 = 0.9 ≥ threshold 0.8). The
    operator must recover EXACTLY the planted (original, copy) clusters, which
    plain SQL over ``documents`` states. The natural-corpus behavior (real
    near-dups, 47 clusters at sf0.01) stays covered by
    tests/test_dedup_ann.py and bench.py."""
    from raysketch.pipeline.dedup import minhash_lsh_dedup

    ds = _read(sf_dir, "documents", ["doc_id"])

    def synth(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"))
        texts = [" ".join(f"w{i}x{j}" for j in range(40)) for i in ids]
        take = ids % 10 == 0
        copies = [
            " ".join(f"w{i}x{j}" for j in range(38)) + f" z{i}a z{i}b" for i in ids[take]
        ]
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate([ids, ids[take] + 10_000_000]).astype(np.int64)),
                "text": pa.array(texts + copies, pa.string()),
            }
        )

    planted = ds.map_batches(synth, batch_format="pyarrow", zero_copy_batch=True)
    return minhash_lsh_dedup(planted, threshold=0.8).to_pandas()


def q_jaccard_dedup(sf_dir: str):
    """EXACT prefix-filtered all-pairs n-gram-Jaccard clustering, proven on a
    two-sided planted fixture: every doc is 40 doc-unique salted tokens (38
    3-gram shingles; cross-doc Jaccard exactly 0). Every 10th doc gets a
    near-dup copy at doc_id+10_000_000 with its last 2 tokens replaced —
    shingle Jaccard (38−2)/(38+2) = 0.9 ≥ 0.8, MUST be clustered. Docs with
    doc_id % 10 == 5 get a DISTRACTOR copy at doc_id+20_000_000 with the last
    10 tokens replaced — Jaccard (38−10)/(38+10) ≈ 0.583 < 0.8, MUST NOT be
    clustered (the prefix filter emits the pair as a candidate; the exact
    verify rejects it). Unlike the LSH queries this checks BOTH completeness
    and the sub-threshold exclusion, which plain SQL over ``documents``
    states."""
    from raysketch.pipeline.dedup import jaccard_ngram_dedup

    ds = _read(sf_dir, "documents", ["doc_id"])

    def synth(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"))
        texts = [" ".join(f"w{i}x{j}" for j in range(40)) for i in ids]
        near = ids % 10 == 0
        far = ids % 10 == 5
        near_copies = [
            " ".join(f"w{i}x{j}" for j in range(38)) + f" z{i}a z{i}b" for i in ids[near]
        ]
        far_copies = [
            " ".join(f"w{i}x{j}" for j in range(30))
            + " "
            + " ".join(f"y{i}q{j}" for j in range(10))
            for i in ids[far]
        ]
        return pa.table(
            {
                "doc_id": pa.array(
                    np.concatenate(
                        [ids, ids[near] + 10_000_000, ids[far] + 20_000_000]
                    ).astype(np.int64)
                ),
                "text": pa.array(texts + near_copies + far_copies, pa.string()),
            }
        )

    planted = ds.map_batches(synth, batch_format="pyarrow", zero_copy_batch=True)
    return jaccard_ngram_dedup(planted, threshold=0.8).to_pandas()


def q_simhash_dedup(sf_dir: str):
    """SimHash near-dup clustering with a SQL-checkable planted fixture: unique
    per-doc token vocabularies make unrelated fingerprints ~iid 64-bit values
    (Hamming ≤ 3 collisions ≪ 1e-8 across the corpus); every 10th doc gets an
    EXACT copy at doc_id+10_000_000 (Hamming 0 — guaranteed detection through
    the 4×16-bit pigeonhole bands). Expected clusters = exactly the planted
    pairs, stated by plain SQL over ``documents``."""
    from raysketch.pipeline.dedup import simhash_dedup

    ds = _read(sf_dir, "documents", ["doc_id"])

    def synth(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"))
        texts = [" ".join(f"s{i}x{j}" for j in range(30)) for i in ids]
        take = np.nonzero(ids % 10 == 0)[0]
        copies = [texts[k] for k in take]
        return pa.table(
            {
                "doc_id": pa.array(
                    np.concatenate([ids, ids[take] + 10_000_000]).astype(np.int64)
                ),
                "text": pa.array(texts + copies, pa.string()),
            }
        )

    planted = ds.map_batches(synth, batch_format="pyarrow", zero_copy_batch=True)
    return simhash_dedup(planted, max_hamming=3).to_pandas()


def q_embedding_dedup(sf_dir: str):
    """Embedding near-dup clustering over the embeddings table + deterministic
    planted near-dups (the driver's random vectors carry no true near-dups — max
    pairwise cosine ≈ 0.51 at sf0.01 — so every 10th vector gets a jittered copy
    at ``vec_id + 1_000_000``; jitter is a pure function of (vec_id, dim), no
    RNG state). The operator must recover exactly the planted pairs: one cluster
    per copy, cluster_id = the original vec_id."""
    from raysketch.pipeline.dedup import embedding_cosine_dedup, embedding_matrix

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def plant(batch: pa.Table) -> pa.Table:
        V = embedding_matrix(batch.column("embedding")).astype(np.float64)
        ids = np.asarray(batch.column("vec_id"))
        take = ids % 10 == 0
        Vc = V[take]
        d = V.shape[1]
        jitter = (
            ((ids[take][:, None] * 31 + np.arange(d)[None, :]) % 97 - 48).astype(np.float64)
            * 1e-5
        )
        Vc = Vc + jitter
        all_v = np.concatenate([V, Vc])
        all_ids = np.concatenate([ids, ids[take] + 1_000_000])
        return pa.table(
            {
                "vec_id": pa.array(all_ids.astype(np.int64)),
                "embedding": pa.array(list(all_v.astype(np.float32))),
            }
        )

    planted = ds.map_batches(plant, batch_format="pyarrow", zero_copy_batch=True)
    return embedding_cosine_dedup(planted, threshold=0.99).to_pandas()


def q_ann_lsh(sf_dir: str):
    """LSH-bucketed ANN (random-hyperplane tables, no shuffle) on a planted
    fixture with KNOWN nearest neighbors: every 10th vector gets a jittered
    copy at vec_id+1_000_000 (deterministic jitter, cosine ≈ 1−1e-8), and the
    queries are the first 8 planted originals. Each query's true top-2 is
    {itself, its copy}; the query's own code collides in every table by
    construction and the copy's angle is ~1e-4 rad (per-table collision
    ≥ 0.996, miss probability across 8 tables < 1e-19), so both MUST appear —
    an exact statement plain SQL makes. Natural-corpus recall behavior is
    covered by tests/test_dedup_ann.py."""
    import pandas as pd

    from raysketch.pipeline.ann import ann_lsh_topk
    from raysketch.pipeline.dedup import embedding_matrix

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def plant(batch: pa.Table) -> pa.Table:
        V = embedding_matrix(batch.column("embedding")).astype(np.float64)
        ids = np.asarray(batch.column("vec_id"))
        take = ids % 10 == 0
        d = V.shape[1]
        jitter = (
            ((ids[take][:, None] * 31 + np.arange(d)[None, :]) % 97 - 48).astype(np.float64)
            * 1e-5
        )
        all_v = np.concatenate([V, V[take] + jitter])
        all_ids = np.concatenate([ids, ids[take] + 1_000_000])
        return pa.table(
            {
                "vec_id": pa.array(all_ids.astype(np.int64)),
                "embedding": pa.array(list(all_v.astype(np.float32))),
            }
        )

    planted = ds.map_batches(plant, batch_format="pyarrow", zero_copy_batch=True).materialize()
    q_ids = [0, 10, 20, 30, 40, 50, 60, 70]
    want = np.array(q_ids, dtype=np.int64)
    q_rows = {
        r["vec_id"]: r["embedding"]
        for r in planted.map_batches(
            lambda b: b.filter(pa.array(np.isin(np.asarray(b.column("vec_id")), want))),
            batch_format="pyarrow",
        ).take_all()
    }
    Q = np.stack([np.asarray(q_rows[i], dtype=np.float64) for i in q_ids])
    res = ann_lsh_topk(planted, Q, k=2, n_tables=8, n_bits=12).to_pandas()
    out = []
    for qi, vid in enumerate(q_ids):
        mine = set(res[res["query_id"] == qi]["vec_id"])
        out.append(
            {
                "query_id": qi,
                "self_found": bool(vid in mine),
                "copy_found": bool(vid + 1_000_000 in mine),
            }
        )
    return pd.DataFrame(out)


def q_lang_id(sf_dir: str):
    """Heuristic lang-id stage (actor pool: hashed marker table built once per
    actor) on a marker-bearing fixture derived from ``documents``: each doc's
    text is its true lang's function words + doc-unique noise, so the stage
    must predict ``lang_pred == lang`` for every row — stated by plain SQL.
    (The testdata documents' synthetic text carries no real function words, so
    accuracy there is meaningless — the fixture makes the heuristic well-posed
    while exercising the full distributed path.)"""
    from raysketch.pipeline.text import _LANG_MARKERS, LangIdStage

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    markers = {k: " ".join(v) for k, v in _LANG_MARKERS.items()}

    def synth(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"))
        langs = np.asarray(batch.column("lang"))
        texts = [f"{markers[l]} noise{i} filler{i}x" for i, l in zip(ids, langs)]
        return pa.table(
            {"doc_id": pa.array(ids), "text": pa.array(texts, pa.string())}
        )

    fixture = ds.map_batches(synth, batch_format="pyarrow", zero_copy_batch=True)
    out = fixture.map_batches(
        LangIdStage, batch_format="pyarrow", concurrency=(1, 4), zero_copy_batch=True
    )
    return out.select_columns(["doc_id", "lang_pred"]).to_pandas()


def q_webpipeline(sf_dir: str):
    """The north-star web pipeline on the F1 corpus: read → extract_text (vectorized,
    html dropped immediately) → per-lang HLL of urls + Bloom build; returns
    per-lang rows. Corpus is generated deterministically under /tmp (seeded)."""
    import pandas as pd
    import ray.data as rd

    from raysketch.io.corpus import gen_webpages
    from raysketch.pipeline.build import build_keyed_sketch, sketch_table_to_dict
    from raysketch.pipeline.text import extract_text_batch
    from raysketch.sketches.hll import HyperLogLog

    from ray.data.aggregate import Count

    d = gen_webpages("/tmp/raysketch_webcorpus_10k", rows=10000, num_files=4)
    ds = rd.read_parquet(d, columns=["url", "html", "lang"])
    ds = ds.map_batches(extract_text_batch, batch_format="pyarrow", zero_copy_batch=True)
    tbl = build_keyed_sketch(ds, "lang", "url", lambda: HyperLogLog(14))
    sk = sketch_table_to_dict(tbl, "lang")
    # exact per-lang distinct urls (distributed two-level groupby) → 3σ bound row
    from raysketch.pipeline.relational import distinct_rows

    pairs = distinct_rows(ds, ["lang", "url"])
    exact = {
        r["lang"]: r["n_urls"]
        for r in pairs.groupby("lang").aggregate(Count(alias_name="n_urls")).take_all()
    }
    return pd.DataFrame(
        [
            {
                "lang": k,
                "within_3sigma": bool(
                    abs(v.estimate() - exact[k]) / max(exact[k], 1) <= _HLL_3SIGMA
                ),
            }
            for k, v in sorted(sk.items())
        ]
    )


def _mod_filter(ds, col: str, mod: int, keep_zero: bool):
    """Stream-filter rows by ``col % mod == 0`` (or its complement) — a
    vectorized mask map, no shuffle."""

    def f(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column(col))
        mask = (ids % mod == 0) == keep_zero
        return t.filter(pa.array(mask))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination: docs with doc_id % 13 == 0 act as the
    held-out eval set; every other doc sharing >= 1 distinct word 4-gram
    with it is flagged with its distinct-overlap count. The broadcast-probe
    pipeline is hash-only; the oracle states the same overlap in string
    space (collision probability ~ (#distinct 4-grams)^2 / 2^64 —
    negligible at any tested sf)."""
    from raysketch.pipeline.decontam import decontaminate

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    bench = _mod_filter(docs, "doc_id", 13, True)
    corpus = _mod_filter(docs, "doc_id", 13, False)
    return (
        decontaminate(corpus, bench, n=4, min_overlap=1)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )


def q_hot_ngrams(sf_dir: str):
    """Corpus boilerplate detection: word 3-grams occurring in >= 5 distinct
    documents, with their strings recovered via the second-scan hot-set
    probe (strings never enter the wide exchange)."""
    from raysketch.pipeline.decontam import hot_ngrams

    docs = _read(sf_dir, "documents", ["text"])
    return hot_ngrams(docs, n=3, min_docs=5)


def q_rare_tokens(sf_dir: str):
    """Corpus-frequency rare-token quality signal on a planted fixture: each doc
    gets one 'm' token (df ≈ n_docs/40), one 'r' token (df ≈ n_docs/80) and
    doc_id%4 copies of a doc-unique 'u' token (df=1). With min_df=10 the
    rare/common split depends on sf, and the oracle derives it from first
    principles (full df computation + join), so the whole two-pass pipeline is
    value-checked."""
    from raysketch.pipeline.text import rare_token_stats

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def aug(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"))
        texts = [
            f"{t} m{i % 40} r{i % 80}" + f" u{i}" * (i % 4)
            for i, t in zip(ids, batch.column("text").to_pylist())
        ]
        return pa.table({"doc_id": ids, "text": texts})

    aug_ds = docs.map_batches(aug, batch_format="pyarrow", zero_copy_batch=True)
    return (
        rare_token_stats(aug_ds, min_df=10)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )


def q_pii_redact(sf_dir: str):
    """Vectorized RE2 pattern redaction on planted emails (plus a no-TLD decoy
    that must NOT match); per-row match counts and redacted lengths are exact
    integers the SQL oracle reproduces with the same regex."""
    from raysketch.pipeline.text import redact_batch

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def aug(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"))
        texts = []
        for i, t in zip(ids, batch.column("text").to_pylist()):
            if i % 3 == 0:
                t += f" contact user{i}@example.com"
            if i % 5 == 0:
                t += f" admin{i}@test.org x"
            if i % 7 == 0:
                t += f" ping{i}@nodot"
            texts.append(t)
        return pa.table({"doc_id": ids, "text": texts})

    out = docs.map_batches(aug, batch_format="pyarrow", zero_copy_batch=True).map_batches(
        redact_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    return (
        out.select_columns(["doc_id", "n_matches", "redacted_len"])
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )


def q_dup_spans(sf_dir: str):
    """Exact-substring duplication stats (16-char windows, df>=2 across docs)
    — the character-level dedup signal; hashes on the Ray side, strings in
    the oracle (ASCII corpus → byte windows ≡ char windows)."""
    from raysketch.pipeline.decontam import dup_span_stats

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return (
        dup_span_stats(docs, window=16)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )


def q_length_filter(sf_dir: str):
    """Percentile length gate with EXACT distributed thresholds (P5–P95 of
    n_chars via the bounded-cardinality histogram scan); the oracle re-derives
    the same rank definition with a window cumsum — no engine quantile
    semantics involved."""
    from raysketch.pipeline.text import length_filter

    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    kept, _lo, _hi = length_filter(docs, col="n_chars", lo_q=0.05, hi_q=0.95)
    return kept.to_pandas().sort_values("doc_id", ignore_index=True)


def q_weighted_sample(sf_dir: str):
    """Deterministic weighted sample (Efraimidis–Spirakis keys with hash
    uniforms — bitwise partition-independent) of lineitem rows weighted by
    l_quantity; invariant row: exact size/seen counts + a distributed
    containment check of every sampled (key, weight) pair."""
    import pandas as pd
    import ray

    from raysketch.pipeline.build import build_sketch
    from raysketch.sketches.weighted_reservoir import WeightedReservoir

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    sk = build_sketch(
        li,
        ["l_orderkey", "l_quantity"],
        lambda: WeightedReservoir(k=100, seed=7),
        update=lambda s, b: s.update_columns(
            b.column("l_orderkey"), b.column("l_quantity").to_numpy(zero_copy_only=False)
        ),
    )
    rows = sk.sample_rows()
    pairs = sorted({(int(v), float(w)) for v, w in rows})
    ref = ray.put(np.array(pairs, dtype=np.float64))

    def seen(batch: pa.Table) -> pa.Table:
        p = ray.get(ref)
        k = np.asarray(batch.column("l_orderkey")).astype(np.float64)
        q = batch.column("l_quantity").to_numpy(zero_copy_only=False).astype(np.float64)
        # pre-filter rows whose key is sampled at all, THEN the small 2D pair
        # check — keeps the temporary at (≤hits × 100), never (batch × 100)
        cand = np.nonzero(np.isin(k, p[:, 0]))[0]
        if len(cand) == 0:
            return pa.table({"i": pa.array([], pa.int64())})
        hit = (k[cand][:, None] == p[:, 0]) & (q[cand][:, None] == p[:, 1])
        found = np.nonzero(hit.any(axis=0))[0]
        return pa.table({"i": found.astype(np.int64)})

    found_idx = set()
    for b in li.map_batches(seen, batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        found_idx.update(np.asarray(b.column("i")).tolist())
    return pd.DataFrame(
        [
            {
                "sample_size": len(rows),
                "n_seen": int(sk.n_seen),
                "all_members_valid": bool(len(found_idx) == len(pairs)),
            }
        ]
    )


def q_chunk_text(sf_dir: str):
    """Overlapping-window chunking over the real corpus (256-byte chunks,
    stride 192 — the RAG/embedding pre-pass) with each chunk row carrying its
    doc's CANONICALIZED source URL (r5 consolidation: the url_canonicalize
    kernel rides the same driver row; documents carry no url column, so the
    fixture plants mixed-case schemes/hosts, default ports, fragments and
    missing paths keyed on doc_id — which SQL restates). The chunking oracle
    is generate_series + substring, exact on the ASCII corpus."""
    from raysketch.pipeline.text import canonicalize_url_array, chunk_text_batch

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def chunk_with_url(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"))
        urls = pa.array(
            [
                (
                    f"HTTP://ExAmple{i % 7}.COM:80/p{i}"
                    if i % 2 == 0
                    else f"https://SiTe{i % 5}.OrG:443"
                )
                + ("#sec" if i % 3 == 0 else "")
                for i in ids
            ],
            pa.string(),
        )
        canon = canonicalize_url_array(urls)
        chunks = chunk_text_batch(batch, chunk_size=256, stride=192)
        # map each chunk row back to its doc's position in THIS batch (ids are
        # unique within a batch) to gather the canonical url per chunk
        order = np.argsort(ids)
        pos = order[
            np.searchsorted(ids[order], np.asarray(chunks.column("doc_id")))
        ]
        return chunks.append_column("canonical_url", canon.take(pa.array(pos)))

    return (
        docs.map_batches(chunk_with_url, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"], ignore_index=True)
    )


def q_mix_corpora(sf_dir: str):
    """Deterministic domain mixing over three real sources (weights 2/1/1,
    n_target=40 → largest-remainder quotas 20/10/10, quota smallest doc_ids
    each) — the training-mixture composition step; the SQL row_number window
    states it exactly."""
    from raysketch.pipeline.export import mix_corpora

    docs = _read(sf_dir, "documents", ["doc_id", "source"])
    srcs = {s: docs.filter(expr=f"source == '{s}'") for s in ("src0", "src1", "src2")}
    return (
        mix_corpora(srcs, {"src0": 2, "src1": 1, "src2": 1}, n_target=40)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )


def q_export_shards(sf_dir: str):
    """Resumable sharded Parquet export (mod-16 routing on doc_id): writes the
    corpus as one atomic file per shard under /tmp and returns the per-shard
    row counts — which plain SQL states. Resume semantics (skip finished
    shards, byte-deterministic files) are covered by
    tests/test_shards_export.py."""
    import shutil
    import tempfile

    from raysketch.io.shards import write_corpus_shards

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    out_dir = tempfile.mkdtemp(prefix="raysketch_shards_", dir="/tmp")
    try:
        summary = write_corpus_shards(docs, out_dir, key_col="doc_id", num_shards=16)
        return summary[["shard", "n_rows"]]
    finally:
        # summary is a driver-side frame — repeated gate runs must not
        # accumulate corpus-sized shard dirs in /tmp
        shutil.rmtree(out_dir, ignore_errors=True)


def q_pack_sequences(sf_dir: str):
    """Concat-and-cut sequence packing over the real corpus (whitespace token
    counts; budget 512): per doc the (start_seq, end_seq, start_off) it lands
    at in the global token stream. Integer-exact — the oracle is a SQL window
    cumsum. Distributed shape: two-level prefix sum (per-id-range partials →
    bounded driver scan → keyed finalize), raysketch/pipeline/export.py."""
    from raysketch.pipeline.export import pack_sequences
    from raysketch.pipeline.text import token_count_batch

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    with_tokens = docs.map_batches(
        lambda t: token_count_batch(t).drop_columns(["text"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return (
        pack_sequences(with_tokens, budget=512)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )


def q_stratified_sample(sf_dir: str):
    """Stratified proportional sample by lang (n_target=100): quota
    max(1, (100*c)//total) per lang, in BOTH rank modes in one driver row (r5):
    rank_by='id' (quota smallest doc_ids — the original ordering) UNION
    rank_by='hash' (rank on the Fibonacci scramble (id*0x9E3779B97F4A7C15)
    mod 2^64 — id-decorrelated, statistically defensible mixtures). Both are
    integer-exact vs SQL row_number windows (the scramble is HUGEINT-stateable).
    Distributed shape: map-side per-key top-q combiner → keyed exchange of
    candidates only (never a whole hot group), raysketch/pipeline/export.py."""
    import pandas as pd

    from raysketch.pipeline.export import stratified_sample

    docs = _read(sf_dir, "documents", ["doc_id", "lang"])
    by_id = (
        stratified_sample(docs, key_col="lang", n_target=100)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    by_hash = (
        stratified_sample(docs, key_col="lang", n_target=100, rank_by="hash")
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    by_id.insert(0, "rank_by", "id")
    by_hash.insert(0, "rank_by", "hash")
    return pd.concat([by_id, by_hash], ignore_index=True)


def q_line_dedup(sf_dir: str):
    """CCNet-style duplicated-line removal on a SQL-checkable planted fixture
    (the corpus text has no newlines): every doc gets two unique lines; docs
    with doc_id%4==0 carry a shared 'copyright footer' line and doc_id%7==0 a
    shared 'subscribe now' line (both hot at min_docs=5 for any sf). The
    operator must strip exactly the planted boilerplate and rebuild the
    remaining text — which plain SQL states. Natural-corpus behavior is
    covered by tests/test_export.py."""
    from raysketch.pipeline.decontam import line_dedup

    ds = _read(sf_dir, "documents", ["doc_id"])

    def synth(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"))
        texts = []
        for i in ids:
            lines = [f"u{i} alpha"]
            if i % 4 == 0:
                lines.append("copyright footer")
            lines.append(f"u{i} beta")
            if i % 7 == 0:
                lines.append("subscribe now")
            texts.append("\n".join(lines))
        return pa.table({"doc_id": pa.array(ids), "text": pa.array(texts, pa.string())})

    planted = ds.map_batches(synth, batch_format="pyarrow", zero_copy_batch=True)
    return (
        line_dedup(planted, min_docs=5)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )


# ---------------------------------------------------------------------------
# contract
# ---------------------------------------------------------------------------


def entry() -> Any:
    """Flagship pipeline on sf0.001: Bloom membership metrics over lineitem keys."""
    return q_bloom_membership("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    # ORDERING CONTRACT: the driver's CORRECTNESS gate checks the FIRST 50
    # entries — and there are EXACTLY 50 (r5 consolidation, VERDICT r4
    # next-round #3): the window is TOTAL, never rotating. Redundant-coverage
    # variants were merged into their representative's driver row (e.g.
    # token_stats carries both tokenizer kernels, bloom_membership runs both
    # probe modes, heavy_hitters unions Misra-Gries and CMS) or deleted where
    # another row exercised the identical machinery (see COVERAGE.md).
    return {
        # exact (oracle-checked)
        "dedup_exact": q_dedup_exact,
        "token_stats": q_token_stats,  # whitespace + BPE kernels
        "quality_stats": q_quality_stats,  # incl. per-lang doc counts
        "repetition_stats": q_repetition_stats,
        "window_events": q_window_events,
        "asof_join": q_asof_join,
        "range_join": q_range_join,
        "sessionize": q_sessionize,
        "semi_anti_join": q_semi_anti_join,  # both negation paths
        "lineitem_agg": q_lineitem_agg,
        "pack_sequences": q_pack_sequences,
        "stratified_sample": q_stratified_sample,  # rank_by id + hash
        "line_dedup": q_line_dedup,
        "export_shards": q_export_shards,
        "mix_corpora": q_mix_corpora,
        "ann_topk": q_ann_topk,
        "top_per_group": q_top_per_group,
        "heavy_hitters": q_heavy_hitters,  # Misra-Gries + CMS
        "reservoir_by_lang": q_reservoir_by_lang,
        "bloom_join_pushdown": q_bloom_join_pushdown,
        "top_tokens_per_lang": q_top_tokens_per_lang,
        "decontaminate": q_decontaminate,
        "hot_ngrams": q_hot_ngrams,
        "rare_tokens": q_rare_tokens,
        "pii_redact": q_pii_redact,
        "dup_spans": q_dup_spans,
        "length_filter": q_length_filter,
        "weighted_sample": q_weighted_sample,
        "ann_lsh": q_ann_lsh,
        "lang_id": q_lang_id,
        "media_pipeline": q_media_pipeline,  # features + frame fan-out
        "webpipeline": q_webpipeline,
        "quantiles_by_lang": q_quantiles_by_lang,
        "dedup_incremental": q_dedup_incremental,
        "extract_invariant": q_extract_invariant,  # + fingerprint injectivity
        "chunk_text": q_chunk_text,  # + url_canonicalize kernel
        # sketch / approximate (invariant rows)
        "bloom_membership": q_bloom_membership,  # broadcast + shard-routed
        "bloom_membership_refs": q_bloom_membership_refs,
        "bloom_membership_ckpt": q_bloom_membership_ckpt,  # checkpoint-dir probe
        "bloom_delete": q_bloom_delete,
        "hll_by_lang": q_hll_by_lang,
        "hll_window": q_hll_window,
        "quantile_sketches": q_quantile_sketches,  # tdigest + kll + ddsketch
        "theta_set_ops": q_theta_set_ops,
        "minhash_dedup": q_minhash_dedup,
        "jaccard_dedup": q_jaccard_dedup,
        "simhash_dedup": q_simhash_dedup,
        "embedding_dedup": q_embedding_dedup,
        "ann_topk_ds": q_ann_topk_ds,
        "ann_ivf_ds": q_ann_ivf_ds,  # + agreement with broadcast IVF path
    }


def oracle_sql() -> dict[str, str]:
    return {
        "dedup_exact": (
            "SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text"
        ),
        "semi_anti_join": (
            "SELECT 'semi' AS side, l_orderkey, l_linenumber, l_quantity FROM lineitem "
            "WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 200000) "
            "UNION ALL "
            "SELECT 'anti' AS side, l_orderkey, l_linenumber, l_quantity FROM lineitem "
            "WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 200000)"
        ),
        "chunk_text": (
            "WITH w AS (SELECT doc_id, text, "
            "unnest(generate_series(0, length(text) - 1, 192)) AS s FROM documents) "
            "SELECT doc_id, (s // 192)::BIGINT AS chunk_idx, s::BIGINT AS start_off, "
            "substring(text, s::INT + 1, 256) AS chunk_text, "
            "CASE WHEN doc_id % 2 = 0 THEN "
            "'http://example' || (doc_id % 7)::VARCHAR || '.com/p' || doc_id::VARCHAR "
            "ELSE 'https://site' || (doc_id % 5)::VARCHAR || '.org/' END "
            "AS canonical_url FROM w ORDER BY doc_id, chunk_idx"
        ),
        "stratified_sample": (
            "WITH cnt AS (SELECT lang, count(*)::BIGINT AS c FROM documents GROUP BY lang), "
            "tot AS (SELECT count(*)::BIGINT AS t FROM documents), "
            "tgt AS (SELECT lang, least(c, greatest(1, (100 * c) // t)) AS q FROM cnt, tot), "
            "r1 AS (SELECT doc_id, lang, row_number() OVER "
            "(PARTITION BY lang ORDER BY doc_id) AS rn FROM documents), "
            # sign-correct mod-2^64 wrap: DuckDB % follows the dividend's sign,
            # so negative ids need the +2^64 re-mod to match numpy's uint64 wrap
            "r2 AS (SELECT doc_id, lang, row_number() OVER "
            "(PARTITION BY lang ORDER BY "
            "(((doc_id::HUGEINT * 11400714819323198485) % 18446744073709551616) "
            "+ 18446744073709551616) % 18446744073709551616) AS rn "
            "FROM documents) "
            "SELECT 'id' AS rank_by, r1.doc_id, r1.lang FROM r1 JOIN tgt USING (lang) WHERE rn <= q "
            "UNION ALL "
            "SELECT 'hash' AS rank_by, r2.doc_id, r2.lang FROM r2 JOIN tgt USING (lang) WHERE rn <= q"
        ),
        # MG k (4096) >> vocabulary and CMS width (8192) >> 5 event types -> no
        # pruning / no cell collision -> both sketches' estimates are exact
        "heavy_hitters": (
            "SELECT * FROM (SELECT 'misra_gries' AS sketch, token AS key, count(*)::BIGINT AS est "
            "FROM (SELECT unnest(regexp_extract_all(text, '\\S+')) AS token FROM documents) "
            "GROUP BY token ORDER BY est DESC, token LIMIT 20) "
            "UNION ALL "
            "SELECT 'cms' AS sketch, event_type AS key, count(*)::BIGINT AS est "
            "FROM events GROUP BY event_type"
        ),
        "extract_invariant": (
            "SELECT 10000::BIGINT AS rows, 0::BIGINT AS mismatches, "
            "count(*)::BIGINT AS n_docs, count(DISTINCT text)::BIGINT AS n_distinct_fp, "
            "count(DISTINCT text)::BIGINT AS n_distinct_text FROM documents"
        ),
        "bloom_membership": (
            "SELECT (SELECT count(*) FROM orders)::BIGINT AS test_count, "
            "(SELECT count(*) FROM orders WHERE o_orderkey IN "
            "(SELECT l_orderkey FROM lineitem))::BIGINT AS tp, "
            "0::BIGINT AS fn, true AS fp_under_2p, true AS modes_bitwise_equal"
        ),
        "bloom_membership_ckpt": (
            "SELECT (SELECT count(*) FROM orders)::BIGINT AS test_count, "
            "(SELECT count(*) FROM orders WHERE o_orderkey IN "
            "(SELECT l_orderkey FROM lineitem))::BIGINT AS tp, "
            "0::BIGINT AS fn, true AS fp_under_2p"
        ),
        "quantile_sketches": (
            "SELECT 'tdigest' AS sketch, unnest([0.01, 0.25, 0.5, 0.75, 0.99]::DOUBLE[]) AS q, "
            "true AS within_bound "
            "UNION ALL SELECT 'kll', unnest([0.01, 0.25, 0.5, 0.75, 0.99]::DOUBLE[]), true "
            "UNION ALL SELECT 'ddsketch', unnest([0.01, 0.25, 0.5, 0.75, 0.99]::DOUBLE[]), true"
        ),
        "ann_ivf_ds": (
            "SELECT i::BIGINT AS query_id, true AS paths_identical, "
            "true AS recall_at_least_half FROM range(3) t(i)"
        ),
        # media fixture fields are closed-form functions of media_id
        # (gen_media_table) -- SQL reproduces the joined frames x features table
        "media_pipeline": (
            "SELECT i::BIGINT AS media_id, "
            "unnest(range(CASE WHEN i % 3 = 2 THEN greatest(((i * 211) % 10000 + 999) // 1000, 1) "
            "ELSE 1 END))::BIGINT AS frame_idx, "
            "CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type, "
            "(16 + (i * 37) % 240)::INTEGER AS width FROM range(256) t(i) "
            "ORDER BY media_id, frame_idx"
        ),
        "repetition_stats": (
            "SELECT doc_id, "
            "(doc_id % 4)::DOUBLE / (10 + doc_id % 4) AS r_dup_line_frac, "
            "CASE WHEN doc_id % 4 = 0 THEN 0.0 ELSE "
            "((doc_id % 4 + 1) * 10)::DOUBLE / ((10 + doc_id % 4) * 10) END "
            "AS r_dup_line_char_frac, "
            "(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE doc_id % 4 END)::DOUBLE "
            "/ (9 + doc_id % 4) AS r_top2gram_frac "
            "FROM documents"
        ),
        "token_stats": (
            "SELECT doc_id, len(regexp_extract_all(text, '\\S+'))::BIGINT AS n_tokens, "
            "len(regexp_extract_all(text, "
            "'''s|''t|''re|''ve|''m|''ll|''d| ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9]+|\\s+'"
            "))::BIGINT AS n_bpe_tokens FROM documents"
        ),
        "quality_stats": (
            "SELECT lang, count(*)::BIGINT AS n_docs, sum(length(text))::BIGINT AS sum_chars, "
            "sum(len(regexp_extract_all(text, '\\S+')))::BIGINT AS sum_tokens "
            "FROM documents GROUP BY lang"
        ),
        "window_events": (
            "SELECT event_type, (floor(epoch(ts))::BIGINT // 86400) * 86400 AS window_start, "
            "count(*)::BIGINT AS n_events, min(value) AS min_value, max(value) AS max_value "
            "FROM events GROUP BY event_type, window_start"
        ),
        "asof_join": (
            "SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us, "
            "epoch_us(r.ts)::DOUBLE AS matched_ts_us, r.value AS matched_value "
            "FROM (SELECT * FROM events WHERE event_type = 'click') l "
            "ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r "
            "ON l.user_id = r.user_id AND l.ts >= r.ts"
        ),
        "range_join": (
            "SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us, "
            "epoch_us(r.ts) AS matched_ts_us, r.value AS matched_value "
            "FROM (SELECT * FROM events WHERE event_type = 'click') l "
            "JOIN (SELECT * FROM events WHERE event_type = 'purchase') r "
            "ON l.user_id = r.user_id "
            "AND epoch_us(r.ts) BETWEEN epoch_us(l.ts) - 3600000000 AND epoch_us(l.ts)"
        ),
        "sessionize": (
            "SELECT user_id, count(*)::BIGINT AS n_events, "
            "(1 + sum(CASE WHEN prev IS NOT NULL AND floor(epoch(ts))::BIGINT - floor(epoch(prev))::BIGINT > 1800 THEN 1 ELSE 0 END))::BIGINT AS n_sessions "
            "FROM (SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev FROM events) "
            "GROUP BY user_id"
        ),
        "export_shards": (
            "SELECT doc_id % 16 AS shard, count(*)::BIGINT AS n_rows "
            "FROM documents GROUP BY shard ORDER BY shard"
        ),
        "mix_corpora": (
            "WITH r AS (SELECT doc_id, source, row_number() OVER "
            "(PARTITION BY source ORDER BY doc_id) AS rn FROM documents "
            "WHERE source IN ('src0','src1','src2')) "
            "SELECT doc_id, source FROM r WHERE (source = 'src0' AND rn <= 20) "
            "OR (source = 'src1' AND rn <= 10) OR (source = 'src2' AND rn <= 10) "
            "ORDER BY doc_id"
        ),
        "pack_sequences": (
            "WITH c AS (SELECT doc_id, len(regexp_extract_all(text, '\\S+'))::BIGINT AS n "
            "FROM documents), "
            "w AS (SELECT doc_id, n, COALESCE(SUM(n) OVER (ORDER BY doc_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS pre FROM c) "
            "SELECT doc_id, pre // 512 AS start_seq, "
            "(pre + CASE WHEN n > 0 THEN n - 1 ELSE 0 END) // 512 AS end_seq, "
            "pre % 512 AS start_off FROM w ORDER BY doc_id"
        ),
        "line_dedup": (
            "SELECT doc_id, "
            "'u' || doc_id::VARCHAR || ' alpha' || chr(10) || 'u' || doc_id::VARCHAR || ' beta' "
            "AS clean_text, 2::BIGINT AS n_kept, "
            "((doc_id % 4 = 0)::BIGINT + (doc_id % 7 = 0)::BIGINT)::BIGINT AS n_removed "
            "FROM documents ORDER BY doc_id"
        ),
        "lineitem_agg": (
            "SELECT l_returnflag, l_linestatus, count(*)::BIGINT AS count_order, "
            "sum(l_quantity) AS sum_qty FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "ann_topk": (
            "SELECT vec_id FROM embeddings "
            "ORDER BY list_cosine_similarity(embedding, (SELECT embedding FROM embeddings WHERE vec_id = 0)) DESC, vec_id "
            "LIMIT 10"
        ),
        "ann_topk_ds": (
            "SELECT q.vec_id AS query_id, t.vec_id FROM embeddings q, LATERAL ("
            "SELECT e.vec_id FROM embeddings e "
            "ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC, e.vec_id "
            "LIMIT 10) t WHERE q.vec_id < 3"
        ),
        # CMS width (8192) >> key cardinality (5 event types) → the 5 keys land in
        # distinct cells in every row (verified; deterministic in our fixed hashes),
        # so the min-estimate equals the exact count.
        "top_per_group": (
            "SELECT o_custkey, o_orderkey, o_totalprice FROM orders "
            "QUALIFY row_number() OVER (PARTITION BY o_custkey "
            "ORDER BY o_totalprice DESC, o_orderkey) <= 3"
        ),
        "bloom_join_pushdown": (
            "SELECT o_orderpriority, count(*)::BIGINT AS n_items, "
            "sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT AS revenue_cents "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "WHERE o_totalprice > 300000 GROUP BY o_orderpriority"
        ),
        "decontaminate": (
            "WITH toks AS ("
            "  SELECT doc_id, unnest(ts) AS tok, generate_subscripts(ts, 1) AS pos"
            "  FROM (SELECT doc_id, regexp_extract_all(text, '\\S+') AS ts FROM documents)"
            "), ngrams AS ("
            "  SELECT doc_id, tok || ' ' || lead(tok,1) OVER w || ' ' || "
            "lead(tok,2) OVER w || ' ' || lead(tok,3) OVER w AS ng"
            "  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)"
            "), ng AS (SELECT DISTINCT doc_id, ng FROM ngrams WHERE ng IS NOT NULL), "
            "bench AS (SELECT DISTINCT ng FROM ng WHERE doc_id % 13 = 0) "
            "SELECT g.doc_id, count(*)::BIGINT AS overlap_ngrams "
            "FROM ng g JOIN bench b USING (ng) WHERE g.doc_id % 13 <> 0 "
            "GROUP BY g.doc_id HAVING count(*) >= 1"
        ),
        # the planted mess (case flips, tab runs, padding) must round-trip to the
        # ORIGINAL text (corpus is lowercase/single-spaced — verified at every
        # sf), so the oracle states the fixed point; any normalize kernel that
        # under-cleans leaves mess in the Ray output and hash-mismatches
        "length_filter": (
            "WITH cnt AS (SELECT n_chars AS v, count(*) AS c FROM documents GROUP BY v), "
            "cum AS (SELECT v, sum(c) OVER (ORDER BY v) AS f FROM cnt), "
            "n AS (SELECT count(*) AS n FROM documents), "
            "lo AS (SELECT min(v) AS lo FROM cum, n WHERE f >= ceil(0.05 * n)), "
            "hi AS (SELECT min(v) AS hi FROM cum, n WHERE f >= ceil(0.95 * n)) "
            "SELECT doc_id, n_chars FROM documents, lo, hi "
            "WHERE n_chars BETWEEN lo AND hi"
        ),
        "dup_spans": (
            "WITH pos AS ("
            "  SELECT doc_id, text, unnest(range(1, length(text) - 16 + 2)) AS i FROM documents"
            "), wins AS ("
            "  SELECT doc_id, substr(text, i::INT, 16) AS w FROM pos"
            "), dfw AS (SELECT w, count(DISTINCT doc_id) AS df FROM wins GROUP BY w) "
            "SELECT v.doc_id, count(*)::BIGINT AS n_windows, "
            "count(*) FILTER (WHERE d.df >= 2)::BIGINT AS n_dup_windows "
            "FROM wins v JOIN dfw d USING (w) GROUP BY v.doc_id"
        ),
        "rare_tokens": (
            "WITH aug AS ("
            "  SELECT doc_id, text || ' m' || (doc_id % 40)::VARCHAR || ' r' || "
            "(doc_id % 80)::VARCHAR || repeat(' u' || doc_id::VARCHAR, (doc_id % 4)::INT) AS text"
            "  FROM documents"
            "), toks AS ("
            "  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS tok FROM aug"
            "), dfreq AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY tok) "
            "SELECT t.doc_id, count(*)::BIGINT AS n_tokens, "
            "count(*) FILTER (WHERE d.df < 10)::BIGINT AS n_rare "
            "FROM toks t JOIN dfreq d USING (tok) GROUP BY t.doc_id"
        ),
        "pii_redact": (
            "WITH aug AS ("
            "  SELECT doc_id, text"
            "  || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id::VARCHAR || '@example.com' ELSE '' END"
            "  || CASE WHEN doc_id % 5 = 0 THEN ' admin' || doc_id::VARCHAR || '@test.org x' ELSE '' END"
            "  || CASE WHEN doc_id % 7 = 0 THEN ' ping' || doc_id::VARCHAR || '@nodot' ELSE '' END AS text"
            "  FROM documents) "
            "SELECT doc_id, "
            "len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))::BIGINT AS n_matches, "
            "length(regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', "
            "'[REDACTED]', 'g'))::BIGINT AS redacted_len FROM aug"
        ),
        "hot_ngrams": (
            "WITH toks AS ("
            "  SELECT doc_id, unnest(ts) AS tok, generate_subscripts(ts, 1) AS pos"
            "  FROM (SELECT doc_id, regexp_extract_all(text, '\\S+') AS ts FROM documents)"
            "), ngrams AS ("
            "  SELECT doc_id, tok || ' ' || lead(tok,1) OVER w || ' ' || "
            "lead(tok,2) OVER w AS ng"
            "  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)"
            ") SELECT ng AS ngram, count(DISTINCT doc_id)::BIGINT AS n_docs "
            "FROM ngrams WHERE ng IS NOT NULL "
            "GROUP BY ng HAVING count(DISTINCT doc_id) >= 5"
        ),
        "top_tokens_per_lang": (
            "SELECT lang, token, count(*)::BIGINT AS n FROM "
            "(SELECT lang, unnest(regexp_extract_all(text, '\\S+')) AS token FROM documents) "
            "GROUP BY lang, token "
            "QUALIFY row_number() OVER (PARTITION BY lang ORDER BY n DESC, token) <= 5"
        ),
        "hll_window": (
            "SELECT (floor(epoch(ts))::BIGINT // 86400) * 86400 AS window_start, "
            "true AS within_3sigma FROM events GROUP BY window_start"
        ),
        # MG k (4096) >> vocabulary (31 tokens) → no pruning ever happens → the
        # summary's counts are exact and the top-20 matches the true top-20
        # ------------------------------------------------------------------
        # invariant-row oracles for the approximate/sketch operators: the Ray
        # side emits exact counts + published-error-bound booleans; the SQL
        # states the exact counts and asserts the bounds hold (constant true —
        # the measured margins are ≥2-25×, recorded in BASELINE.md r3 notes)
        # ------------------------------------------------------------------
        "weighted_sample": (
            "SELECT 100::BIGINT AS sample_size, count(*)::BIGINT AS n_seen, "
            "true AS all_members_valid FROM lineitem"
        ),
        "reservoir_by_lang": (
            "SELECT lang, least(20, count(*))::BIGINT AS sample_size, "
            "count(*)::BIGINT AS n_seen, true AS all_members_valid "
            "FROM documents GROUP BY lang"
        ),
        "bloom_membership_refs": (
            "SELECT (SELECT count(*) FROM orders)::BIGINT AS test_count, "
            "(SELECT count(*) FROM orders WHERE o_orderkey IN "
            "(SELECT l_orderkey FROM lineitem))::BIGINT AS tp, "
            "0::BIGINT AS fn, true AS fp_under_2p"
        ),
        "bloom_delete": (
            "SELECT 0::BIGINT AS kept_missing, true AS retired_fp_under_2p, "
            "true AS fresh_fp_under_2p, "
            "(SELECT count(*) FROM documents WHERE lang <> 'en')::BIGINT AS net_count"
        ),
        "hll_by_lang": "SELECT lang, true AS within_3sigma FROM documents GROUP BY lang",
        "quantiles_by_lang": (
            "SELECT lang, unnest([0.25, 0.5, 0.75]::DOUBLE[]) AS q, true AS within_bound "
            "FROM (SELECT DISTINCT lang FROM documents)"
        ),
        "theta_set_ops": (
            "SELECT unnest(['union', 'intersection', 'difference_a_minus_b']) AS op, "
            "true AS within_3sigma"
        ),
        "dedup_incremental": (
            "SELECT count(*) FILTER (WHERE doc_id < (SELECT count(*) // 2 FROM documents))::BIGINT AS epoch1_rows, "
            "count(*) FILTER (WHERE doc_id >= (SELECT count(*) // 2 FROM documents))::BIGINT AS epoch2_rows, "
            "true AS drop_rate_under_2p FROM documents"
        ),
        # planted-fixture dedup: the only pairs above threshold are the planted
        # (original, copy) pairs — the cluster table is exactly predictable
        "minhash_dedup": (
            "SELECT doc_id AS cluster_id, doc_id FROM documents WHERE doc_id % 10 = 0 "
            "UNION ALL "
            "SELECT doc_id AS cluster_id, doc_id + 10000000 AS doc_id FROM documents WHERE doc_id % 10 = 0"
        ),
        "jaccard_dedup": (
            "SELECT doc_id AS cluster_id, doc_id FROM documents WHERE doc_id % 10 = 0 "
            "UNION ALL "
            "SELECT doc_id AS cluster_id, doc_id + 10000000 AS doc_id FROM documents WHERE doc_id % 10 = 0"
        ),
        "simhash_dedup": (
            "SELECT doc_id AS cluster_id, doc_id FROM documents WHERE doc_id % 10 = 0 "
            "UNION ALL "
            "SELECT doc_id AS cluster_id, doc_id + 10000000 AS doc_id FROM documents WHERE doc_id % 10 = 0"
        ),
        "embedding_dedup": (
            "SELECT vec_id AS cluster_id, vec_id AS doc_id FROM embeddings WHERE vec_id % 10 = 0 "
            "UNION ALL "
            "SELECT vec_id AS cluster_id, vec_id + 1000000 AS doc_id FROM embeddings WHERE vec_id % 10 = 0"
        ),
        "ann_lsh": (
            "SELECT i::BIGINT AS query_id, true AS self_found, true AS copy_found "
            "FROM range(8) t(i)"
        ),
        "lang_id": "SELECT doc_id, lang AS lang_pred FROM documents",
        # media fixture fields are closed-form functions of media_id
        # (gen_media_table) — SQL reproduces the table from range()
        # webpipeline runs on the fixed seeded 10k-row /tmp corpus (sf-independent)
        "webpipeline": (
            "SELECT unnest(['de', 'en', 'es', 'fr', 'tr', 'zh']) AS lang, true AS within_3sigma"
        ),
    }
