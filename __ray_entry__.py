"""Driver contract for the graft builder (Ray Data target).

``entry()`` — flagship pipeline on /root/testdata/sf0.001 (Ray already initialised
by the driver; nothing here calls ray.init).
``queries()`` — one callable per implemented pipeline/operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL for the exactly-reproducible queries;
sketch/LSH queries are deliberately omitted there (approximate/non-SQL ops get the
driver's rows-only check; their accuracy bounds are asserted in tests/).

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
# exact queries (SQL-oracle-checked)
# ---------------------------------------------------------------------------


def q_dedup_exact(sf_dir: str):
    """Exact dedup of documents by text content (hash-partitioned, min-id survivor)."""
    from raysketch.pipeline.dedup import exact_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = exact_dedup(ds, text_col="text", id_col="doc_id")
    return out.select_columns(["doc_id", "text"]).to_pandas().sort_values("doc_id").reset_index(drop=True)


def q_lang_counts(sf_dir: str):
    """Grouped count — partial-per-batch + tiny final groupby."""
    ds = _read(sf_dir, "documents", ["lang"])

    def partial(batch: pa.Table) -> pa.Table:
        langs, counts = np.unique(np.asarray(batch.column("lang")), return_counts=True)
        return pa.table({"lang": pa.array(langs.tolist(), pa.string()), "n": pa.array(counts, pa.int64())})

    from ray.data.aggregate import Sum

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return parts.groupby("lang").aggregate(Sum("n", alias_name="n_docs")).to_pandas()


def q_source_counts(sf_dir: str):
    ds = _read(sf_dir, "documents", ["source"])

    def partial(batch: pa.Table) -> pa.Table:
        s, c = np.unique(np.asarray(batch.column("source")), return_counts=True)
        return pa.table({"source": pa.array(s.tolist(), pa.string()), "n": pa.array(c, pa.int64())})

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(Sum("n", alias_name="n_docs"))
        .to_pandas()
    )


def q_token_stats(sf_dir: str):
    """Per-document token count (vectorized regex count)."""
    from raysketch.pipeline.text import token_count_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(
        lambda b: token_count_batch(b, "text").select(["doc_id", "n_tokens"]),
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


def q_sliding_windows(sf_dir: str):
    """Sliding windows (2h wide, 1h slide) per event_type — event fan-out inside
    the batch, two-level aggregation."""
    from raysketch.pipeline.events import sliding_window_agg

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    out = sliding_window_agg(ds, window_s=7200, slide_s=3600).to_pandas()
    return out[["event_type", "window_start", "n_events"]]


def q_window_distinct(sf_dir: str):
    """Exact distinct users per tumbling 1-day window — the distinct-in-window
    pattern: per-batch (window, user) dedup partials shrink the shuffle, then a
    native two-level groupby (dedup pairs → count per window). The approximate
    analogue at 10^12 rows is the same shape with per-window HLL partials
    (see hll_by_lang); this exact form is the oracle-checkable one."""
    from ray.data.aggregate import Count

    from raysketch.pipeline.events import _epoch_seconds

    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        epoch = _epoch_seconds(batch.column("ts"))
        window = (epoch // 86400) * 86400
        users = np.asarray(batch.column("user_id"))
        pairs = np.unique(np.stack([window, users]), axis=1)
        return pa.table(
            {
                "window_start": pa.array(pairs[0]),
                "user_id": pa.array(pairs[1]),
            }
        )

    pairs = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    distinct = pairs.groupby(["window_start", "user_id"]).aggregate(Count(alias_name="__n"))
    return (
        distinct.groupby("window_start")
        .aggregate(Count(alias_name="n_users"))
        .to_pandas()
    )


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
    return out.to_pandas()


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


def q_semi_join(sf_dir: str):
    """Exact semi-join: lineitems of orders with totalprice > 200000
    (broadcast under 5M keys, native left_semi hash join beyond)."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity"])
    return _exact_join_keyset(sf_dir, li, "l_orderkey", negate=False).to_pandas()


def q_anti_join(sf_dir: str):
    """Exact anti-join: lineitems of orders with totalprice <= 200000
    (broadcast under 5M keys, native left_anti hash join beyond)."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity"])
    return _exact_join_keyset(sf_dir, li, "l_orderkey", negate=True).to_pandas()


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


# ---------------------------------------------------------------------------
# sketch / approximate queries (rows-only driver check; bounds tested in tests/)
# ---------------------------------------------------------------------------


def q_token_counts_global(sf_dir: str):
    """Global token frequencies (exact heavy-hitters path): vectorized tokenize →
    in-batch partial counts (the explode never leaves the task) → tiny groupby-sum
    over (token, partial_count) rows."""
    ds = _read(sf_dir, "documents", ["text"])

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.utf8_split_whitespace(batch.column("text").combine_chunks()))
        toks = toks.filter(pc.greater(pc.utf8_length(toks), 0))
        vc = toks.value_counts()
        return pa.table(
            {"token": vc.field("values"), "n": pc.cast(vc.field("counts"), pa.int64())}
        )

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )


def q_heavy_hitters(sf_dir: str):
    """Misra–Gries top-20 tokens over all document text (mergeable frequent-items
    summary, Agarwal et al. PODS'12 merge). k=4096 ≫ the corpus vocabulary, so no
    counter is ever pruned and the estimates are EXACT — SQL-oracle-checkable
    (same trick as cms_event_types; the approximation bounds are property-tested
    in tests/test_sketches.py on streams that DO overflow k)."""
    import pandas as pd

    from raysketch.pipeline.build import build_sketch
    from raysketch.sketches.mg import MisraGries

    def upd(sk, col):
        toks = pc.list_flatten(pc.utf8_split_whitespace(col))
        toks = toks.filter(pc.greater(pc.utf8_length(toks), 0))
        sk.update_column(toks)

    ds = _read(sf_dir, "documents", ["text"])
    mg = build_sketch(ds, "text", lambda: MisraGries(4096), update=upd)
    top = mg.topk(20)
    return pd.DataFrame({"token": [t for t, _ in top], "est": [int(c) for _, c in top]})


def q_reservoir_sample(sf_dir: str):
    """Distributed uniform reservoir sample (k=100) of lineitem orderkeys —
    per-block Algorithm-R partials + weighted merges (uniformity across the
    merge tree is property-tested in tests/test_sketches.py). Rows-only check:
    sampling is seeded but block-layout-dependent; the invariants (size, all
    members real keys, n_seen = row count) are asserted here."""
    import pandas as pd

    from raysketch.pipeline.build import build_sketch
    from raysketch.sketches.reservoir import ReservoirSample

    ds = _read(sf_dir, "lineitem", ["l_orderkey"])
    rs = build_sketch(ds, "l_orderkey", lambda: ReservoirSample(100, seed=42))
    sample = sorted(rs.sample())
    assert len(sample) == 100 and rs.n_seen == ds.count()
    return pd.DataFrame({"l_orderkey": pd.array(sample, dtype="int64")})


def q_distinct_langs(sf_dir: str):
    """Distinct values of one column (``ds.unique`` — a shuffle op)."""
    import pandas as pd

    ds = _read(sf_dir, "documents", ["lang"])
    return pd.DataFrame({"lang": sorted(ds.unique("lang"))})


def q_extract_invariant(sf_dir: str):
    """The per-row invariant end-to-end (BASELINE.json input_hint): generate the
    seeded web corpus, run the distributed extractor, count byte mismatches
    against the stored text column. Must report 0 mismatches."""
    import pandas as pd
    import ray.data as rd

    from raysketch.io.corpus import gen_webpages
    from raysketch.pipeline.text import extract_text_array

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
    return pd.DataFrame(
        [{"rows": int(agg["sum(rows)"]), "mismatches": int(agg["sum(mismatches)"])}]
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


def q_top_orders(sf_dir: str):
    """Distributed sort + limit (top-k)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    out = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)
    return out.to_pandas()


def q_quantiles_by_lang(sf_dir: str):
    """Keyed t-digest: per-lang quantiles of document length (two-level build)."""
    import pandas as pd

    from raysketch.pipeline.build import build_keyed_sketch, sketch_table_to_dict
    from raysketch.sketches.tdigest import TDigest

    ds = _read(sf_dir, "documents", ["lang", "n_chars"])
    tbl = build_keyed_sketch(ds, "lang", "n_chars", lambda: TDigest(200))
    sk = sketch_table_to_dict(tbl, "lang")
    rows = []
    for lang, td in sorted(sk.items()):
        for q in (0.25, 0.5, 0.75):
            rows.append({"lang": lang, "q": q, "value": td.quantile(q)})
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
    epoch1 = docs.filter(expr=f"doc_id < {n // 2}")
    epoch2 = docs.filter(expr=f"doc_id >= {n // 2}")
    pb, _ = build_partitioned_bloom(epoch1, "text", capacity=max(n // 2, 1), num_shards=16)
    new_rows = bloom_anti_join(epoch2, pb, "text")
    seen_again = n - n // 2 - new_rows.count()
    return pd.DataFrame(
        [{"epoch1_rows": n // 2, "epoch2_rows": n - n // 2, "definitely_new": new_rows.count(), "possibly_seen": seen_again}]
    )


def _bloom_membership_setup(sf_dir: str, broadcast_limit: int = 5_000_000):
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
    pb, lineage = build_partitioned_bloom(li, "l_orderkey", capacity=max(n, 1), num_shards=32)
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])

    distinct = li.groupby("l_orderkey").aggregate(Count(alias_name="__n")).materialize()
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
    import pandas as pd

    return pd.DataFrame(
        [
            {
                "inserted": int(pb.count),
                "test_count": int(cm["test_count"]),
                "tp": int(cm["tp"]),
                "fp": int(cm["fp"]),
                "fn": int(cm["fn"]),
                "fp_rate": float(cm["fp_rate"]),
                "fn_rate": float(cm["fn_rate"]),
                "total_bits": int(pb.total_bits),
            }
        ]
    )


def q_bloom_membership(sf_dir: str):
    """Flagship: partitioned-Bloom build over lineitem orderkeys + broadcast probe
    stage + confusion matrix vs exact labels (reference protocol,
    simple_benchmark.cpp)."""
    from raysketch.pipeline.probe import confusion_matrix

    pb, probe_ds = _bloom_membership_setup(sf_dir)
    return _cm_frame(pb, confusion_matrix(probe_ds, pb, "l_orderkey"))


def q_bloom_membership_shuffle(sf_dir: str):
    """Same membership metrics via the SHARD-ROUTED probe (probe rows shuffled to
    the worker owning their sub-filter — gloom.h:216-230 contains-routing; the
    too-big-to-broadcast regime). Counts are bitwise-equal to q_bloom_membership."""
    from raysketch.pipeline.probe import confusion_matrix_shuffle

    pb, probe_ds = _bloom_membership_setup(sf_dir)
    return _cm_frame(pb, confusion_matrix_shuffle(probe_ds, pb, "l_orderkey"))


def q_bloom_semi_join(sf_dir: str):
    """Approximate semi-join of orders against the lineitem-orderkey Bloom filter."""
    from raysketch.pipeline.partitioned import build_partitioned_bloom
    from raysketch.pipeline.probe import bloom_semi_join

    li = _read(sf_dir, "lineitem", ["l_orderkey"])
    n = li.count()
    pb, _ = build_partitioned_bloom(li, "l_orderkey", capacity=max(n, 1), num_shards=32)
    orders = _read(sf_dir, "orders", ["o_orderkey"])
    return bloom_semi_join(orders, pb, "o_orderkey").to_pandas()


def q_hll_distinct(sf_dir: str):
    """HLL distinct counts for several columns in one pass each."""
    import pandas as pd

    from raysketch.pipeline.build import build_sketch
    from raysketch.sketches.hll import HyperLogLog

    rows = []
    for table, col in [("lineitem", "l_orderkey"), ("lineitem", "l_partkey"), ("orders", "o_custkey")]:
        ds = _read(sf_dir, table, [col])
        h = build_sketch(ds, col, lambda: HyperLogLog(14))
        rows.append({"table_col": f"{table}.{col}", "estimate": float(h.estimate())})
    return pd.DataFrame(rows)


def q_hll_by_lang(sf_dir: str):
    """Keyed (per-lang) HLL distinct texts — skew-safe two-level build."""
    import pandas as pd

    from raysketch.pipeline.build import build_keyed_sketch, sketch_table_to_dict
    from raysketch.sketches.hll import HyperLogLog

    ds = _read(sf_dir, "documents", ["lang", "text"])
    tbl = build_keyed_sketch(ds, "lang", "text", lambda: HyperLogLog(14))
    sk = sketch_table_to_dict(tbl, "lang")
    return pd.DataFrame(
        [{"lang": k, "estimate": float(v.estimate())} for k, v in sorted(sk.items())]
    )


def q_cms_event_types(sf_dir: str):
    """Count-min frequencies of event_type (width >> #keys → estimates exact)."""
    import pandas as pd

    from raysketch.pipeline.build import build_sketch
    from raysketch.sketches.cms import CountMinSketch

    ds = _read(sf_dir, "events", ["event_type"])
    cms = build_sketch(ds, "event_type", lambda: CountMinSketch(width=8192, depth=5))
    keys = sorted(ds.unique("event_type"))
    est = cms.query_column(pa.array(keys, pa.string()))
    return pd.DataFrame({"event_type": keys, "est": est.astype("int64")})


def q_quantiles_tdigest(sf_dir: str):
    import pandas as pd

    from raysketch.pipeline.build import build_sketch
    from raysketch.sketches.tdigest import TDigest

    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])
    td = build_sketch(ds, "l_extendedprice", lambda: TDigest(200))
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    return pd.DataFrame({"q": qs, "value": td.quantiles(qs)})


def q_theta_set_ops(sf_dir: str):
    """Theta-sketch set algebra: distinct orderkeys in orders (A) vs those
    referenced by lineitem (B) — union / intersection / difference estimates
    (the approximate intersect/except of SURVEY.md §2.4)."""
    import pandas as pd

    from raysketch.pipeline.build import build_sketch
    from raysketch.sketches.theta import ThetaSketch

    a = build_sketch(_read(sf_dir, "orders", ["o_orderkey"]), "o_orderkey", lambda: ThetaSketch(4096))
    b = build_sketch(_read(sf_dir, "lineitem", ["l_orderkey"]), "l_orderkey", lambda: ThetaSketch(4096))
    inter = a.intersect_estimate(b)
    diff = a.difference_estimate(b)
    union = ThetaSketch.from_bytes(a.to_bytes()).merge(b).estimate()
    return pd.DataFrame(
        [
            {"op": "union", "estimate": float(union)},
            {"op": "intersection", "estimate": float(inter)},
            {"op": "difference_a_minus_b", "estimate": float(diff)},
        ]
    )


def q_quantiles_ddsketch(sf_dir: str):
    """DDSketch quantiles (relative-error ≤ α guarantee, VLDB 2019)."""
    import pandas as pd

    from raysketch.pipeline.build import build_sketch
    from raysketch.sketches.ddsketch import DDSketch

    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])
    dd = build_sketch(ds, "l_extendedprice", lambda: DDSketch(alpha=0.01))
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    return pd.DataFrame({"q": qs, "value": dd.quantiles(qs)})


def q_quantiles_kll(sf_dir: str):
    import pandas as pd

    from raysketch.pipeline.build import build_sketch
    from raysketch.sketches.kll import KLL

    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])
    kll = build_sketch(ds, "l_extendedprice", lambda: KLL(200))
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    return pd.DataFrame({"q": qs, "value": kll.quantiles(qs)})


def q_minhash_dedup(sf_dir: str):
    from raysketch.pipeline.dedup import minhash_lsh_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return minhash_lsh_dedup(ds, threshold=0.8).to_pandas()


def q_simhash_dedup(sf_dir: str):
    from raysketch.pipeline.dedup import simhash_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return simhash_dedup(ds, max_hamming=3).to_pandas()


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


def q_ann_ivf(sf_dir: str):
    from raysketch.pipeline.ann import ann_ivf_topk

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    q0 = ds.filter(expr="vec_id == 0").take(1)[0]["embedding"]
    return ann_ivf_topk(ds, np.asarray([q0], dtype=np.float32), k=10, nlist=8, nprobe=4).to_pandas()


def q_lang_id(sf_dir: str):
    """Heuristic lang-id stage (actor pool) — emits predictions per doc."""
    from raysketch.pipeline.text import LangIdStage

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(
        LangIdStage, batch_format="pyarrow", concurrency=(1, 4), zero_copy_batch=True
    )
    return out.select_columns(["doc_id", "lang_pred"]).to_pandas()


def q_fingerprints(sf_dir: str):
    """Per-doc 64-bit content fingerprints (vectorized xxh64)."""
    from raysketch.pipeline.text import fingerprint_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(
        lambda b: fingerprint_batch(b, "text").select(["doc_id", "fingerprint"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    df = out.to_pandas()
    df["fingerprint"] = df["fingerprint"].astype("uint64").astype("int64")
    return df


def q_media_features(sf_dir: str):
    """Multimodal plumbing: deterministic fake decode → fixed-dim features."""
    import ray.data as rd

    from raysketch.pipeline.multimodal import gen_media_table, media_features

    ds = rd.from_arrow(gen_media_table(256))
    out = media_features(ds, feat_dim=8).select_columns(["media_id", "media_type", "width"])
    return out.to_pandas()


def q_media_frames(sf_dir: str):
    """Frame-sampling plumbing: deterministic fake video frames, one row per
    sampled frame (decode stubbed — the Ray-side fan-out/schema is real)."""
    import ray.data as rd

    from raysketch.pipeline.multimodal import gen_media_table, sample_frames

    ds = rd.from_arrow(gen_media_table(256))
    out = sample_frames(ds, every_ms=1000).select_columns(["media_id", "frame_idx"])
    return out.to_pandas()


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

    d = gen_webpages("/tmp/raysketch_webcorpus_10k", rows=10000, num_files=4)
    ds = rd.read_parquet(d, columns=["url", "html", "lang"])
    ds = ds.map_batches(extract_text_batch, batch_format="pyarrow", zero_copy_batch=True)
    tbl = build_keyed_sketch(ds, "lang", "url", lambda: HyperLogLog(14))
    sk = sketch_table_to_dict(tbl, "lang")
    return pd.DataFrame(
        [{"lang": k, "est_urls": float(v.estimate())} for k, v in sorted(sk.items())]
    )


# ---------------------------------------------------------------------------
# contract
# ---------------------------------------------------------------------------


def entry() -> Any:
    """Flagship pipeline on sf0.001: Bloom membership metrics over lineitem keys."""
    return q_bloom_membership("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # exact (oracle-checked)
        "dedup_exact": q_dedup_exact,
        "lang_counts": q_lang_counts,
        "source_counts": q_source_counts,
        "token_stats": q_token_stats,
        "quality_stats": q_quality_stats,
        "window_events": q_window_events,
        "sliding_windows": q_sliding_windows,
        "window_distinct": q_window_distinct,
        "asof_join": q_asof_join,
        "range_join": q_range_join,
        "sessionize": q_sessionize,
        "semi_join": q_semi_join,
        "anti_join": q_anti_join,
        "lineitem_agg": q_lineitem_agg,
        "ann_topk": q_ann_topk,
        "top_orders": q_top_orders,
        "top_per_group": q_top_per_group,
        "distinct_langs": q_distinct_langs,
        "token_counts_global": q_token_counts_global,
        "heavy_hitters": q_heavy_hitters,
        "reservoir_sample": q_reservoir_sample,
        # sketch / approximate (rows-only)
        "bloom_membership": q_bloom_membership,
        "bloom_membership_shuffle": q_bloom_membership_shuffle,
        "bloom_semi_join": q_bloom_semi_join,
        "hll_distinct": q_hll_distinct,
        "hll_by_lang": q_hll_by_lang,
        "cms_event_types": q_cms_event_types,
        "quantiles_tdigest": q_quantiles_tdigest,
        "quantiles_kll": q_quantiles_kll,
        "quantiles_ddsketch": q_quantiles_ddsketch,
        "theta_set_ops": q_theta_set_ops,
        "minhash_dedup": q_minhash_dedup,
        "simhash_dedup": q_simhash_dedup,
        "embedding_dedup": q_embedding_dedup,
        "ann_ivf": q_ann_ivf,
        "lang_id": q_lang_id,
        "fingerprints": q_fingerprints,
        "media_features": q_media_features,
        "media_frames": q_media_frames,
        "webpipeline": q_webpipeline,
        "quantiles_by_lang": q_quantiles_by_lang,
        "dedup_incremental": q_dedup_incremental,
        "extract_invariant": q_extract_invariant,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "dedup_exact": (
            "SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text"
        ),
        "lang_counts": "SELECT lang, count(*)::BIGINT AS n_docs FROM documents GROUP BY lang",
        "source_counts": "SELECT source, count(*)::BIGINT AS n_docs FROM documents GROUP BY source",
        "token_stats": (
            "SELECT doc_id, len(regexp_extract_all(text, '\\S+'))::BIGINT AS n_tokens FROM documents"
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
        "sliding_windows": (
            "SELECT event_type, window_start, count(*)::BIGINT AS n_events FROM ("
            "  SELECT event_type, (floor(epoch(ts))::BIGINT // 3600) * 3600 AS window_start FROM events"
            "  UNION ALL"
            "  SELECT event_type, (floor(epoch(ts))::BIGINT // 3600) * 3600 - 3600 AS window_start FROM events"
            ") GROUP BY event_type, window_start"
        ),
        "window_distinct": (
            "SELECT (floor(epoch(ts))::BIGINT // 86400) * 86400 AS window_start, "
            "count(DISTINCT user_id)::BIGINT AS n_users FROM events GROUP BY window_start"
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
        "semi_join": (
            "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem "
            "WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 200000)"
        ),
        "anti_join": (
            "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem "
            "WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 200000)"
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
        # CMS width (8192) >> key cardinality (5 event types) → the 5 keys land in
        # distinct cells in every row (verified; deterministic in our fixed hashes),
        # so the min-estimate equals the exact count.
        "cms_event_types": (
            "SELECT event_type, count(*)::BIGINT AS est FROM events GROUP BY event_type"
        ),
        "top_orders": (
            "SELECT o_orderkey, o_totalprice FROM orders "
            "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"
        ),
        "top_per_group": (
            "SELECT o_custkey, o_orderkey, o_totalprice FROM orders "
            "QUALIFY row_number() OVER (PARTITION BY o_custkey "
            "ORDER BY o_totalprice DESC, o_orderkey) <= 3"
        ),
        "distinct_langs": "SELECT DISTINCT lang FROM documents",
        "token_counts_global": (
            "SELECT token, count(*)::BIGINT AS n FROM "
            "(SELECT unnest(regexp_extract_all(text, '\\S+')) AS token FROM documents) "
            "GROUP BY token"
        ),
        # MG k (4096) >> vocabulary (31 tokens) → no pruning ever happens → the
        # summary's counts are exact and the top-20 matches the true top-20
        "heavy_hitters": (
            "SELECT token, count(*)::BIGINT AS est FROM "
            "(SELECT unnest(regexp_extract_all(text, '\\S+')) AS token FROM documents) "
            "GROUP BY token ORDER BY est DESC, token LIMIT 20"
        ),
    }
