"""Null-id contract: id columns must be non-null, enforced loudly.

The r5 audit found that a null int64 id silently float64-converts under
``np.asarray`` inside the first batch kernel, drifting the band-row schema and
dropping docs from clusters (minhash returned 4 of 5 docs), while
pack_sequences died with a cryptic numpy error deep in a Ray task. Every
id-consuming pipeline now raises the contracts.require_non_null_ids error at
first touch instead. Null *text*/*html* stays tolerated (the pinned null ≡ ""
convention — test_robustness_r5).
"""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data as rd


def _docs_with_null_id():
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, None, 4, 5], pa.int64()),
                "text": pa.array(["aa bb cc dd ee ff gg hh"] * 5),
            }
        )
    )


def _expect_contract_error(fn, op):
    with pytest.raises(Exception, match=f"{op}: id column 'doc_id' contains nulls"):
        fn()


def test_exact_dedup_null_id(ray_session):
    from raysketch.pipeline.dedup import exact_dedup

    _expect_contract_error(lambda: exact_dedup(_docs_with_null_id()).count(), "exact_dedup")


def test_minhash_null_id(ray_session):
    from raysketch.pipeline.dedup import minhash_lsh_dedup

    _expect_contract_error(
        lambda: minhash_lsh_dedup(_docs_with_null_id()).num_rows, "minhash_lsh_dedup"
    )


def test_jaccard_null_id(ray_session):
    from raysketch.pipeline.dedup import jaccard_ngram_dedup

    _expect_contract_error(
        lambda: jaccard_ngram_dedup(_docs_with_null_id()).num_rows, "jaccard_ngram_dedup"
    )


def test_simhash_null_id(ray_session):
    from raysketch.pipeline.dedup import simhash_dedup

    _expect_contract_error(
        lambda: simhash_dedup(_docs_with_null_id()).num_rows, "simhash_dedup"
    )


def test_embedding_dedup_null_id(ray_session):
    import numpy as np

    from raysketch.pipeline.dedup import embedding_cosine_dedup

    emb = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, None, 3], pa.int64()),
                "embedding": pa.array(
                    [np.ones(8, np.float64) for _ in range(3)],
                    pa.list_(pa.float64()),
                ),
            }
        )
    )
    _expect_contract_error(
        lambda: embedding_cosine_dedup(emb, id_col="doc_id").num_rows,
        "embedding_cosine_dedup",
    )


def test_line_dedup_null_id_both_regimes(ray_session):
    # the guard fires at first id CONSUMPTION. line_dedup's broadcast regime
    # never consumes ids (hot-line drop is an in-batch hash probe over text),
    # so null ids flow through CORRECTLY there; the join regime explodes
    # (id, line_no) rows, so it raises the contract error.
    from raysketch.pipeline.decontam import line_dedup

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, None, 4, 5], pa.int64()),
                "text": pa.array([f"unique line {i}\nhot shared line" for i in range(5)]),
            }
        )
    )
    out = pa.concat_tables(
        b
        for b in line_dedup(docs, id_col="doc_id", min_docs=2).iter_batches(
            batch_format="pyarrow"
        )
    )
    # broadcast regime: hot line stripped from every doc, null id preserved
    assert out.column("doc_id").null_count == 1
    assert all(v == 1 for v in out.column("n_removed").to_pylist())
    _expect_contract_error(
        lambda: line_dedup(docs, id_col="doc_id", min_docs=2, hot_switch=0).count(),
        "line_dedup",
    )


def test_pack_sequences_null_id(ray_session):
    from raysketch.pipeline.export import pack_sequences

    toks = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, None, 3], pa.int64()),
                "n_tokens": pa.array([5, 5, 5], pa.int64()),
            }
        )
    )
    _expect_contract_error(
        lambda: pack_sequences(toks, id_col="doc_id", token_col="n_tokens", budget=8).count(),
        "pack_sequences",
    )


def test_non_null_ids_unaffected(ray_session):
    # the guard is metadata-only; clean inputs flow exactly as before
    from raysketch.pipeline.dedup import exact_dedup

    clean = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "text": pa.array(["aa bb cc dd ee ff gg hh"] * 5),
            }
        )
    )
    assert exact_dedup(clean).count() == 1


def test_decontaminate_null_id_tolerant(ray_session):
    # decontaminate is a pure row-selection — null ids must survive with the
    # id column's exact Arrow type (the np.asarray path drifted it to double)
    from raysketch.pipeline.decontam import decontaminate

    docs = _docs_with_null_id()
    bench = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([100], pa.int64()),
                "text": pa.array(["aa bb cc dd ee ff gg hh"]),
            }
        )
    )
    out = pa.concat_tables(
        b
        for b in decontaminate(
            docs, bench, text_col="text", id_col="doc_id", n=4, min_overlap=1
        ).iter_batches(batch_format="pyarrow")
    )
    assert out.schema.field("doc_id").type == pa.int64()
    assert out.column("doc_id").null_count == 1
    assert out.num_rows == 5


def test_dup_span_stats_null_id_both_regimes(ray_session):
    from raysketch.pipeline.decontam import dup_span_stats

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, None, 3], pa.int64()),
                "text": pa.array(["the same twenty-char span repeats here"] * 3),
            }
        )
    )
    # broadcast regime: row-selection, null id survives type-exact
    out = pa.concat_tables(
        b
        for b in dup_span_stats(docs, id_col="doc_id").iter_batches(
            batch_format="pyarrow"
        )
    )
    assert out.schema.field("doc_id").type == pa.int64()
    assert out.column("doc_id").null_count == 1
    # join regime groups by id -> contract error
    _expect_contract_error(
        lambda: dup_span_stats(docs, id_col="doc_id", dup_switch=0).count(),
        "dup_span_stats",
    )


def test_write_corpus_shards_null_key(ray_session, tmp_path):
    # "mod" routing of a null key is platform-defined (NaN -> int64 cast) and
    # would break resume determinism -> contract error; "hash" routes nulls
    # deterministically (hash_column hashes null as "") and must succeed.
    import pyarrow.parquet as pq

    from raysketch.io.shards import write_corpus_shards

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, None, 4], pa.int64()),
                "text": pa.array(["x"] * 4),
            }
        )
    )
    with pytest.raises(Exception, match="write_corpus_shards\\[mod\\]: key column"):
        write_corpus_shards(docs, str(tmp_path / "mod"), key_col="doc_id", num_shards=4)
    out = tmp_path / "hashed"
    write_corpus_shards(
        docs, str(out), key_col="doc_id", num_shards=4, shard_fn="hash"
    )
    rows = sum(pq.read_table(str(f)).num_rows for f in out.glob("part-*.parquet"))
    assert rows == 4


def test_window_ops_null_ts_clear_error(ray_session):
    # windows/joins cannot order null timestamps or keys — the old failure was
    # a cryptic numpy cast error deep in a Ray task; now a contract error
    from raysketch.pipeline.events import sessionize, tumbling_window_agg

    ev = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 1, None, 2], pa.int64()),
                "ts": pa.array([1_000_000, 2_000_000, None, 4_000_000], pa.timestamp("us")),
                "value": pa.array([1.0, 2.0, 3.0, 4.0]),
                "event_type": pa.array(["a", "a", None, "b"]),
            }
        )
    )
    with pytest.raises(Exception, match="tumbling_window_agg: column 'ts' contains nulls"):
        tumbling_window_agg(ev, window_s=3600).count()
    with pytest.raises(Exception, match="sessionize: column 'ts' contains nulls"):
        sessionize(ev, ts_col="ts", key_col="user_id", gap_s=60).count()


def test_top_k_per_group_null_group_tolerant(ray_session):
    # null keys form their own group (SQL PARTITION BY semantics) and the id
    # type survives — pinned so the Arrow-native path never regresses to numpy
    from raysketch.pipeline.relational import top_k_per_group

    ev = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 1, None, 2], pa.int64()),
                "value": pa.array([1.0, 2.0, 3.0, 4.0]),
            }
        )
    )
    out = pa.concat_tables(
        b
        for b in top_k_per_group(ev, "user_id", "value", 1).iter_batches(
            batch_format="pyarrow"
        )
    )
    assert out.schema.field("user_id").type == pa.int64()
    got = {(None if u is None else u): v for u, v in zip(out.column("user_id").to_pylist(), out.column("value").to_pylist())}
    assert got == {1: 2.0, 2: 4.0, None: 3.0}


def test_embedding_matrix_null_cell_clear_error():
    # a null list cell is a zero-length span; the old error blamed
    # "fixed-length" — now the message names the null
    import numpy as np

    from raysketch.pipeline.dedup import embedding_matrix

    col = pa.array([[1.0] * 4, None, [2.0] * 4], pa.list_(pa.float64()))
    with pytest.raises(ValueError, match="contains null cells"):
        embedding_matrix(col)
    clean = pa.array([[1.0] * 4, [2.0] * 4], pa.list_(pa.float64()))
    m = embedding_matrix(clean)
    assert m.shape == (2, 4) and m[1, 0] == 2.0


def test_chunk_text_null_id_tolerant():
    # chunk_text is a pure fan-out — null ids survive with the exact Arrow
    # type (the numpy gather drifted the column to double/NaN)
    from raysketch.pipeline.text import chunk_text_batch

    t = pa.table(
        {
            "doc_id": pa.array([1, None], pa.int64()),
            "text": pa.array(["abcdefgh", "ijklmnop"]),
        }
    )
    out = chunk_text_batch(t, chunk_size=4, stride=4)
    assert out.schema.field("doc_id").type == pa.int64()
    assert out.column("doc_id").to_pylist() == [1, 1, None, None]


def test_chunk_text_rejects_sub_codepoint_chunk_size():
    # chunk_size < 4 can snap both boundaries into one codepoint and silently
    # lose the document bytes
    from raysketch.pipeline.text import chunk_text_batch

    t = pa.table({"doc_id": pa.array([1], pa.int64()), "text": pa.array(["😀😀"])})
    with pytest.raises(ValueError, match="chunk_size must be >= 4"):
        chunk_text_batch(t, chunk_size=2, stride=4)


def test_stratified_sample_null_id_contract(ray_session):
    from raysketch.pipeline.export import stratified_sample

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, None, 3, 4], pa.int64()),
                "lang": pa.array(["en"] * 4),
            }
        )
    )
    with pytest.raises(Exception, match="stratified_sample: id column 'doc_id' contains nulls"):
        stratified_sample(
            docs, key_col="lang", id_col="doc_id", quotas={"en": 2}
        ).count()


def test_rare_token_stats_null_id_both_regimes(ray_session):
    from raysketch.pipeline.text import rare_token_stats

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, None, 4, 5], pa.int64()),
                "text": pa.array(["aa bb cc dd ee ff gg hh"] * 5),
            }
        )
    )
    # broadcast regime never consumes ids — null survives type-exact
    out = pa.concat_tables(
        b
        for b in rare_token_stats(docs, id_col="doc_id").iter_batches(
            batch_format="pyarrow"
        )
    )
    assert out.schema.field("doc_id").type == pa.int64()
    assert out.column("doc_id").null_count == 1
    # join regime groups by id -> contract error (min_df=2 makes every token
    # common so the common set is non-empty and exceeds common_switch=0)
    with pytest.raises(Exception, match="rare_token_stats: id column"):
        rare_token_stats(docs, id_col="doc_id", min_df=2, common_switch=0).count()


def test_window_null_value_clear_error(ray_session):
    # a null value rides NaN through the float64 cast: sums/min/max go NaN
    # where SQL SKIPS nulls — contract error instead of silent divergence
    from raysketch.pipeline.events import tumbling_window_agg

    ev = rd.from_arrow(
        pa.table(
            {
                "ts": pa.array([1_000_000, 2_000_000], pa.timestamp("us")),
                "event_type": pa.array(["a", "a"]),
                "value": pa.array([1.0, None]),
            }
        )
    )
    with pytest.raises(Exception, match="tumbling_window_agg: column 'value' contains nulls"):
        tumbling_window_agg(ev, window_s=3600).count()
