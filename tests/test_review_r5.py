"""Round-5 review fixes: NaN-key distinct under the sort exchange, the
stratified-sample count fallback past the driver bound, sign-correct /
type-checked hash ranking, and the consistent-large chunk/blob types."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest


def test_distinct_rows_nan_keys_both_strategies(ray_session):
    """Float NaN keys dedup to ONE row under strategy='sort' (the adjacency
    mask treats NaN == NaN, matching the Arrow hash aggregate the
    'repartition' strategy uses) — pre-fix, one NaN row per pre-sort block
    survived."""
    import ray

    from raysketch.pipeline.relational import distinct_rows

    vals = np.array([1.0, np.nan, 2.0, np.nan, 1.0, np.nan, 2.0, np.nan], dtype=np.float64)
    # several input blocks so NaNs arrive from more than one block
    ds = ray.data.from_arrow(pa.table({"x": pa.array(vals)})).repartition(4)
    for strategy in ("sort", "repartition"):
        out = distinct_rows(ds, ["x"], strategy=strategy).to_pandas()["x"].to_numpy()
        finite = sorted(v for v in out if not np.isnan(v))
        assert finite == [1.0, 2.0], strategy
        assert int(np.isnan(out).sum()) == 1, strategy


def test_distinct_float_nan_null_matches_duckdb(ray_session):
    """Property: distinct_rows(strategy='sort') == DuckDB SELECT DISTINCT on
    float keys mixing NaN, NULL, ±inf and finite values across blocks. Nulls
    ride numpy's NaN path through the range partitioner while the per-block
    Arrow sort separates them — this pins down that null-vs-NaN interleaving
    never splits a key's run."""
    import ray
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from raysketch.pipeline.relational import distinct_rows

    pool = st.sampled_from(
        [None, float("nan"), 0.0, 1.5, -2.25, float("inf"), float("-inf"), 3.0]
    )

    def norm(vals):
        out = []
        for v in vals:
            if v is None:
                out.append("null")
            elif isinstance(v, float) and np.isnan(v):
                out.append("nan")
            else:
                out.append(repr(float(v)))
        return sorted(out)

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
    )
    @given(
        rows=st.lists(pool, min_size=1, max_size=50),
        blocks=st.integers(min_value=1, max_value=4),
    )
    def check(rows, blocks):
        t = pa.table({"x": pa.array(rows, pa.float64())})
        ds = ray.data.from_arrow(t).repartition(blocks)
        got = pa.concat_tables(
            distinct_rows(ds, ["x"], strategy="sort").iter_batches(
                batch_format="pyarrow", batch_size=None
            )
        )
        want = duckdb.sql("SELECT DISTINCT x FROM t").arrow()
        assert norm(got.column("x").to_pylist()) == norm(want.column("x").to_pylist())

    check()


def test_key_counts_fallback_matches_fast_path(ray_session, monkeypatch):
    """Past _KEY_COUNT_DRIVER_BOUND partial rows, _key_counts abandons the
    driver-side bincount for the distributed groupby count — same (keys,
    counts), driver traffic O(keys) instead of O(keys x blocks)."""
    import ray

    from raysketch.pipeline import export

    ids = np.arange(400, dtype=np.int64)
    langs = np.array(["en", "de", "fr", "pt"], dtype=object)[ids % 4]
    docs = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids), "lang": pa.array(langs)})
    ).repartition(5)

    fast = export._key_counts(docs.select_columns(["doc_id", "lang"]), "lang")
    monkeypatch.setattr(export, "_KEY_COUNT_DRIVER_BOUND", 1)
    slow = export._key_counts(docs.select_columns(["doc_id", "lang"]), "lang")
    np.testing.assert_array_equal(fast[0], slow[0])
    np.testing.assert_array_equal(fast[1], slow[1])

    # and the public API returns the same sample through the fallback
    out = (
        export.stratified_sample(docs, key_col="lang", n_target=40)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    monkeypatch.undo()
    ref = (
        export.stratified_sample(docs, key_col="lang", n_target=40)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert out.equals(ref)


def test_rank_hash_rejects_non_integer_ids():
    from raysketch.pipeline.export import _rank_keys

    with pytest.raises(TypeError, match="integer ids"):
        _rank_keys(np.array(["a", "b"], dtype=object), "hash")


def test_rank_hash_negative_ids_match_duckdb():
    """The documented DuckDB expression (with the +2^64 re-mod — DuckDB's %
    follows the dividend's sign) equals numpy's uint64 wrap for NEGATIVE ids
    too, not just the testdata's non-negative ones."""
    from raysketch.pipeline.export import _rank_keys

    ids = np.array([-(2**62) - 3, -17, -1, 0, 1, 42, 2**62 + 5], dtype=np.int64)
    got = _rank_keys(ids, "hash")
    sql = (
        "SELECT id, ((id::HUGEINT * 11400714819323198485) % 18446744073709551616 "
        "+ 18446744073709551616) % 18446744073709551616 AS r FROM ids"
    )
    con = duckdb.connect()
    con.register("ids", pa.table({"id": pa.array(ids)}))
    want = {int(i): int(r) for i, r in con.execute(sql).fetchall()}
    assert {int(i): int(v) for i, v in zip(ids, got)} == want


def test_chunk_text_type_is_chosen_up_front(monkeypatch):
    """large=True emits large_utf8 for EVERY batch (empty included); the
    default utf8 path raises past the int32 offset limit instead of silently
    promoting one batch to a conflicting type."""
    from raysketch.pipeline import text as text_mod
    from raysketch.pipeline.text import chunk_text_batch

    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()), "text": ["abcdefgh", ""]})
    out = chunk_text_batch(t, chunk_size=4, stride=3, large=True)
    assert out.schema.field("chunk_text").type == pa.large_utf8()
    empty = pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    out_e = chunk_text_batch(empty, large=True)
    assert out_e.schema.field("chunk_text").type == pa.large_utf8()
    # empty branch keeps the caller's id type (string ids are supported)
    s_empty = pa.table({"doc_id": pa.array([], pa.string()), "text": pa.array([], pa.string())})
    assert chunk_text_batch(s_empty).schema.field("doc_id").type == pa.string()

    monkeypatch.setattr(text_mod, "_UTF8_OFFSET_LIMIT", 4)
    with pytest.raises(ValueError, match="large=True"):
        chunk_text_batch(t, chunk_size=4, stride=3)
