"""Tests for the range-sort keyed-reduction exchange."""

import numpy as np
import pandas as pd
import pytest


class TestSortedKeyedReduce:
    def test_matches_pandas_groupby(self, ray_session):
        import ray

        from raysketch.pipeline.exchange import sorted_keyed_reduce

        rng = np.random.default_rng(2)
        n = 50_000
        df = pd.DataFrame(
            {
                "k": rng.integers(0, 30_000, n),  # mix of singletons and dups
                "s": rng.integers(0, 100, n),
                "m": rng.integers(0, 1000, n),
            }
        )
        ds = ray.data.from_pandas(df).repartition(8)
        got = (
            sorted_keyed_reduce(ds, "k", {"s": "sum", "m": "max"})
            .to_pandas()
            .sort_values("k", ignore_index=True)
        )
        want = (
            df.groupby("k", as_index=False)
            .agg({"s": "sum", "m": "max"})
            .sort_values("k", ignore_index=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_single_key_spanning_all_blocks(self, ray_session):
        import ray

        from raysketch.pipeline.exchange import sorted_keyed_reduce

        df = pd.DataFrame({"k": np.zeros(10_000, np.int64), "s": np.ones(10_000, np.int64)})
        ds = ray.data.from_pandas(df).repartition(6)
        got = sorted_keyed_reduce(ds, "k", {"s": "sum"}).to_pandas()
        assert len(got) == 1
        assert int(got["s"].iloc[0]) == 10_000

    def test_min_reduction(self, ray_session):
        import ray

        from raysketch.pipeline.exchange import sorted_keyed_reduce

        df = pd.DataFrame({"k": [1, 1, 2, 2, 3], "v": [5, 3, 9, 7, 1]})
        ds = ray.data.from_pandas(df).repartition(3)
        got = (
            sorted_keyed_reduce(ds, "k", {"v": "min"})
            .to_pandas()
            .sort_values("k", ignore_index=True)
        )
        assert list(got["v"]) == [3, 7, 1]


def test_df_counts_dominant_key_all_blocks(ray_session):
    """A key holding 90% of all rows spans EVERY sorted block — its partials
    must be re-summed exactly once through the edge fixup, with min_count
    applied after the global sum."""
    import ray
    import pyarrow as pa

    from raysketch.pipeline.decontam import _df_counts

    n = 40_000
    h = np.where(np.arange(n) % 10 != 0, 7, np.arange(n) + 1000)  # 90% key=7
    df = pd.DataFrame({"h": h.astype(np.int64), "c": np.ones(n, np.int64)})
    ds = ray.data.from_pandas(df).repartition(8)
    out = _df_counts(ds, out_col="n", min_count=2).to_pandas()
    want = df.groupby("h")["c"].sum()
    want = want[want >= 2]
    got = out.set_index("h")["n"]
    assert dict(got) == dict(want)
    assert int(got[7]) == int((h == 7).sum())


@pytest.mark.parametrize(
    "blocks,nkeys",
    [(1, 1), (2, 2), (7, 3), (8, 50_000), (5, 1), (16, 97)],
)
def test_sorted_reduce_shape_grid(ray_session, blocks, nkeys):
    """Boundary-shape grid: single block, keys ≈ blocks (every key is an edge
    key somewhere), singleton-heavy, and hot-key universes."""
    import ray

    from raysketch.pipeline.exchange import sorted_keyed_reduce

    rng = np.random.default_rng(blocks * 1000 + nkeys)
    n = 5000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, nkeys, n),
            "s": rng.integers(-50, 50, n),
            "m": rng.integers(0, 10**6, n),
        }
    )
    ds = ray.data.from_pandas(df).repartition(blocks)
    got = (
        sorted_keyed_reduce(ds, "k", {"s": "sum", "m": "min"})
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    want = (
        df.groupby("k", as_index=False)
        .agg({"s": "sum", "m": "min"})
        .sort_values("k", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize(
    "blocks,nkeys",
    [(1, 1), (2, 2), (7, 3), (8, 50_000), (5, 1), (16, 97)],
)
def test_sorted_first_per_key_shape_grid(ray_session, blocks, nkeys):
    """Same boundary-shape grid as the reduce: single block, keys ≈ blocks,
    singleton-heavy, hot keys — the representative must match pandas
    drop_duplicates on key-dependent payloads in every shape."""
    import ray

    from raysketch.pipeline.exchange import sorted_first_per_key

    rng = np.random.default_rng(blocks * 77 + nkeys)
    n = 5000
    k = rng.integers(0, nkeys, n).astype(np.int64)
    df = pd.DataFrame({"k": k, "s": ["v" + str(v) for v in k], "w": k * 7})
    ds = ray.data.from_pandas(df).repartition(blocks)
    got = (
        sorted_first_per_key(ds, "k", ["s", "w"])
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    want = df.drop_duplicates("k").sort_values("k", ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("strategy", ["sort", "repartition"])
def test_distinct_rows_strategies_identical(ray_session, strategy):
    """Both DISTINCT exchanges (r5 sort default vs keyed repartition) produce
    the identical row set, incl. multi-column string keys and values that
    straddle sorted-block boundaries."""
    import ray

    from raysketch.pipeline.relational import distinct_rows

    rng = np.random.default_rng(13)
    n = 20_000
    df = pd.DataFrame(
        {
            "a": rng.integers(0, 300, n),
            "b": np.array(["x", "y", "z"])[rng.integers(0, 3, n)],
        }
    )
    ds = ray.data.from_pandas(df).repartition(7)
    got = (
        distinct_rows(ds, ["a", "b"], strategy=strategy)
        .to_pandas()
        .sort_values(["a", "b"], ignore_index=True)
    )
    want = df.drop_duplicates().sort_values(["a", "b"], ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestDistinctNullsAndExtremes:
    """r5 null-safety fix: the adjacency mask must not round-trip int64
    through float64 (null-bearing int columns did, so NaN broke equality and
    distinct values past 2^53 could collide)."""

    def test_distinct_null_int_keys(self, ray_session):
        import ray
        import pyarrow as pa

        from raysketch.pipeline.relational import distinct_rows

        big = 2**53  # adjacent int64 values that collide in float64
        t = pa.table(
            {
                "k": pa.array(
                    [None, None, None, 1, 1, big, big + 1, -5, -5, None],
                    pa.int64(),
                )
            }
        )
        ds = ray.data.from_arrow(t).repartition(3)
        # compare at the Arrow level: to_pandas() would itself float64-convert
        # the null-bearing int64 column and collide big/big+1 in the TEST
        out = pa.concat_tables(
            distinct_rows(ds, ["k"], strategy="sort").iter_batches(
                batch_format="pyarrow", batch_size=None
            )
        ).column("k")
        vals = sorted(v for v in out.to_pylist() if v is not None)
        assert vals == [-5, 1, big, big + 1]
        assert out.null_count == 1  # SQL DISTINCT: one null row

    @pytest.mark.parametrize("strategy", ["sort", "repartition"])
    def test_distinct_null_string_multicol(self, ray_session, strategy):
        import ray
        import pyarrow as pa

        from raysketch.pipeline.relational import distinct_rows

        t = pa.table(
            {
                "a": pa.array(["x", "x", None, None, "y", "x"]),
                "b": pa.array([None, None, 7, 7, 1, 2], pa.int64()),
            }
        )
        ds = ray.data.from_arrow(t).repartition(2)
        got = (
            distinct_rows(ds, ["a", "b"], strategy=strategy)
            .to_pandas()
            .sort_values(["a", "b"], ignore_index=True)
        )
        assert len(got) == 4  # (x,null) (null,7) (y,1) (x,2)

    def test_first_per_key_null_keys(self, ray_session):
        import ray
        import pyarrow as pa

        from raysketch.pipeline.exchange import sorted_first_per_key

        t = pa.table(
            {
                "k": pa.array([None, 3, None, 3, 9], pa.int64()),
                "v": pa.array(["n", "a", "n", "a", "z"]),
            }
        )
        ds = ray.data.from_arrow(t).repartition(2)
        got = sorted_first_per_key(ds, "k", ["v"]).to_pandas()
        assert len(got) == 3
        assert sorted(got["v"].tolist()) == ["a", "n", "z"]

    def test_keyed_reduce_rejects_nulls(self, ray_session):
        import ray
        import pyarrow as pa

        from raysketch.pipeline.exchange import sorted_keyed_reduce

        t = pa.table(
            {
                "k": pa.array([1, None, 2], pa.int64()),
                "v": pa.array([1, 1, 1], pa.int64()),
            }
        )
        ds = ray.data.from_arrow(t)
        with pytest.raises(Exception, match="nulls"):
            sorted_keyed_reduce(ds, "k", {"v": "sum"}).materialize()

    def test_distinct_matches_duckdb_hypothesis(self, ray_session):
        """Property: distinct_rows(strategy='sort') == DuckDB SELECT DISTINCT
        on random typed tables (negative/huge ints, nulls, strings, blocks)."""
        import duckdb
        import ray
        import pyarrow as pa
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        ints = st.one_of(
            st.none(),
            st.integers(min_value=-(2**62), max_value=2**62),
            st.sampled_from([0, 1, -1, 2**53, 2**53 + 1, -(2**53)]),
        )
        strs = st.one_of(st.none(), st.sampled_from(["", "a", "b", "aa", "é"]))

        @settings(
            max_examples=12,
            deadline=None,
            suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
        )
        @given(
            rows=st.lists(st.tuples(ints, strs), min_size=1, max_size=60),
            blocks=st.integers(min_value=1, max_value=4),
        )
        def check(rows, blocks):
            from raysketch.pipeline.relational import distinct_rows

            t = pa.table(
                {
                    "k": pa.array([r[0] for r in rows], pa.int64()),
                    "s": pa.array([r[1] for r in rows], pa.string()),
                }
            )
            ds = ray.data.from_arrow(t).repartition(blocks)
            # Arrow-level compare: pandas float64-converts null-bearing int64
            got = pa.concat_tables(
                distinct_rows(ds, ["k", "s"], strategy="sort").iter_batches(
                    batch_format="pyarrow", batch_size=None
                )
            )
            want = duckdb.sql("SELECT DISTINCT k, s FROM t").arrow()
            key = lambda tb: sorted(
                zip(tb.column("k").to_pylist(), tb.column("s").to_pylist()),
                key=lambda p: (p[0] is None, p[0] or 0, p[1] is None, p[1] or ""),
            )
            assert key(got) == key(want)

        check()


def test_keyed_reduce_matches_duckdb_hypothesis(ray_session):
    """Property: sorted_keyed_reduce == DuckDB GROUP BY sum/min/max on random
    int64 tables (hot keys, negatives, extremes, 1-4 blocks)."""
    import duckdb
    import ray
    import pyarrow as pa
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from raysketch.pipeline.exchange import sorted_keyed_reduce

    keys = st.integers(min_value=-3, max_value=3)  # hot: every key straddles blocks
    vals = st.one_of(
        st.integers(min_value=-(2**40), max_value=2**40),
        st.sampled_from([0, 1, -1, 2**53 + 1, -(2**53) - 1]),
    )

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
    )
    @given(
        rows=st.lists(st.tuples(keys, vals, vals), min_size=1, max_size=80),
        blocks=st.integers(min_value=1, max_value=4),
    )
    def check(rows, blocks):
        t = pa.table(
            {
                "k": pa.array([r[0] for r in rows], pa.int64()),
                "x": pa.array([r[1] for r in rows], pa.int64()),
                "y": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
        ds = ray.data.from_arrow(t).repartition(blocks)
        got = (
            sorted_keyed_reduce(ds, "k", {"x": "sum", "y": "min"})
            .to_pandas()
            .sort_values("k", ignore_index=True)
        )
        want = duckdb.sql(
            "SELECT k, sum(x)::BIGINT AS x, min(y) AS y FROM t GROUP BY k ORDER BY k"
        ).fetchdf()
        assert got["k"].tolist() == want["k"].tolist()
        assert got["x"].tolist() == want["x"].tolist()
        assert got["y"].tolist() == want["y"].tolist()

    check()
