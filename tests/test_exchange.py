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
