"""Tests for the range-sort keyed-reduction exchange."""

import numpy as np
import pandas as pd


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
