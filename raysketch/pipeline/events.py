"""Stream-shaped operators over the ``events`` table (event_id, ts, user_id,
event_type, value, props).

Ray Data is a batch engine (no watermarks); windows are expressed per the
streaming-shaped recipe: key-partitioned ``groupby`` with in-batch partial
aggregation first (the combiner), so the shuffle moves one row per
(key, window, block) — not one per event. Late/out-of-order data is a non-issue
because the aggregates are commutative (same reason bit-OR made the reference's
insert order irrelevant, SURVEY.md §1.3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def tumbling_window_agg(
    ds,
    window_s: int,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
):
    """Tumbling-window sum/count/min/max per key. Returns a Dataset with columns
    (key, window_start (epoch s), n_events, sum_value, min_value, max_value).

    Two-level: vectorized per-batch partials, then a groupby over partials only.
    """

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).combine_chunks()
        epoch = pc.cast(ts, pa.int64()).to_numpy(zero_copy_only=False) // 1_000_000
        window = (epoch // window_s) * window_s
        keys = np.asarray(batch.column(key_col))
        vals = batch.column(value_col).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"k": keys, "w": window, "v": vals})
        g = df.groupby(["k", "w"], sort=False)["v"].agg(["count", "sum", "min", "max"]).reset_index()
        return pa.table(
            {
                key_col: pa.array(g["k"], pa.string()),
                "window_start": pa.array(g["w"], pa.int64()),
                "n_events": pa.array(g["count"], pa.int64()),
                "sum_value": pa.array(g["sum"], pa.float64()),
                "min_value": pa.array(g["min"], pa.float64()),
                "max_value": pa.array(g["max"], pa.float64()),
            }
        )

    from ray.data.aggregate import Max, Min, Sum

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return parts.groupby([key_col, "window_start"]).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("sum_value", alias_name="sum_value"),
        Min("min_value", alias_name="min_value"),
        Max("max_value", alias_name="max_value"),
    )


def sliding_window_agg(
    ds,
    window_s: int,
    slide_s: int,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
):
    """Sliding windows (window_s wide, advancing by slide_s) per key. Each event
    belongs to ``window_s // slide_s`` windows; the event is fanned out to its
    windows *inside the batch* (vectorized repeat), then the same two-level
    partial/final aggregation as the tumbling case. window_s must be a multiple
    of slide_s. Output: (key, window_start, n_events, sum_value)."""
    if window_s % slide_s:
        raise ValueError("window_s must be a multiple of slide_s")
    fan = window_s // slide_s

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).combine_chunks()
        epoch = pc.cast(ts, pa.int64()).to_numpy(zero_copy_only=False) // 1_000_000
        keys = np.asarray(batch.column(key_col))
        vals = batch.column(value_col).to_numpy(zero_copy_only=False)
        # window starts containing t: floor((t - i*slide)/window)*... simpler:
        # all starts s with s <= t < s+window and s ≡ 0 (mod slide):
        base = (epoch // slide_s) * slide_s
        starts = np.concatenate([base - i * slide_s for i in range(fan)])
        k_rep = np.tile(keys, fan)
        v_rep = np.tile(vals, fan)
        df = pd.DataFrame({"k": k_rep, "w": starts, "v": v_rep})
        g = df.groupby(["k", "w"], sort=False)["v"].agg(["count", "sum"]).reset_index()
        return pa.table(
            {
                key_col: pa.array(g["k"], pa.string()),
                "window_start": pa.array(g["w"], pa.int64()),
                "n_events": pa.array(g["count"], pa.int64()),
                "sum_value": pa.array(g["sum"], pa.float64()),
            }
        )

    from ray.data.aggregate import Sum

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return parts.groupby([key_col, "window_start"]).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("sum_value", alias_name="sum_value"),
    )


def sessionize(
    ds,
    gap_s: int = 1800,
    ts_col: str = "ts",
    key_col: str = "user_id",
):
    """Gap-based sessionization per user: a new session starts when the gap from
    the previous event exceeds ``gap_s``. Returns (user_id, n_events, n_sessions).

    Shuffle key = user_id; within a group the events are sorted by ts (pandas) —
    the ordered-log-per-key pattern."""

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        # unit-safe: cast to second resolution first (pandas may carry ns or us)
        ts = g[ts_col].sort_values().astype("datetime64[s]").astype("int64").to_numpy()
        gaps = np.diff(ts, prepend=ts[0])
        n_sessions = int((gaps > gap_s).sum()) + 1
        return pd.DataFrame(
            {
                key_col: [g[key_col].iloc[0]],
                "n_events": [len(g)],
                "n_sessions": [n_sessions],
            }
        )

    return ds.groupby(key_col).map_groups(per_user, batch_format="pandas")
