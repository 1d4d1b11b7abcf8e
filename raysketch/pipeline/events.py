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

_UNIT_DIV = {"s": 1, "ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}


def _epoch_seconds(ts) -> np.ndarray:
    """Epoch seconds (int64, floor) from a timestamp column of ANY unit — the
    divisor is derived from ``ts.type.unit`` instead of hard-coding [us]."""
    if isinstance(ts, pa.ChunkedArray):
        ts = ts.combine_chunks()
    div = _UNIT_DIV[ts.type.unit] if pa.types.is_timestamp(ts.type) else 1
    raw = pc.cast(ts, pa.int64()).to_numpy(zero_copy_only=False)
    return raw // div  # floor division → floor(epoch), incl. pre-1970 values


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
        epoch = _epoch_seconds(batch.column(ts_col))
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
        epoch = _epoch_seconds(batch.column(ts_col))
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

    Scale-safe shape (no ``map_groups`` — that is one Python call + one DataFrame
    PER USER, fatal at O(users) cardinality): narrow (user, epoch_s) rows →
    HASH_SHUFFLE ``repartition(keys=[user_id])`` so each output block holds whole
    users → ONE vectorized task per block (lexsort by (user, ts), ``np.diff``
    session starts, segment sums via cumsum) — the ordered-log-per-key pattern
    with per-block, not per-group, Python dispatch."""
    from ray.data.context import ShuffleStrategy

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                key_col: batch.column(key_col),
                "__ts": pa.array(_epoch_seconds(batch.column(ts_col))),
            }
        )

    narrow = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    # the returned Dataset is lazy — the strategy must still be HASH_SHUFFLE on
    # its captured context when the consumer finally executes it, so no restore
    narrow.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    parts = narrow.repartition(num_blocks=max(8, min(64, ncpu * 2)), keys=[key_col])

    def per_block(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "n_sessions": pa.array([], pa.int64()),
                }
            )
        u = np.asarray(batch.column(key_col).combine_chunks())
        t = np.asarray(batch.column("__ts").combine_chunks())
        order = np.lexsort((t, u))
        us, ts_ = u[order], t[order]
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        np.not_equal(us[1:], us[:-1], out=new_user[1:])
        gaps = np.empty(n, dtype=np.int64)
        gaps[0] = 0
        np.subtract(ts_[1:], ts_[:-1], out=gaps[1:])
        new_sess = new_user | (gaps > gap_s)
        bounds = np.append(np.nonzero(new_user)[0], n)
        cs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(new_sess, out=cs[1:])
        return pa.table(
            {
                key_col: pa.array(us[bounds[:-1]]),
                "n_events": pa.array(bounds[1:] - bounds[:-1]),
                "n_sessions": pa.array(cs[bounds[1:]] - cs[bounds[:-1]]),
            }
        )

    return parts.map_batches(per_block, batch_format="pyarrow", batch_size=None)
