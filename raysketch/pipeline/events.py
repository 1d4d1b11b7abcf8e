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
import pyarrow as pa
import pyarrow.compute as pc

from raysketch.pipeline.contracts import require_non_null

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
        # lexsort + reduceat block partial (the repo-idiom pattern, e.g.
        # text._segment_dup_stats) — no Arrow→pandas conversion, no pandas
        # groupby per batch
        n = batch.num_rows
        require_non_null(batch, ts_col, "tumbling_window_agg")
        require_non_null(batch, key_col, "tumbling_window_agg")
        # a null value would ride NaN through the float64 cast: sum/min/max
        # turn NaN where SQL SKIPS nulls — a silent oracle divergence
        require_non_null(batch, value_col, "tumbling_window_agg")
        epoch = _epoch_seconds(batch.column(ts_col))
        window = (epoch // window_s) * window_s
        keys = np.asarray(batch.column(key_col).combine_chunks())
        vals = batch.column(value_col).combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        if n == 0:
            starts = np.empty(0, dtype=np.int64)
            ks = keys
            ws = counts = np.empty(0, dtype=np.int64)
            sums = mins = maxs = np.empty(0, dtype=np.float64)
        else:
            order = np.lexsort((window, keys))
            ks, ws, vs = keys[order], window[order], vals[order]
            new = np.empty(n, dtype=bool)
            new[0] = True
            new[1:] = (ks[1:] != ks[:-1]) | (ws[1:] != ws[:-1])
            starts = np.nonzero(new)[0]
            counts = np.diff(np.append(starts, n))
            sums = np.add.reduceat(vs, starts)
            mins = np.minimum.reduceat(vs, starts)
            maxs = np.maximum.reduceat(vs, starts)
            ks, ws = ks[starts], ws[starts]
        return pa.table(
            {
                key_col: pa.array(ks, pa.string()),
                "window_start": pa.array(ws, pa.int64()),
                "n_events": pa.array(counts, pa.int64()),
                "sum_value": pa.array(sums, pa.float64()),
                "min_value": pa.array(mins, pa.float64()),
                "max_value": pa.array(maxs, pa.float64()),
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
        require_non_null(batch, ts_col, "sliding_window_agg")
        require_non_null(batch, key_col, "sliding_window_agg")
        require_non_null(batch, value_col, "sliding_window_agg")
        epoch = _epoch_seconds(batch.column(ts_col))
        keys = np.asarray(batch.column(key_col).combine_chunks())
        vals = batch.column(value_col).combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        # window starts containing t: all starts s with s <= t < s+window and
        # s ≡ 0 (mod slide) — the event fans out to its windows in-batch
        base = (epoch // slide_s) * slide_s
        win = np.concatenate([base - i * slide_s for i in range(fan)])
        k_rep = np.tile(keys, fan)
        v_rep = np.tile(vals, fan)
        m = len(win)
        if m == 0:
            ks = k_rep
            ws = counts = np.empty(0, dtype=np.int64)
            sums = np.empty(0, dtype=np.float64)
        else:
            order = np.lexsort((win, k_rep))
            ks, ws, vs = k_rep[order], win[order], v_rep[order]
            new = np.empty(m, dtype=bool)
            new[0] = True
            new[1:] = (ks[1:] != ks[:-1]) | (ws[1:] != ws[:-1])
            starts = np.nonzero(new)[0]
            counts = np.diff(np.append(starts, m))
            sums = np.add.reduceat(vs, starts)
            ks, ws = ks[starts], ws[starts]
        return pa.table(
            {
                key_col: pa.array(ks, pa.string()),
                "window_start": pa.array(ws, pa.int64()),
                "n_events": pa.array(counts, pa.int64()),
                "sum_value": pa.array(sums, pa.float64()),
            }
        )

    from ray.data.aggregate import Sum

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return parts.groupby([key_col, "window_start"]).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("sum_value", alias_name="sum_value"),
    )


def _epoch_us(ts) -> np.ndarray:
    """Epoch MICROseconds (int64) from a timestamp column of any unit."""
    if isinstance(ts, pa.ChunkedArray):
        ts = ts.combine_chunks()
    raw = pc.cast(ts, pa.int64()).to_numpy(zero_copy_only=False)
    if not pa.types.is_timestamp(ts.type):
        return raw * 1_000_000
    unit = ts.type.unit
    if unit == "ns":
        return raw // 1_000
    return raw * (1_000_000 // _UNIT_DIV[unit])


def asof_join(
    left,
    right,
    key_col: str = "user_id",
    ts_col: str = "ts",
    left_id_col: str = "event_id",
    right_value_col: str = "value",
):
    """As-of (latest-at-or-before) join: for every left row, the right row with
    the greatest ``ts_col`` ≤ the left row's, within the same ``key_col`` —
    DuckDB ``ASOF LEFT JOIN ... ON l.key = r.key AND l.ts >= r.ts`` semantics
    (unmatched left rows keep nulls).

    Ray-Data-first shape (an operator Ray Data lacks): both sides are projected
    to narrow rows, tagged by side, UNIONed, hash-shuffled by key so each block
    holds whole keys, and ONE vectorized task per block does lexsort by
    (key, ts, side) + a cumulative-maximum forward fill of the last right-row
    index (segment-reset via start-of-key comparison) — no per-key Python, no
    sorted-merge actor state. Timestamps compare at microsecond precision.
    Output: (left_id, key, ts_us, matched_ts_us, matched_value)."""
    from ray.data.context import ShuffleStrategy

    def prep_left(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        require_non_null(batch, ts_col, "asof_join(left)")
        require_non_null(batch, key_col, "asof_join(left)")
        return pa.table(
            {
                "__key": batch.column(key_col),
                "__ts": pa.array(_epoch_us(batch.column(ts_col))),
                "__side": pa.array(np.ones(n, dtype=np.int8)),
                "__lid": batch.column(left_id_col),
                "__val": pa.array(np.full(n, np.nan)),
            }
        )

    def prep_right(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        require_non_null(batch, ts_col, "asof_join(right)")
        require_non_null(batch, key_col, "asof_join(right)")
        require_non_null(batch, right_value_col, "asof_join(right)")
        return pa.table(
            {
                "__key": batch.column(key_col),
                "__ts": pa.array(_epoch_us(batch.column(ts_col))),
                "__side": pa.array(np.zeros(n, dtype=np.int8)),
                "__lid": pa.array(np.full(n, -1, dtype=np.int64)),
                "__val": pa.array(
                    batch.column(right_value_col).combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
                ),
            }
        )

    lt = left.map_batches(prep_left, batch_format="pyarrow", zero_copy_batch=True)
    rt = right.map_batches(prep_right, batch_format="pyarrow", zero_copy_batch=True)
    both = lt.union(rt)
    both.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    parts = both.repartition(num_blocks=max(8, min(64, ncpu * 2)), keys=["__key"])

    # matched_ts_us is a NULLABLE int64 (precision-true past 2^53 µs — far-future
    # or sentinel timestamps survive exactly); matched_value stays float64 with
    # NaN so a SQL LEFT-join NULL lands as NaN in a pandas float column
    out_schema = {
        left_id_col: pa.int64(),
        key_col: pa.int64(),
        "ts_us": pa.int64(),
        "matched_ts_us": pa.int64(),
        "matched_value": pa.float64(),
    }

    def per_block(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({c: pa.array([], t) for c, t in out_schema.items()})
        key = np.asarray(batch.column("__key").combine_chunks())
        ts = np.asarray(batch.column("__ts").combine_chunks())
        side = np.asarray(batch.column("__side").combine_chunks())
        lid = np.asarray(batch.column("__lid").combine_chunks())
        val = np.asarray(batch.column("__val").combine_chunks())
        order = np.lexsort((side, ts, key))  # right(0) before left(1) at equal ts
        key, ts, side, lid, val = key[order], ts[order], side[order], lid[order], val[order]
        is_right = side == 0
        cand = np.maximum.accumulate(np.where(is_right, np.arange(n), -1))
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        np.not_equal(key[1:], key[:-1], out=new_key[1:])
        seg_start = np.repeat(np.nonzero(new_key)[0], np.diff(np.append(np.nonzero(new_key)[0], n)))
        is_left = ~is_right
        li = np.nonzero(is_left)[0]
        c = cand[li]
        valid = c >= seg_start[li]
        csafe = np.where(valid, c, 0)
        matched_ts = pa.array(ts[csafe], pa.int64(), mask=~valid)  # null if unmatched
        matched_val = np.where(valid, val[csafe], np.nan)
        return pa.table(
            {
                left_id_col: pa.array(lid[li]),
                key_col: pa.array(key[li]),
                "ts_us": pa.array(ts[li]),
                "matched_ts_us": matched_ts,
                "matched_value": pa.array(matched_val),
            }
        )

    return parts.map_batches(per_block, batch_format="pyarrow", batch_size=None)


def range_join(
    left,
    right,
    window_us: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    left_id_col: str = "event_id",
    right_value_col: str = "value",
):
    """Per-key interval join: every (left, right) pair with the same key and
    ``right.ts ∈ [left.ts − window_us, left.ts]`` — SQL
    ``JOIN ON key AND r.ts BETWEEN l.ts - w AND l.ts`` semantics, one output row
    per matching pair.

    Same distributed shape as ``asof_join``: tag + union + keyed HASH_SHUFFLE →
    one task per block. In-block: both sides sorted by (key, ts); the match
    ranges for ALL left rows come from TWO global ``searchsorted`` calls over a
    rank-space composite of the right side (dense key rank × monotone timestamp
    id — both endpoints are members of the id space, so the closed interval is
    exact), and pairs are emitted by repeat/arange range flattening. No
    per-key, per-row or per-pair Python — cost is flat in key cardinality,
    matching asof_join (the r3 review's high-cardinality degradation fixed)."""
    from ray.data.context import ShuffleStrategy

    def prep_left(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        require_non_null(batch, ts_col, "range_join(left)")
        require_non_null(batch, key_col, "range_join(left)")
        return pa.table(
            {
                "__key": batch.column(key_col),
                "__ts": pa.array(_epoch_us(batch.column(ts_col))),
                "__side": pa.array(np.ones(n, dtype=np.int8)),
                "__lid": batch.column(left_id_col),
                "__val": pa.array(np.full(n, np.nan)),
            }
        )

    def prep_right(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        require_non_null(batch, ts_col, "range_join(right)")
        require_non_null(batch, key_col, "range_join(right)")
        require_non_null(batch, right_value_col, "range_join(right)")
        return pa.table(
            {
                "__key": batch.column(key_col),
                "__ts": pa.array(_epoch_us(batch.column(ts_col))),
                "__side": pa.array(np.zeros(n, dtype=np.int8)),
                "__lid": pa.array(np.full(n, -1, dtype=np.int64)),
                "__val": pa.array(
                    batch.column(right_value_col).combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
                ),
            }
        )

    lt = left.map_batches(prep_left, batch_format="pyarrow", zero_copy_batch=True)
    rt = right.map_batches(prep_right, batch_format="pyarrow", zero_copy_batch=True)
    both = lt.union(rt)
    both.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    parts = both.repartition(num_blocks=max(8, min(64, ncpu * 2)), keys=["__key"])

    out_schema = {
        left_id_col: pa.int64(),
        key_col: pa.int64(),
        "ts_us": pa.int64(),
        "matched_ts_us": pa.int64(),
        "matched_value": pa.float64(),
    }

    def per_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({c: pa.array([], t) for c, t in out_schema.items()})
        key = np.asarray(batch.column("__key").combine_chunks())
        ts = np.asarray(batch.column("__ts").combine_chunks())
        side = np.asarray(batch.column("__side").combine_chunks())
        lid = np.asarray(batch.column("__lid").combine_chunks())
        val = np.asarray(batch.column("__val").combine_chunks())
        isl = side == 1
        lk, lts, lids = key[isl], ts[isl], lid[isl]
        rk, rts, rvals = key[~isl], ts[~isl], val[~isl]
        lo_l = np.lexsort((lts, lk))
        lk, lts, lids = lk[lo_l], lts[lo_l], lids[lo_l]
        ro = np.lexsort((rts, rk))
        rk, rts, rvals = rk[ro], rts[ro], rvals[ro]
        lo_idx = np.zeros(len(lk), dtype=np.int64)
        hi_idx = np.zeros(len(lk), dtype=np.int64)
        if len(rk) and len(lk):
            # rank-space composite: key_rank·M + ts_id is monotone in the
            # right side's (key, ts) lexsort order, so ONE pair of global
            # searchsorted calls answers every left row's closed interval.
            # Both query endpoints (lts and lts−w) are members of the ts-id
            # space, which makes the inclusive bounds exact:
            #   rts >= lts−w  ⟺  ts_id(rts) >= id(lts−w)        (side="left")
            #   rts <= lts    ⟺  ts_id(rts) <  id(lts)+1        (side="right")
            uk, _ = np.unique(rk, return_index=True)
            t_all = np.unique(np.concatenate([rts, lts, lts - window_us]))
            M = np.int64(len(t_all) + 1)  # rank·M stays < ~3n² ≪ 2^63 per block
            comp_r = np.searchsorted(uk, rk).astype(np.int64) * M + np.searchsorted(t_all, rts)
            l_kid = np.searchsorted(uk, lk)
            l_has = (l_kid < len(uk)) & (uk[np.clip(l_kid, 0, len(uk) - 1)] == lk)
            l_kid = np.where(l_has, l_kid, 0).astype(np.int64)
            lo_t = np.searchsorted(t_all, lts - window_us)
            hi_t = np.searchsorted(t_all, lts, side="right")
            lo_idx = np.searchsorted(comp_r, l_kid * M + lo_t, side="left")
            hi_idx = np.searchsorted(comp_r, l_kid * M + hi_t, side="left")
            lo_idx = np.where(l_has, lo_idx, 0)
            hi_idx = np.where(l_has, hi_idx, 0)
        counts = hi_idx - lo_idx
        total = int(counts.sum())
        l_rep = np.repeat(np.arange(len(lk), dtype=np.int64), counts)
        r_off = np.zeros(len(lk) + 1, dtype=np.int64)
        np.cumsum(counts, out=r_off[1:])
        r_idx = np.repeat(lo_idx, counts) + (np.arange(total, dtype=np.int64) - np.repeat(r_off[:-1], counts))
        return pa.table(
            {
                left_id_col: pa.array(lids[l_rep]),
                key_col: pa.array(lk[l_rep]),
                "ts_us": pa.array(lts[l_rep]),
                "matched_ts_us": pa.array(rts[r_idx]),
                "matched_value": pa.array(rvals[r_idx]),
            }
        )

    return parts.map_batches(per_block, batch_format="pyarrow", batch_size=None)


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
        require_non_null(batch, ts_col, "sessionize")
        require_non_null(batch, key_col, "sessionize")
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
