"""Distributed sketch building over ``ray.data.Dataset``.

Two build strategies (SURVEY.md §3.4 / §7):

- **Partial + tree-merge** (``build_sketch``): every input block produces ONE partial
  sketch inside ``map_batches`` (the combiner — no shuffle of row data at all), the
  partials dataset is reduced by a fan-in merge stage, and the final few blobs merge
  on the driver. This is the scalable default for fixed-size states (HLL, CMS,
  digests, moderate-m Blooms): bytes moved = O(#blocks × sketch_size), independent
  of row count.
- **Keyed two-level** (``build_keyed_sketch``): per-block partial sketch *per key in
  the block*, then ``groupby(key)`` over the partials only. Because partials are
  fixed-size, skewed keys (the Zipfian ``lang``) cost O(#blocks) partials, not
  O(rows) — the salted-two-level pattern from SURVEY.md §4.

The insert/flush/query epoch of the reference (gloom.h:196-215 ``flush()``)
corresponds to the materialization barrier between the build and any probe stage.
"""

from __future__ import annotations

import time
from typing import Callable

import numpy as np
import pyarrow as pa

from raysketch.sketches.base import sketch_from_bytes

_STATE_SCHEMA = pa.schema([("state", pa.binary()), ("rows_in", pa.int64())])


def _default_update(sk, col: pa.Array) -> None:
    """Update a sketch from an Arrow column: hash-keyed sketches take the column,
    value sketches (t-digest/KLL) take the numeric values."""
    if hasattr(sk, "update_column"):
        sk.update_column(col)
    else:
        sk.update(col.to_numpy(zero_copy_only=False))


def _merge_blobs(blobs) -> bytes:
    it = iter(blobs)
    acc = sketch_from_bytes(bytes(next(it)))
    for b in it:
        acc.merge(sketch_from_bytes(bytes(b)))
    return acc.to_bytes()


def build_sketch(
    ds,
    column: str,
    make_sketch: Callable[[], object],
    update: Callable[[object, pa.Array], None] = _default_update,
    batch_size: int | None = None,
    merge_fanout: int = 64,
):
    """Build one merged sketch over ``ds[column]``. Returns the sketch object.

    ``column`` may be a list of names for multi-column sketches (e.g. value +
    weight): ``update`` then receives the projected pyarrow TABLE instead of a
    single column. ``map_batches`` with ``batch_size=None`` gives one partial
    per block (zero-copy pyarrow in, 1-row table out); a fan-in merge stage
    bounds what the driver touches to ``#blocks / merge_fanout`` blobs.
    """
    cols = [column] if isinstance(column, str) else list(column)

    def partial(batch: pa.Table) -> pa.Table:
        sk = make_sketch()
        if len(cols) == 1:
            update(sk, batch.column(cols[0]).combine_chunks())
        else:
            update(sk, batch)
        return pa.table(
            {"state": [sk.to_bytes()], "rows_in": [batch.num_rows]}, schema=_STATE_SCHEMA
        )

    parts = ds.select_columns(cols).map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )

    def merge_batch(batch: pa.Table) -> pa.Table:
        blob = _merge_blobs(batch.column("state").to_pylist())
        return pa.table(
            {"state": [blob], "rows_in": [int(pa.compute.sum(batch.column("rows_in")).as_py() or 0)]},
            schema=_STATE_SCHEMA,
        )

    reduced = parts.map_batches(merge_batch, batch_format="pyarrow", batch_size=merge_fanout)
    final_rows = reduced.take_all()  # ≤ #blocks / fanout rows, each a small blob
    acc = sketch_from_bytes(final_rows[0]["state"])
    for row in final_rows[1:]:
        acc.merge(sketch_from_bytes(row["state"]))
    return acc


def build_keyed_sketch(
    ds,
    key: str,
    column: str,
    make_sketch: Callable[[], object],
    update: Callable[[object, pa.Array], None] = _default_update,
    batch_size: int | None = None,
    as_dataset: bool = False,
):
    """Build one merged sketch PER distinct value of ``key`` (e.g. per ``lang``).

    Returns a small Arrow table ``(key, state, rows_in)``. Skew-safe: the shuffle
    moves only per-block partial blobs, never rows.

    ``as_dataset=True`` returns the merged blob rows as a DATASET instead of
    collecting them — the escape hatch for high-cardinality key universes
    (per-window sketches over a long time range, per-host keys) where even one
    blob per key exceeds driver memory; feed it to ``write_parquet`` or a
    downstream join. Row content is identical to the table path (tested).
    """

    def partial(batch: pa.Table) -> pa.Table:
        # argsort + segment bounds (like merge_block below): O(n log n) total,
        # one zero-copy slice per distinct key — NOT a full-length boolean mask
        # per key, which is O(n·distinct) and degrades at high key cardinality
        # (url-host keys), VERDICT r2 item 4
        keys = batch.column(key).combine_chunks()
        col = batch.column(column).combine_chunks()
        karr = np.asarray(keys)
        out_k, out_s, out_n = [], [], []
        if len(karr):
            order = np.argsort(karr, kind="stable")
            ks = karr[order]
            new_k = np.empty(len(ks), dtype=bool)
            new_k[0] = True
            np.not_equal(ks[1:], ks[:-1], out=new_k[1:])
            bounds = np.append(np.nonzero(new_k)[0], len(ks))
            sorted_col = col.take(pa.array(order))
            for j in range(len(bounds) - 1):
                lo, hi = int(bounds[j]), int(bounds[j + 1])
                sk = make_sketch()
                update(sk, sorted_col.slice(lo, hi - lo))
                out_k.append(str(ks[lo]))
                out_s.append(sk.to_bytes())
                out_n.append(hi - lo)
        return pa.table(
            {key: pa.array(out_k, type=pa.string()), "state": pa.array(out_s, type=pa.binary()), "rows_in": pa.array(out_n, type=pa.int64())}
        )

    parts = ds.select_columns([key, column]).map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )

    # merge partials per key WITHOUT map_groups (one Python call + DataFrame per
    # group — fatal at high key cardinality): HASH_SHUFFLE the partial rows by
    # key so each block holds whole keys, then ONE task per block walks the
    # sorted key runs and merges each run's blobs. Python cost is per OUTPUT
    # key, the unavoidable minimum.
    from ray.data.context import ShuffleStrategy

    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    nparts = max(4, min(32, ncpu))
    parts.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    parts.context.default_hash_shuffle_parallelism = nparts
    routed = parts.repartition(num_blocks=nparts, keys=[key])

    def merge_block(batch: pa.Table) -> pa.Table:
        out_k: list = []
        out_s: list = []
        out_n: list = []
        if batch.num_rows:
            karr = np.asarray(batch.column(key).combine_chunks())
            order = np.argsort(karr, kind="stable")
            ks = karr[order]
            states = batch.column("state").combine_chunks()
            rows_in = np.asarray(batch.column("rows_in").combine_chunks())[order]
            new_k = np.empty(len(ks), dtype=bool)
            new_k[0] = True
            np.not_equal(ks[1:], ks[:-1], out=new_k[1:])
            bounds = np.append(np.nonzero(new_k)[0], len(ks))
            for j in range(len(bounds) - 1):
                idx = order[bounds[j] : bounds[j + 1]]
                out_k.append(str(ks[bounds[j]]))
                out_s.append(_merge_blobs(states[int(i)].as_py() for i in idx))
                out_n.append(int(rows_in[bounds[j] : bounds[j + 1]].sum()))
        return pa.table(
            {
                key: pa.array(out_k, type=pa.string()),
                "state": pa.array(out_s, type=pa.binary()),
                "rows_in": pa.array(out_n, type=pa.int64()),
            }
        )

    merged = routed.map_batches(merge_block, batch_format="pyarrow", batch_size=None)
    if as_dataset:
        return merged
    rows = merged.take_all()
    return pa.table(
        {
            key: pa.array([r[key] for r in rows], type=pa.string()),
            "state": pa.array([r["state"] for r in rows], type=pa.binary()),
            "rows_in": pa.array([r["rows_in"] for r in rows], type=pa.int64()),
        }
    )


def sketch_table_to_dict(tbl: pa.Table, key: str) -> dict:
    """Materialize a keyed sketch table into {key: sketch} (small)."""
    out = {}
    for i in range(tbl.num_rows):
        out[tbl.column(key)[i].as_py()] = sketch_from_bytes(tbl.column("state")[i].as_py())
    return out
