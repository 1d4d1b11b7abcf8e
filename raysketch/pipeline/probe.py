"""Membership probing, approximate semi/anti-joins, and the confusion-matrix oracle.

The reference's query phase (simple_benchmark.cpp:260-297: T threads probe the
shared filter against a labeled test set, per-thread counters, summed at the end)
becomes: broadcast the merged sketch blob ONCE via ``ray.put``, probe inside an
actor-pool ``map_batches`` (deserialize once per actor in ``__init__``, not per
batch), emit a bool column; the confusion matrix is a per-batch partial count + a
tiny global sum — partial/final aggregation, no shuffle of probe rows.

Bloom semantics give (SURVEY.md §2.4 "Filters/predicates"):
- semi-join   (keep rows the filter says are present): approximate, FPR ≤ p extras
- anti-join   (keep rows the filter says are absent): EXACT complement loss — a row
  reported absent is definitely absent (no false negatives), so dedup-new detection
  never drops a genuinely-new row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from raysketch.sketches.base import sketch_from_bytes


class SketchProber:
    """Actor-pool callable: holds the deserialized sketch (once per actor)."""

    def __init__(self, blob_ref, column: str, out_column: str = "member", negate: bool = False):
        blob = ray.get(blob_ref) if not isinstance(blob_ref, (bytes, bytearray)) else blob_ref
        self.sketch = sketch_from_bytes(bytes(blob))
        self.column = column
        self.out_column = out_column
        self.negate = negate

    def __call__(self, batch: pa.Table) -> pa.Table:
        hits = self.sketch.probe_column(batch.column(self.column).combine_chunks())
        if self.negate:
            hits = ~hits
        return batch.append_column(self.out_column, pa.array(hits))


def probe_dataset(
    ds,
    sketch,
    column: str,
    out_column: str = "member",
    concurrency: int | tuple = (1, 8),
    batch_size: int | None = None,
):
    """Append a membership column by probing a broadcast sketch."""
    blob_ref = ray.put(sketch.to_bytes())
    return ds.map_batches(
        SketchProber,
        fn_constructor_kwargs={"blob_ref": blob_ref, "column": column, "out_column": out_column},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
        zero_copy_batch=True,
    )


def bloom_semi_join(ds, sketch, column: str, concurrency: int | tuple = (1, 8)):
    """Keep rows whose ``column`` the filter reports present (approximate semi-join:
    all true members kept + ≤ p false extras)."""
    probed = probe_dataset(ds, sketch, column, out_column="__member", concurrency=concurrency)
    return probed.map_batches(
        lambda b: b.filter(b.column("__member")).drop_columns(["__member"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def bloom_anti_join(ds, sketch, column: str, concurrency: int | tuple = (1, 8)):
    """Keep rows whose ``column`` the filter reports ABSENT. Exact in one direction:
    never keeps a true member's row... every kept row is genuinely absent; some
    genuinely-absent rows are dropped at rate ≤ p (false positives)."""
    probed = probe_dataset(ds, sketch, column, out_column="__member", concurrency=concurrency)
    return probed.map_batches(
        lambda b: b.filter(pa.compute.invert(b.column("__member"))).drop_columns(["__member"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def confusion_matrix(
    ds,
    sketch,
    column: str,
    label_column: str = "is_positive",
    concurrency: int | tuple = (1, 8),
) -> dict:
    """The reference's accuracy oracle (simple_benchmark.cpp:163-167, 305-313):
    probe a labeled test set, count tp/fp/fn/tn with per-batch partials + global sum,
    derive fp_rate = fp/negatives and fn_rate = fn/positives."""
    probed = probe_dataset(ds, sketch, column, out_column="__member", concurrency=concurrency)

    def partial_counts(batch: pa.Table) -> pa.Table:
        pred = np.asarray(batch.column("__member").combine_chunks())
        label = np.asarray(batch.column(label_column).combine_chunks())
        tp = int(np.sum(pred & label))
        fp = int(np.sum(pred & ~label))
        fn = int(np.sum(~pred & label))
        tn = int(np.sum(~pred & ~label))
        return pa.table({"tp": [tp], "fp": [fp], "fn": [fn], "tn": [tn]})

    counts = probed.map_batches(partial_counts, batch_format="pyarrow")
    agg = counts.sum(["tp", "fp", "fn", "tn"])
    tp, fp, fn, tn = (agg[f"sum({c})"] for c in ("tp", "fp", "fn", "tn"))
    negatives = fp + tn
    positives = tp + fn
    return {
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "tn": tn,
        "fp_rate": fp / negatives if negatives else 0.0,
        "fn_rate": fn / positives if positives else 0.0,
        "test_count": tp + fp + fn + tn,
    }


class BroadcastSetSemiJoin:
    """Exact broadcast semi/anti-join against a small key set (the reference's
    ``unordered_set_baseline``, benchmark_bloom.cpp:19-30, as a Ray stage). The set
    is shipped once via ``ray.put`` and hashed into a numpy-sortable lookup in
    ``__init__`` (once per actor)."""

    def __init__(self, keys_ref, column: str, negate: bool = False):
        keys = ray.get(keys_ref) if not isinstance(keys_ref, (set, frozenset, list, np.ndarray)) else keys_ref
        self.lookup = np.sort(np.asarray(list(keys)))
        self.column = column
        self.negate = negate

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = np.asarray(batch.column(self.column).combine_chunks())
        if len(self.lookup) == 0:
            hit = np.zeros(len(vals), dtype=bool)
        else:
            idx = np.searchsorted(self.lookup, vals)
            idx = np.clip(idx, 0, len(self.lookup) - 1)
            hit = self.lookup[idx] == vals
        if self.negate:
            hit = ~hit
        return batch.filter(pa.array(hit))


def exact_semi_join(ds, keys, column: str, negate: bool = False, concurrency: int | tuple = (1, 8)):
    """Exact semi (or anti) join of ``ds`` against a broadcast small key collection."""
    keys_ref = ray.put(list(keys))
    return ds.map_batches(
        BroadcastSetSemiJoin,
        fn_constructor_kwargs={"keys_ref": keys_ref, "column": column, "negate": negate},
        batch_format="pyarrow",
        concurrency=concurrency,
        zero_copy_batch=True,
    )
