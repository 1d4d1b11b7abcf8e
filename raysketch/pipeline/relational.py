"""Relational operators Ray Data lacks natively, built on the keyed-shuffle +
vectorized-block pattern (no per-group Python):

- ``top_k_per_group``: the windowed ``row_number() OVER (PARTITION BY key
  ORDER BY ...) <= k`` idiom — per-key top-k rows with deterministic
  tie-breaking.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def top_k_per_group(
    ds,
    key_col: str,
    order_col: str,
    k: int,
    descending: bool = True,
    tiebreak_col: str | None = None,
):
    """Keep the top ``k`` rows per ``key_col``, ordered by ``order_col``
    (then ``tiebreak_col`` ascending for determinism).

    Shape: HASH_SHUFFLE ``repartition(keys=[key_col])`` so each block holds
    whole keys → ONE vectorized task per block (lexsort + segment-relative rank
    via ``arange − segment_start``) — SQL ``QUALIFY row_number() OVER
    (PARTITION BY key ORDER BY ...) <= k`` semantics with zero per-group
    Python. The shuffle payload is the projected columns only."""
    from ray.data.context import ShuffleStrategy

    import ray

    cols = [key_col, order_col] + ([tiebreak_col] if tiebreak_col else [])
    narrow = ds.select_columns(cols)
    narrow.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    nparts = max(8, min(64, ncpu * 2))
    # the captured context governs EVERY hash exchange on this chain (including
    # an upstream groupby fused into the same plan) — without this, those
    # exchanges fall back to the 200-partition default and pay ~200 aggregator
    # actor spin-ups for data that fits a handful of blocks
    narrow.context.default_hash_shuffle_parallelism = nparts
    parts = narrow.repartition(num_blocks=nparts, keys=[key_col])

    def per_block(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch
        key = np.asarray(batch.column(key_col).combine_chunks())
        order_v = batch.column(order_col).combine_chunks().to_numpy(zero_copy_only=False)
        sort_order = -order_v if descending else order_v
        if tiebreak_col:
            tb = np.asarray(batch.column(tiebreak_col).combine_chunks())
            perm = np.lexsort((tb, sort_order, key))
        else:
            perm = np.lexsort((sort_order, key))
        ks = key[perm]
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        np.not_equal(ks[1:], ks[:-1], out=new_key[1:])
        starts = np.nonzero(new_key)[0]
        seg_start = np.repeat(starts, np.diff(np.append(starts, n)))
        rank = np.arange(n, dtype=np.int64) - seg_start
        keep = perm[rank < k]
        mask = np.zeros(n, dtype=bool)
        mask[keep] = True
        return batch.filter(pa.array(mask))

    return parts.map_batches(per_block, batch_format="pyarrow", batch_size=None)


def distinct_rows(ds, cols: list[str], num_partitions: int | None = None, strategy: str = "sort"):
    """DISTINCT over ``cols`` without the native hash aggregate (distinct-style
    keys are singleton-heavy by definition — groups ≈ rows, exactly the shape
    where the aggregator's per-group machinery collapses: 147 s vs ~10 s on
    20M keys, BASELINE.md round-3).

    ``strategy="sort"`` (default, r5): per-block Arrow distinct combiner →
    the range-sort exchange + adjacent-row dedup + edge fixup
    (``exchange.sorted_distinct``) — the r4 sort-vs-hash-shuffle win applied
    to DISTINCT (it is a first-per-key reduction). Nulls and float NaN keys
    both dedup to one row under either strategy (the adjacency mask and the
    edge group_by treat NaN == NaN, matching the Arrow hash aggregate).
    ``"repartition"``: the keyed HASH_SHUFFLE path; ``num_partitions``
    applies to that strategy only (the sort exchange sizes itself)."""
    from raysketch.pipeline.exchange import sorted_distinct

    def block_distinct(t: pa.Table) -> pa.Table:
        return t.group_by(cols).aggregate([])

    pre = ds.select_columns(cols).map_batches(
        block_distinct, batch_format="pyarrow", zero_copy_batch=True
    )
    if strategy == "sort":
        return sorted_distinct(pre, cols)
    from ray.data.context import ShuffleStrategy

    from raysketch.pipeline.dedup import _num_partitions

    npart = num_partitions or _num_partitions()
    pre.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    pre.context.default_hash_shuffle_parallelism = npart
    return pre.repartition(num_blocks=npart, keys=cols).map_batches(
        block_distinct, batch_format="pyarrow", batch_size=None
    )
