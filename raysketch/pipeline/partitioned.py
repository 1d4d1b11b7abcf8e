"""Shuffle-partitioned Bloom build — the distributed ParallelBloomFilter1/Gloom.

The reference's owner-compute protocol (hash an item, route ``(h1,h2)`` to the
owning shard's queue, owner sets bits — gloom.h:113-140, parallel_bloom.h:58-127)
maps onto Ray Data as:

    hash stage (stateless map_batches, zero-copy Arrow)
        → adds (h1, h2, shard) columns, projects everything else away
    groupby("shard")                       ← THE shuffle; replaces the MPMC queues;
                                             its barrier is the reference's flush()
    map_groups(build sub-filter)           ← owner does only local bit-sets
        → one row per shard: {shard, state, rows_in, build_ms}  (lineage+metrics)

The result is bitwise-identical to a single-process ``PartitionedBloom`` build over
the same rows (OR-merge commutativity — tested), which is the reference's
merge-associativity requirement expressed shard-wise.
"""

from __future__ import annotations

import math
import time

import numpy as np
import pyarrow as pa

from raysketch.hashing import CLASSIC_SEEDS, hash_pair, shard_of
from raysketch.sketches.bloom import BloomSketch, PartitionedBloom
from raysketch.sketches.base import sketch_from_bytes


def add_hash_columns(
    batch: pa.Table,
    column: str,
    num_shards: int,
    hash_algo: str = "xxh64",
    seeds: tuple[int, int] = CLASSIC_SEEDS,
    keep: tuple[str, ...] = (),
) -> pa.Table:
    """Stateless hash stage: append (h1, h2, shard) for ``column`` and keep only
    what downstream needs (prune the wide columns before the shuffle)."""
    h1, h2 = hash_pair(batch.column(column).combine_chunks(), algo=hash_algo, seeds=seeds)
    sid = shard_of(h1, num_shards)
    cols = {name: batch.column(name) for name in keep if name in batch.column_names}
    cols["h1"] = pa.array(h1)
    cols["h2"] = pa.array(h2)
    cols["shard"] = pa.array(sid)
    return pa.table(cols)


def build_partitioned_bloom(
    ds,
    column: str,
    capacity: int,
    fp_rate: float = 0.01,
    num_shards: int = 64,
    hash_algo: str = "xxh64",
    seeds: tuple[int, int] = CLASSIC_SEEDS,
    algo: str = "classic",
) -> tuple[PartitionedBloom, pa.Table]:
    """Build a PartitionedBloom over ``ds[column]`` with a shard shuffle.

    Returns ``(filter, lineage)`` where lineage is one row per shard:
    ``(shard, rows_in, build_ms, state_bytes)`` — the per-partition metrics the
    north rule mandates. Each shard's sub-filter sees exactly its keys, so the
    per-shard state is the full distributed filter's shard — merge-free.
    """
    per_shard_capacity = max(1, math.ceil(capacity / num_shards))

    hashed = ds.map_batches(
        lambda b: add_hash_columns(b, column, num_shards, hash_algo, seeds),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def build_shard(group: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        sid = int(group.column("shard")[0].as_py())
        sk = BloomSketch(per_shard_capacity, fp_rate, algo=algo, hash_algo=hash_algo, seeds=seeds)
        sk.update_hashes(
            group.column("h1").combine_chunks().to_numpy(),
            group.column("h2").combine_chunks().to_numpy(),
        )
        blob = sk.to_bytes()
        ms = (time.perf_counter() - t0) * 1000
        return pa.table(
            {
                "shard": pa.array([sid], type=pa.int32()),
                "state": pa.array([blob], type=pa.binary()),
                "rows_in": pa.array([group.num_rows], type=pa.int64()),
                "build_ms": pa.array([ms], type=pa.float64()),
                "state_bytes": pa.array([len(blob)], type=pa.int64()),
            }
        )

    shard_rows = hashed.groupby("shard").map_groups(build_shard, batch_format="pyarrow").take_all()

    pb = PartitionedBloom(
        capacity, fp_rate, num_shards=num_shards, algo=algo, hash_algo=hash_algo, seeds=seeds
    )
    lineage_cols = {"shard": [], "rows_in": [], "build_ms": [], "state_bytes": []}
    for row in shard_rows:
        sid = int(row["shard"])
        pb.shards[sid] = BloomSketch.from_bytes(row["state"])
        lineage_cols["shard"].append(sid)
        lineage_cols["rows_in"].append(row["rows_in"])
        lineage_cols["build_ms"].append(row["build_ms"])
        lineage_cols["state_bytes"].append(row["state_bytes"])
    lineage = pa.table(
        {
            "shard": pa.array(lineage_cols["shard"], type=pa.int32()),
            "rows_in": pa.array(lineage_cols["rows_in"], type=pa.int64()),
            "build_ms": pa.array(lineage_cols["build_ms"], type=pa.float64()),
            "state_bytes": pa.array(lineage_cols["state_bytes"], type=pa.int64()),
        }
    )
    return pb, lineage


def build_partitioned_bloom_partial(
    ds,
    column: str,
    capacity: int,
    fp_rate: float = 0.01,
    num_shards: int = 64,
    hash_algo: str = "xxh64",
    seeds: tuple[int, int] = CLASSIC_SEEDS,
    algo: str = "classic",
) -> PartitionedBloom:
    """Shuffle-free alternative: each block builds a full-geometry PartitionedBloom
    partial; partials OR-merge (commutative) to the identical final bits. Preferable
    when ``capacity/num_shards`` is small enough that a whole partial fits a worker
    (bytes moved = #blocks × total_bits/8 — use the shuffle build when m is large)."""
    from raysketch.pipeline.build import build_sketch

    def make():
        return PartitionedBloom(
            capacity, fp_rate, num_shards=num_shards, algo=algo, hash_algo=hash_algo, seeds=seeds
        )

    return build_sketch(ds, column, make)
