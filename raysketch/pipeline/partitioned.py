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
    mode: str = "auto",
) -> tuple[PartitionedBloom, pa.Table]:
    """Build a PartitionedBloom over ``ds[column]``.

    Strategies (result bits are identical — OR-merge commutativity, tested):

    - ``mode="partial"``: every block builds a full-geometry partial filter inside
      ``map_batches`` (combiner; NO row shuffle), partials OR-merge through a
      fan-in stage. Bytes moved = #blocks × m/8 — the right choice while the
      packed filter fits a worker comfortably.
    - ``mode="shuffle"``: hash stage → ``groupby(shard)`` → per-shard build. Rows
      move once; per-worker memory is m/(8·num_shards) — the right choice when m
      is too large to replicate per block (the 10^12-row regime).
    - ``mode="auto"``: partial while the per-task filter stays RAM-friendly
      (total m ≤ 1 Gbit ⇒ 128 MB packed words per task; the sketch switches to
      its packed representation above 128 Mbit), else shuffle.

    Returns ``(filter, lineage)``; lineage rows are per shard (shuffle) or per
    input block (partial): ``(shard|block, rows_in, build_ms, state_bytes)``.
    """
    if algo not in ("classic",):
        # fail BEFORE the distributed hash+shuffle+build, not at the final
        # PartitionedBloom assemble (which would waste the whole job)
        raise ValueError(
            f"build_partitioned_bloom supports algo='classic' (got {algo!r}); "
            "blocked layouts are single-filter BloomSketch variants"
        )
    per_shard_capacity = max(1, math.ceil(capacity / num_shards))
    if mode == "auto":
        from raysketch.sketches.bloom import bloom_geometry

        m_per_shard, _ = bloom_geometry(per_shard_capacity, fp_rate)
        mode = "partial" if m_per_shard * num_shards <= (1 << 30) else "shuffle"
    if mode == "partial":
        return _build_partial(
            ds, column, capacity, fp_rate, num_shards, hash_algo, seeds, algo
        )

    hashed = ds.map_batches(
        lambda b: add_hash_columns(b, column, num_shards, hash_algo, seeds),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    shard_rows = _shuffle_build_rows(
        hashed,
        num_shards,
        lambda: BloomSketch(per_shard_capacity, fp_rate, algo=algo, hash_algo=hash_algo, seeds=seeds),
    )

    pb = PartitionedBloom(
        capacity, fp_rate, num_shards=num_shards, algo=algo, hash_algo=hash_algo, seeds=seeds
    )
    lineage_cols = {"shard": [], "rows_in": [], "build_ms": [], "state_bytes": []}
    for row in shard_rows:
        sid = int(row["shard"])
        pb.set_shard(sid, BloomSketch.from_bytes(row["state"]))
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


def _shuffle_build_rows(
    hashed,
    num_shards: int,
    make_shard_sketch,
    num_blocks: int | None = None,
    on_shard=None,
    as_dataset: bool = False,
):
    """Hash-shuffle ``(h1, h2, shard)`` rows so each output block holds whole
    shards (Ray's HASH_SHUFFLE ``repartition(keys=["shard"])``), then build every
    shard of a block in one vectorized task (shard boundaries via one argsort —
    no per-group Python dispatch, the owner-compute pattern of gloom.h:113-140).

    Returns the list of per-shard rows ``{shard, state, rows_in, build_ms,
    state_bytes}`` — or, with ``as_dataset=True``, the MATERIALIZED Dataset of
    those rows (shard blobs stay in object-store blocks; nothing transits the
    driver)."""
    from ray.data.context import ShuffleStrategy

    # each Dataset snapshots its DataContext at creation — flip the captured copy
    ctx = hashed.context
    prev = ctx.shuffle_strategy
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    try:
        if num_blocks is None:
            # HASH_SHUFFLE spawns one aggregator per output block — cap by the
            # cluster's CPU count so a small session isn't flooded with workers
            import ray

            ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
            num_blocks = max(8, min(num_shards, 64, ncpu * 2))
        parts = hashed.repartition(num_blocks=num_blocks, keys=["shard"])

        def build_block(batch: pa.Table) -> pa.Table:
            t_start = time.perf_counter()
            sid = np.asarray(batch.column("shard").combine_chunks())
            h1 = batch.column("h1").combine_chunks().to_numpy()
            h2 = batch.column("h2").combine_chunks().to_numpy()
            order = np.argsort(sid, kind="stable")
            sid_s, h1_s, h2_s = sid[order], h1[order], h2[order]
            uniq, starts = np.unique(sid_s, return_index=True)
            bounds = np.append(starts, len(sid_s))
            out = {"shard": [], "state": [], "rows_in": [], "build_ms": [], "state_bytes": []}
            for j, s in enumerate(uniq):
                t0 = time.perf_counter()
                sk = make_shard_sketch()
                sk.update_hashes(h1_s[bounds[j] : bounds[j + 1]], h2_s[bounds[j] : bounds[j + 1]])
                blob = sk.to_bytes()
                if on_shard is not None:
                    # task-side side effect (e.g. atomic checkpoint write) — runs
                    # where the shard was built, before anything returns upstream
                    on_shard(int(s), blob, int(bounds[j + 1] - bounds[j]), (time.perf_counter() - t0) * 1000)
                out["shard"].append(int(s))
                out["state"].append(blob)
                out["rows_in"].append(int(bounds[j + 1] - bounds[j]))
                out["build_ms"].append((time.perf_counter() - t0) * 1000)
                out["state_bytes"].append(len(blob))
            return pa.table(
                {
                    "shard": pa.array(out["shard"], pa.int32()),
                    "state": pa.array(out["state"], pa.binary()),
                    "rows_in": pa.array(out["rows_in"], pa.int64()),
                    "build_ms": pa.array(out["build_ms"], pa.float64()),
                    "state_bytes": pa.array(out["state_bytes"], pa.int64()),
                }
            )

        built = parts.map_batches(build_block, batch_format="pyarrow", batch_size=None)
        if as_dataset:
            # materialize INSIDE the strategy window (the captured context is
            # restored in finally; a lazy return would execute under the old one)
            return built.materialize()
        return built.take_all()
    finally:
        ctx.shuffle_strategy = prev


def _build_partial(
    ds,
    column: str,
    capacity: int,
    fp_rate: float,
    num_shards: int,
    hash_algo: str,
    seeds: tuple[int, int],
    algo: str,
    partial_rows: int = 262_144,
) -> tuple[PartitionedBloom, pa.Table]:
    """Shuffle-free strategy: per-block full-geometry partials, OR-merged fan-in.

    ``partial_rows`` bundles small input blocks into uniform partials: big enough
    to amortize the per-partial filter allocation + serialization, small enough
    that straggler tasks (noisy-CPU hosts) don't dominate the wall clock."""

    def make():
        return PartitionedBloom(
            capacity, fp_rate, num_shards=num_shards, algo=algo, hash_algo=hash_algo, seeds=seeds
        )

    def partial(batch: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        sk = make()
        sk.update_column(batch.column(column).combine_chunks())
        blob = sk.to_bytes()
        ms = (time.perf_counter() - t0) * 1000
        return pa.table(
            {
                "state": pa.array([blob], type=pa.binary()),
                "rows_in": pa.array([batch.num_rows], type=pa.int64()),
                "build_ms": pa.array([ms], type=pa.float64()),
                "state_bytes": pa.array([len(blob)], type=pa.int64()),
            }
        )

    # materialized so the lineage projection and the merge fan-in share one
    # execution (partials are the checkpoint-able unit anyway)
    parts = ds.select_columns([column]).map_batches(
        partial, batch_format="pyarrow", batch_size=partial_rows, zero_copy_batch=True
    ).materialize()

    def merge_batch(batch: pa.Table) -> pa.Table:
        # packed-level OR merge — never unpacks the bit arrays
        blob = PartitionedBloom.merge_blobs(
            batch.column("state")[i].as_py() for i in range(batch.num_rows)
        )
        return pa.table(
            {
                "state": pa.array([blob], type=pa.binary()),
                "rows_in": pa.array(
                    [int(pa.compute.sum(batch.column("rows_in")).as_py() or 0)], type=pa.int64()
                ),
                "build_ms": pa.array(
                    [float(pa.compute.sum(batch.column("build_ms")).as_py() or 0.0)],
                    type=pa.float64(),
                ),
                "state_bytes": pa.array([len(blob)], type=pa.int64()),
            }
        )

    lineage_rows = parts.map_batches(
        lambda b: b.drop_columns(["state"]), batch_format="pyarrow"
    )
    reduced = parts.map_batches(merge_batch, batch_format="pyarrow", batch_size=16)
    rows = reduced.take_all()
    acc = PartitionedBloom.from_bytes(
        PartitionedBloom.merge_blobs(r["state"] for r in rows)
    )
    # per-block lineage (block index implicit in row order)
    lin = lineage_rows.to_pandas()
    lin.insert(0, "block", range(len(lin)))
    lineage = pa.Table.from_pandas(lin, preserve_index=False)
    return acc, lineage


# ---------------------------------------------------------------------------
# shard-ref build: the filter never transits the driver
# ---------------------------------------------------------------------------


class ShardedBloom:
    """A partitioned Bloom whose shard blobs live ONLY in object-store blocks —
    the 10^12-key regime where the assembled filter (~TB of bits) must never
    transit or reside in driver memory (the reference keeps it worker-owned the
    same way: per-shard sub-filters behind owner threads, gloom.h:216-230).

    The driver holds three small things: the geometry, a list of block
    ``ObjectRef``s (the materialized build Dataset pins their lifetime), and a
    ``shard → block`` routing array. Probing hash-shuffles probe rows to whole-
    shard blocks and each probe task fetches only the build blocks its shards
    live in (``probe.probe_partitioned_shuffle`` dispatches on this type).

    Shards that received zero rows have no block (``shard_block[s] == -1``);
    probes routed there are definitively absent — the empty-filter semantics.
    """

    def __init__(
        self,
        capacity: int,
        fp_rate: float,
        num_shards: int,
        algo: str,
        hash_algo: str,
        seeds: tuple[int, int],
        blocks,
        block_refs: list,
        shard_block: np.ndarray,
    ):
        self.capacity = capacity
        self.fp_rate = fp_rate
        self.num_shards = num_shards
        self.algo = algo
        self.hash_algo = hash_algo
        self.seeds = tuple(seeds)
        self._blocks = blocks  # MaterializedDataset — keeps block objects alive
        self.block_refs = list(block_refs)
        self.shard_block = np.asarray(shard_block, dtype=np.int32)

    @property
    def per_shard_capacity(self) -> int:
        return max(1, math.ceil(self.capacity / self.num_shards))

    def driver_bytes(self) -> int:
        """Bytes of filter state the DRIVER actually holds: the routing array
        plus ~64 B per block ref — never any shard blob. The test gate asserts
        this stays tiny while the distributed filter is arbitrarily large."""
        return int(self.shard_block.nbytes) + 64 * len(self.block_refs)

    def to_partitioned(self) -> PartitionedBloom:
        """ESCAPE HATCH for filters that fit driver memory (tests, small jobs):
        collects every shard blob to the driver — exactly what this class exists
        to avoid at scale. Bitwise-equal to a driver-assembled build."""
        import ray

        pb = PartitionedBloom(
            self.capacity,
            self.fp_rate,
            num_shards=self.num_shards,
            algo=self.algo,
            hash_algo=self.hash_algo,
            seeds=self.seeds,
        )
        for tbl in ray.get(self.block_refs):
            for i in range(tbl.num_rows):
                pb.set_shard(
                    int(tbl.column("shard")[i].as_py()),
                    BloomSketch.from_bytes(tbl.column("state")[i].as_py()),
                )
        return pb


def _refs_from_blocks(blocks, num_shards: int):
    """Recover ``(block_refs, shard→block routing, lineage)`` from a
    materialized per-shard build Dataset. Tiny remote tasks project ``state``
    away block-side — blob bytes never cross to the driver."""
    import ray

    block_refs = [r for bundle in blocks.iter_internal_ref_bundles() for r in bundle.block_refs]

    @ray.remote(num_cpus=0)
    def _lineage_of(tbl: pa.Table) -> pa.Table:
        if "state" not in tbl.column_names:
            # skipped-empty keyed blocks are SCHEMA-LESS (the documented
            # empty-Dataset gotcha) — emit a typed empty lineage row instead
            return pa.table(
                {
                    "shard": pa.array([], pa.int32()),
                    "rows_in": pa.array([], pa.int64()),
                    "build_ms": pa.array([], pa.float64()),
                    "state_bytes": pa.array([], pa.int64()),
                }
            )
        return tbl.drop_columns(["state"])  # shard, rows_in, build_ms, state_bytes

    metas = ray.get([_lineage_of.remote(r) for r in block_refs])
    shard_block = np.full(num_shards, -1, dtype=np.int32)
    keep = []
    for i, m in enumerate(metas):
        if m.num_rows == 0:
            continue
        shard_block[np.asarray(m.column("shard"))] = i
        keep.append(m)
    lineage = (
        pa.concat_tables(keep)
        if keep
        else pa.table(
            {
                "shard": pa.array([], pa.int32()),
                "rows_in": pa.array([], pa.int64()),
                "build_ms": pa.array([], pa.float64()),
                "state_bytes": pa.array([], pa.int64()),
            }
        )
    )
    return block_refs, shard_block, lineage


def build_partitioned_bloom_refs(
    ds,
    column: str,
    capacity: int,
    fp_rate: float = 0.01,
    num_shards: int = 64,
    hash_algo: str = "xxh64",
    seeds: tuple[int, int] = CLASSIC_SEEDS,
    algo: str = "classic",
    num_blocks: int | None = None,
    ckpt_dir: str | None = None,
) -> tuple[ShardedBloom, pa.Table]:
    """``build_partitioned_bloom(mode="shuffle")`` without the driver assembly:
    the per-shard build blocks stay in the object store; the driver receives a
    :class:`ShardedBloom` handle (refs + routing) and the lineage table.

    The shard→block routing and the lineage are recovered by tiny remote tasks
    that project ``state`` away block-side — blob bytes never cross to the
    driver. Per-probe-task memory downstream is O(total bits × shards-touched /
    num_shards); raise ``num_blocks`` toward ``num_shards`` to tighten the
    bound at very large ``m``.

    ``ckpt_dir`` unifies this with checkpoint/resume (r5): the shard tasks
    write atomic per-shard Parquet checkpoints (``checkpoint.py`` layout —
    ``probe_partitioned_ckpt`` / ``extend_checkpointed_bloom`` interoperate),
    a re-run rebuilds only missing shards, and the returned handle is loaded
    back from the checkpoint via :func:`checkpoint.load_sharded_bloom` — so a
    10^12-key filter survives driver restarts without ever transiting one.
    """
    if algo not in ("classic",):
        raise ValueError(f"build_partitioned_bloom_refs supports algo='classic' (got {algo!r})")
    if ckpt_dir is not None:
        from raysketch.pipeline.checkpoint import (
            _ensure_bloom_checkpoint,
            load_sharded_bloom,
        )

        _ensure_bloom_checkpoint(
            ds,
            column,
            capacity,
            ckpt_dir,
            fp_rate=fp_rate,
            num_shards=num_shards,
            hash_algo=hash_algo,
            seeds=seeds,
            algo=algo,
        )
        return load_sharded_bloom(ckpt_dir, num_blocks=num_blocks)
    per_shard_capacity = max(1, math.ceil(capacity / num_shards))

    hashed = ds.map_batches(
        lambda b: add_hash_columns(b, column, num_shards, hash_algo, seeds),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    blocks = _shuffle_build_rows(
        hashed,
        num_shards,
        lambda: BloomSketch(per_shard_capacity, fp_rate, algo=algo, hash_algo=hash_algo, seeds=seeds),
        num_blocks=num_blocks,
        as_dataset=True,
    )
    block_refs, shard_block, lineage = _refs_from_blocks(blocks, num_shards)
    sb = ShardedBloom(
        capacity, fp_rate, num_shards, algo, hash_algo, seeds, blocks, block_refs, shard_block
    )
    return sb, lineage
