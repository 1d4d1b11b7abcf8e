"""Checkpoint / resume with per-partition lineage (north-rule requirement).

Layout (the resumable-output discipline): one Parquet file PER SHARD under the
checkpoint directory, written atomically (temp file + rename) by the task that
built the shard, plus a ``manifest.json`` with the build parameters. A resumed run
lists the directory, skips finished shards, and rebuilds only the missing ones from
the input (their lineage); this is what checkpoint/resume means for a batch
pipeline (reference has none — SURVEY.md §4 "Checkpoint/resume: design (mandated)").

Each shard file carries ``(shard, state, rows_in, build_ms, state_bytes)`` — state
blob + lineage + metrics in one row.
"""

from __future__ import annotations

import json
import math
import os
import time
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raysketch.hashing import CLASSIC_SEEDS
from raysketch.pipeline.partitioned import add_hash_columns
from raysketch.sketches.bloom import BloomSketch, PartitionedBloom


def _atomic_write_table(tbl: pa.Table, path: str) -> None:
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)


def _shard_path(ckpt_dir: str, sid: int) -> str:
    return os.path.join(ckpt_dir, f"shard-{sid:05d}.parquet")


def finished_shards(ckpt_dir: str) -> set[int]:
    if not os.path.isdir(ckpt_dir):
        return set()
    out = set()
    for f in os.listdir(ckpt_dir):
        if f.startswith("shard-") and f.endswith(".parquet"):
            out.add(int(f[len("shard-") : -len(".parquet")]))
    return out


def checkpointed_partitioned_bloom(
    ds,
    column: str,
    capacity: int,
    ckpt_dir: str,
    fp_rate: float = 0.01,
    num_shards: int = 64,
    hash_algo: str = "xxh64",
    seeds: tuple[int, int] = CLASSIC_SEEDS,
    algo: str = "classic",
    input_files: list[str] | None = None,
) -> tuple[PartitionedBloom, pa.Table]:
    """Build (or resume) a partitioned Bloom with per-shard checkpoints.

    Only rows routed to UNFINISHED shards cross the shuffle on resume — finished
    shards are filtered out right after the hash stage, before any row moves.
    """
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
        input_files=input_files,
    )
    return load_partitioned_bloom(ckpt_dir)


def _ensure_bloom_checkpoint(
    ds,
    column: str,
    capacity: int,
    ckpt_dir: str,
    fp_rate: float = 0.01,
    num_shards: int = 64,
    hash_algo: str = "xxh64",
    seeds: tuple[int, int] = CLASSIC_SEEDS,
    algo: str = "classic",
    input_files: list[str] | None = None,
) -> None:
    """Build (or resume) the per-shard checkpoint files WITHOUT any driver
    assembly — the shared core of :func:`checkpointed_partitioned_bloom`
    (driver-held load), :func:`load_sharded_bloom` (refs handle), and
    :func:`epoch_dedup`'s first epoch (which needs only the files)."""
    if algo not in ("classic",):
        # fail before any shard checkpoint is written (PartitionedBloom would
        # reject the algo only at final load — after the whole distributed build)
        raise ValueError(
            f"checkpointed_partitioned_bloom supports algo='classic' (got {algo!r})"
        )
    os.makedirs(ckpt_dir, exist_ok=True)
    manifest_path = os.path.join(ckpt_dir, "manifest.json")
    params = {
        "column": column,
        "capacity": capacity,
        "fp_rate": fp_rate,
        "num_shards": num_shards,
        "hash_algo": hash_algo,
        "seeds": list(seeds),
        "algo": algo,
        "input_files": input_files or [],
    }
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            prev = json.load(f)
        if {k: prev.get(k) for k in params if k != "input_files"} != {
            k: v for k, v in params.items() if k != "input_files"
        }:
            raise ValueError(f"checkpoint {ckpt_dir} was built with different parameters")
    else:
        with open(manifest_path, "w") as f:
            json.dump(params, f, indent=2, sort_keys=True)

    done = finished_shards(ckpt_dir)
    missing = sorted(set(range(num_shards)) - done)
    per_shard_capacity = max(1, math.ceil(capacity / num_shards))

    if missing:
        missing_arr = np.array(missing, dtype=np.int32)

        def hash_and_filter(batch: pa.Table) -> pa.Table:
            out = add_hash_columns(batch, column, num_shards, hash_algo, seeds)
            sid = np.asarray(out.column("shard"))
            keep = np.isin(sid, missing_arr)
            return out.filter(pa.array(keep))

        hashed = ds.map_batches(hash_and_filter, batch_format="pyarrow", zero_copy_batch=True)

        # hash-shuffle so each block holds whole shards; one vectorized build task
        # per block writes each of its shards' checkpoint files atomically
        from raysketch.pipeline.partitioned import _shuffle_build_rows

        def make_shard():
            return BloomSketch(per_shard_capacity, fp_rate, algo=algo, hash_algo=hash_algo, seeds=seeds)

        def write_checkpoint(sid: int, blob: bytes, rows_in: int, ms: float) -> None:
            tbl = pa.table(
                {
                    "shard": pa.array([sid], type=pa.int32()),
                    "state": pa.array([blob], type=pa.binary()),
                    "rows_in": pa.array([rows_in], type=pa.int64()),
                    "build_ms": pa.array([ms], type=pa.float64()),
                    "state_bytes": pa.array([len(blob)], type=pa.int64()),
                }
            )
            _atomic_write_table(tbl, _shard_path(ckpt_dir, sid))

        _shuffle_build_rows(hashed, num_shards, make_shard, on_shard=write_checkpoint)

        # shards that received zero rows still need a (empty) checkpoint file
        for sid in sorted(set(missing) - finished_shards(ckpt_dir)):
            sk = BloomSketch(per_shard_capacity, fp_rate, algo=algo, hash_algo=hash_algo, seeds=seeds)
            blob = sk.to_bytes()
            row = pa.table(
                {
                    "shard": pa.array([sid], type=pa.int32()),
                    "state": pa.array([blob], type=pa.binary()),
                    "rows_in": pa.array([0], type=pa.int64()),
                    "build_ms": pa.array([0.0], type=pa.float64()),
                    "state_bytes": pa.array([len(blob)], type=pa.int64()),
                }
            )
            _atomic_write_table(row, _shard_path(ckpt_dir, sid))


def load_sharded_bloom(ckpt_dir: str, num_blocks: int | None = None):
    """Assemble a :class:`partitioned.ShardedBloom` handle + lineage from a
    COMPLETE checkpoint directory WITHOUT the blobs ever transiting the
    driver: shard files are read into object-store blocks by Ray tasks and
    the routing/lineage recovery reuses the refs-build remote projection.
    The restart story for the 10^12-key filter (VERDICT r4 next-round #4)."""
    import ray

    from raysketch.pipeline.partitioned import ShardedBloom, _refs_from_blocks

    with open(os.path.join(ckpt_dir, "manifest.json")) as f:
        params = json.load(f)
    num_shards = int(params["num_shards"])
    done = finished_shards(ckpt_dir)
    if done != set(range(num_shards)):
        raise ValueError(
            f"checkpoint incomplete: {len(done)}/{num_shards} shards at {ckpt_dir}"
        )
    files = [_shard_path(ckpt_dir, sid) for sid in range(num_shards)]
    if num_blocks is None:
        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        num_blocks = max(8, min(num_shards, 64, ncpu * 2))
    blocks = ray.data.read_parquet(
        files, override_num_blocks=min(num_blocks, num_shards)
    ).materialize()
    block_refs, shard_block, lineage = _refs_from_blocks(blocks, num_shards)
    sb = ShardedBloom(
        params["capacity"],
        params["fp_rate"],
        num_shards,
        params["algo"],
        params["hash_algo"],
        tuple(params["seeds"]),
        blocks,
        block_refs,
        shard_block,
    )
    return sb, lineage


def load_partitioned_bloom(ckpt_dir: str) -> tuple[PartitionedBloom, pa.Table]:
    """Assemble the filter + lineage table from a completed checkpoint directory."""
    with open(os.path.join(ckpt_dir, "manifest.json")) as f:
        params = json.load(f)
    num_shards = params["num_shards"]
    done = finished_shards(ckpt_dir)
    if done != set(range(num_shards)):
        raise ValueError(
            f"checkpoint incomplete: {len(done)}/{num_shards} shards at {ckpt_dir}"
        )
    pb = PartitionedBloom(
        params["capacity"],
        params["fp_rate"],
        num_shards=num_shards,
        algo=params["algo"],
        hash_algo=params["hash_algo"],
        seeds=tuple(params["seeds"]),
    )
    rows = []
    for sid in range(num_shards):
        tbl = pq.read_table(_shard_path(ckpt_dir, sid))
        pb.set_shard(sid, BloomSketch.from_bytes(tbl.column("state")[0].as_py()))
        rows.append(tbl.drop_columns(["state"]))
    lineage = pa.concat_tables(rows)
    return pb, lineage


def _key_shard_ids(key_col: pa.Array, num_shards: int) -> np.ndarray:
    """Stable shard id per key: xxh64 of the key's STRING form (the same form
    ``build_keyed_sketch`` emits), mod num_shards."""
    import pyarrow.compute as pc

    from raysketch.hashing import hash_column

    s = pc.cast(key_col.combine_chunks() if isinstance(key_col, pa.ChunkedArray) else key_col, pa.string())
    return (hash_column(s, algo="xxh64", seed=0) % np.uint64(num_shards)).astype(np.int32)


def checkpointed_keyed_sketch(
    ds,
    key: str,
    column: str,
    make_sketch,
    ckpt_dir: str,
    num_shards: int = 16,
    input_files: list[str] | None = None,
) -> pa.Table:
    """Build (or resume) a per-KEY sketch table with per-key-shard checkpoints.

    Keys hash into ``num_shards`` resumable units; a resumed run filters input
    rows to UNFINISHED key-shards before the partial stage (finished shards cost
    zero input scan work past the filter), rebuilds only those, and returns the
    assembled ``(key, state, rows_in)`` table. Shard files are written atomically;
    the keyed result is small by construction (one fixed-size blob per key), so
    the shard write happens where the table already lives after the two-level
    build. Same layout discipline as ``checkpointed_partitioned_bloom``."""
    from raysketch.pipeline.build import build_keyed_sketch

    os.makedirs(ckpt_dir, exist_ok=True)
    probe = make_sketch()
    manifest_path = os.path.join(ckpt_dir, "manifest.json")
    params = {
        "key": key,
        "column": column,
        "num_shards": num_shards,
        "sketch_kind": getattr(probe, "kind", type(probe).__name__),
        "input_files": input_files or [],
    }
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            prev = json.load(f)
        if {k: prev.get(k) for k in params if k != "input_files"} != {
            k: v for k, v in params.items() if k != "input_files"
        }:
            raise ValueError(f"checkpoint {ckpt_dir} was built with different parameters")
    else:
        with open(manifest_path, "w") as f:
            json.dump(params, f, indent=2, sort_keys=True)

    done = finished_shards(ckpt_dir)
    missing = sorted(set(range(num_shards)) - done)
    if missing:
        missing_arr = np.array(missing, dtype=np.int32)

        def filt(batch: pa.Table) -> pa.Table:
            sid = _key_shard_ids(batch.column(key), num_shards)
            return batch.filter(pa.array(np.isin(sid, missing_arr)))

        sub = ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)
        tbl = build_keyed_sketch(sub, key, column, make_sketch)
        sid = (
            _key_shard_ids(tbl.column(key), num_shards)
            if tbl.num_rows
            else np.empty(0, dtype=np.int32)
        )
        for s in missing:
            part = tbl.filter(pa.array(sid == s)) if tbl.num_rows else tbl
            part = part.append_column("shard", pa.array(np.full(part.num_rows, s, dtype=np.int32)))
            _atomic_write_table(part, _shard_path(ckpt_dir, s))

    parts = [pq.read_table(_shard_path(ckpt_dir, s)) for s in range(num_shards)]
    out = pa.concat_tables(parts).drop_columns(["shard"])
    order = pa.compute.sort_indices(out.column(key))
    return out.take(order)


def save_sketch(sketch, path: str) -> None:
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "wb") as f:
        f.write(sketch.to_bytes())
    os.replace(tmp, path)


def load_sketch(path: str):
    from raysketch.sketches.base import sketch_from_bytes

    with open(path, "rb") as f:
        return sketch_from_bytes(f.read())


def extend_checkpointed_bloom(ds, ckpt_dir: str, input_files: list[str] | None = None):
    """Fold a NEW epoch's keys into an existing checkpointed filter: delta
    shard builds with the manifest's exact geometry, OR-merged into each
    shard's checkpoint file atomically by the task that owns the shard.

    Safety model: each shard is handled by exactly one task of the keyed
    build; the read-OR-write is atomic per shard (temp + rename). If a run
    dies mid-extend, re-running it re-ORs the SAME delta bits — the
    idempotent-OR property (the reference's race-tolerance insight,
    parallel_bloom.h; COVERAGE.md row 8) makes the retry harmless for
    membership. The ``rows_in`` lineage counter is advisory and may
    double-count across a retried extend."""
    manifest_path = os.path.join(ckpt_dir, "manifest.json")
    with open(manifest_path) as f:
        params = json.load(f)
    num_shards = params["num_shards"]
    if finished_shards(ckpt_dir) != set(range(num_shards)):
        raise ValueError(f"extend requires a COMPLETE checkpoint at {ckpt_dir}")
    column = params["column"]
    per_shard_capacity = max(1, math.ceil(params["capacity"] / num_shards))
    seeds = tuple(params["seeds"])

    def hash_all(batch: pa.Table) -> pa.Table:
        return add_hash_columns(batch, column, num_shards, params["hash_algo"], seeds)

    hashed = ds.map_batches(hash_all, batch_format="pyarrow", zero_copy_batch=True)

    def make_shard():
        return BloomSketch(
            per_shard_capacity,
            params["fp_rate"],
            algo=params["algo"],
            hash_algo=params["hash_algo"],
            seeds=seeds,
        )

    def or_into_checkpoint(sid: int, blob: bytes, rows_in: int, ms: float) -> None:
        path = _shard_path(ckpt_dir, sid)
        old = pq.read_table(path)
        merged = BloomSketch.from_bytes(old.column("state")[0].as_py()).merge(
            BloomSketch.from_bytes(blob)
        )
        mb = merged.to_bytes()
        tbl = pa.table(
            {
                "shard": pa.array([sid], type=pa.int32()),
                "state": pa.array([mb], type=pa.binary()),
                "rows_in": pa.array(
                    [int(old.column("rows_in")[0].as_py()) + rows_in], type=pa.int64()
                ),
                "build_ms": pa.array(
                    [float(old.column("build_ms")[0].as_py()) + ms], type=pa.float64()
                ),
                "state_bytes": pa.array([len(mb)], type=pa.int64()),
            }
        )
        _atomic_write_table(tbl, path)

    from raysketch.pipeline.partitioned import _shuffle_build_rows

    _shuffle_build_rows(hashed, num_shards, make_shard, on_shard=or_into_checkpoint)


def epoch_dedup(
    new_docs,
    ckpt_dir: str,
    column: str = "text",
    *,
    capacity: int | None = None,
    fp_rate: float = 0.01,
    num_shards: int = 64,
    keep: tuple[str, ...] = (),
):
    """One epoch step of incremental corpus dedup (the production shape of the
    ``dedup_incremental`` contract query): anti-join the new epoch against the
    prior-epochs filter checkpoint, return the genuinely-new rows as a
    Dataset, and fold THEIR keys into the checkpoint for the next epoch.

    First epoch (no manifest yet): builds the checkpoint from ``new_docs``
    (``capacity`` required — size it for the TOTAL corpus across epochs, not
    one epoch) and returns ``new_docs`` unchanged. Exact-negative semantics:
    a kept row is guaranteed not to repeat any prior-epoch key; a genuinely
    new row is dropped only at the filter's false-positive rate."""
    from raysketch.pipeline.probe import probe_partitioned_ckpt

    manifest_path = os.path.join(ckpt_dir, "manifest.json")
    if not os.path.exists(manifest_path):
        if capacity is None:
            raise ValueError("first epoch: capacity (total-corpus scale) is required")
        # files only — epoch probes/extends read them task-side, so the filter
        # never assembles on the driver at any epoch (the refs-path unification)
        _ensure_bloom_checkpoint(
            new_docs,
            column,
            capacity,
            ckpt_dir,
            fp_rate=fp_rate,
            num_shards=num_shards,
        )
        return new_docs
    keep_cols = tuple(keep) or tuple(
        c for c in new_docs.schema().names if c != column
    )
    probed = probe_partitioned_ckpt(
        new_docs, ckpt_dir, column, keep=tuple(dict.fromkeys((*keep_cols, column)))
    )
    fresh = probed.filter(expr="member == False").drop_columns(["member"]).materialize()
    if fresh.count():
        extend_checkpointed_bloom(fresh, ckpt_dir)
    return fresh
