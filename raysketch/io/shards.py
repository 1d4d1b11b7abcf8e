"""Resumable sharded Parquet corpus export.

The instruction-level contract for 100 TB outputs: write partitioned Parquet
(one file per key bucket) so a failed run can skip finished partitions —
never one giant file, never a driver-side funnel. Rows route to
``shard = key % num_shards`` (integer keys; floored mod — SQL
``((key % n) + n) % n``) or
``xxh64(key) % num_shards``; each shard is written atomically (temp +
rename) by the worker task that owns it, like
``checkpoint._atomic_write_table``. A re-run with the same ``out_dir``
drops rows of finished shards task-side BEFORE the exchange — the resume
cost is proportional to the missing shards' data only.

Reference anchor: the static range partitioner + per-partition output loop
this replaces (simple_benchmark.cpp partition/append loop); the atomic
shard discipline is shared with raysketch/pipeline/checkpoint.py.
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq



def _shard_file(out_dir: str, sid: int) -> str:
    return os.path.join(out_dir, f"part-{sid:05d}.parquet")


def finished_parts(out_dir: str) -> set[int]:
    if not os.path.isdir(out_dir):
        return set()
    out = set()
    for f in os.listdir(out_dir):
        if f.startswith("part-") and f.endswith(".parquet"):
            out.add(int(f[len("part-") : -len(".parquet")]))
    return out


def write_corpus_shards(
    ds,
    out_dir: str,
    *,
    key_col: str = "doc_id",
    num_shards: int = 16,
    shard_fn: str = "mod",
    sort_within: bool = True,
):
    """Write ``ds`` as ``num_shards`` Parquet files under ``out_dir``,
    resumably. Returns a summary DataFrame ``(shard, n_rows, skipped)`` —
    bounded by ``num_shards``, never the data.

    ``shard_fn="mod"``: shard = key % num_shards under numpy's FLOORED
    modulo — always non-negative, so the matching SQL expression is
    ``((key % n) + n) % n`` (DuckDB's plain ``%`` follows the dividend's
    sign and diverges on negative keys; for non-negative keys the two are
    identical). ``"hash"``: xxh64(key) % num_shards (any key type,
    balanced under adversarial keys).
    ``sort_within`` sorts each shard by key before writing so shard files
    are byte-deterministic across runs and cluster shapes.
    """
    import pandas as pd
    import ray
    from ray.data.context import ShuffleStrategy

    from raysketch.hashing import hash_column
    from raysketch.pipeline.dedup import _num_partitions

    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "manifest.json")
    params = {"key_col": key_col, "num_shards": num_shards, "shard_fn": shard_fn}
    if os.path.exists(manifest_path):
        prev = json.load(open(manifest_path))
        if prev != params:
            raise ValueError(
                f"resume parameter mismatch: manifest {prev} vs requested {params}"
            )
    else:
        tmp = f"{manifest_path}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(params, f)
        os.replace(tmp, manifest_path)

    done = finished_parts(out_dir)
    skipped = sorted(done)

    def shard_of(batch: pa.Table) -> np.ndarray:
        if shard_fn == "mod":
            # a null int64 key would float64-convert to NaN whose int64 cast
            # is platform-defined — nondeterministic routing breaks the resume
            # contract (shard membership must be stable across runs).
            if batch.column(key_col).null_count:
                raise ValueError(
                    f"write_corpus_shards[mod]: key column {key_col!r} "
                    "contains nulls — NaN→int64 routing is platform-defined "
                    "and would break resume determinism. Use "
                    "shard_fn='hash' (routes nulls deterministically, "
                    "hashing null as the empty string) or fill_null first."
                )
            keys = np.asarray(batch.column(key_col))
            return (keys % num_shards).astype(np.int64)
        h = hash_column(batch.column(key_col).combine_chunks(), algo="xxh64", seed=0)
        return (h % np.uint64(num_shards)).astype(np.int64)

    def route(batch: pa.Table) -> pa.Table:
        sid = shard_of(batch)
        keep = ~np.isin(sid, np.fromiter(done, dtype=np.int64)) if done else None
        batch = batch.append_column("__shard", pa.array(sid))
        if keep is not None and not bool(keep.all()):
            batch = batch.filter(pa.array(keep))
        return batch

    routed = ds.map_batches(route, batch_format="pyarrow", zero_copy_batch=True)
    routed.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    npart = max(_num_partitions(), min(num_shards, 64))
    routed.context.default_hash_shuffle_parallelism = npart
    parts = routed.repartition(num_blocks=npart, keys=["__shard"])

    def write_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"shard": pa.array([], pa.int64()), "n_rows": pa.array([], pa.int64())})
        sid = np.asarray(batch.column("__shard"))
        body = batch.drop_columns(["__shard"])
        out_s, out_n = [], []
        for s in np.unique(sid):
            rows = body.filter(pa.array(sid == s))
            if sort_within:
                rows = rows.sort_by(key_col)
            tmp = f"{_shard_file(out_dir, int(s))}.tmp-{uuid.uuid4().hex[:8]}"
            pq.write_table(rows, tmp)
            os.replace(tmp, _shard_file(out_dir, int(s)))
            out_s.append(int(s))
            out_n.append(rows.num_rows)
        return pa.table(
            {"shard": pa.array(out_s, pa.int64()), "n_rows": pa.array(out_n, pa.int64())}
        )

    written = parts.map_batches(write_block, batch_format="pyarrow", batch_size=None).to_pandas()
    if len(written) == 0 or "shard" not in written.columns:
        written = pd.DataFrame({"shard": [], "n_rows": []})
    rows = [
        {"shard": int(r["shard"]), "n_rows": int(r["n_rows"]), "skipped": False}
        for _, r in written.iterrows()
    ]
    for s in skipped:
        n = pq.read_metadata(_shard_file(out_dir, s)).num_rows
        rows.append({"shard": s, "n_rows": int(n), "skipped": True})
    out = pd.DataFrame(rows).sort_values("shard", ignore_index=True)
    return out


def read_corpus_shards(out_dir: str):
    """Read a sharded export back as one Dataset (streaming, one block per
    shard file)."""
    import ray

    files = [
        os.path.join(out_dir, f)
        for f in sorted(os.listdir(out_dir))
        if f.startswith("part-") and f.endswith(".parquet")
    ]
    return ray.data.read_parquet(files)
