"""Cluster job entrypoint — the north rule's ``ray job submit`` surface.

Submit against a running cluster (the job driver runs on the head node; Ray is
initialised from RAY_ADDRESS by the job runtime)::

    ray job submit --working-dir /root/repo -- \
        python tools/job_entry.py --input /data/webpages \
        --ckpt-dir /ckpt/run1 --output /out/run1 \
        --capacity 1000000000 --num-shards 1024

Pipeline (the SURVEY north-star shape): read Common-Crawl-style parquet
(url, html, lang) with column pruning → vectorized ``extract_text`` (html
projected away immediately) → per-lang HLL of urls (skew-safe two-level build)
+ CHECKPOINTED partitioned-Bloom build over urls. Every shard checkpoint is an
atomic parquet file; a resubmitted job re-shuffles only rows routed to
unfinished shards, so the run is resumable mid-build. Outputs:

- ``<ckpt-dir>/shard-*.parquet``  per-shard filter state + lineage (resume unit)
- ``<output>/lang_url_counts.parquet``  per-lang HLL estimates
- ``<output>/metrics.json``  rows, wall time per stage, filter fill, lineage sums

``--local`` runs the identical job in a single-node session (the sandbox / CI
path; on a real cluster the job server provides the address).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet dir/file with (url, html, lang)")
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--capacity", type=int, default=None, help="Bloom capacity (default: row count)")
    ap.add_argument("--fp-rate", type=float, default=0.01)
    ap.add_argument("--num-shards", type=int, default=64)
    ap.add_argument("--hll-p", type=int, default=14)
    ap.add_argument("--local", action="store_true", help="single-node session (tests/CI)")
    ap.add_argument("--local-cpus", type=int, default=4)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        if args.local:
            ray.init(address="local", num_cpus=args.local_cpus, include_dashboard=False,
                     logging_level="ERROR")
        else:
            ray.init()  # ray job submit provides RAY_ADDRESS
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    from raysketch.pipeline.build import build_keyed_sketch, sketch_table_to_dict
    from raysketch.pipeline.checkpoint import checkpointed_partitioned_bloom
    from raysketch.pipeline.text import extract_text_batch
    from raysketch.sketches.hll import HyperLogLog

    metrics: dict = {"input": args.input, "stages": {}}
    t_all = time.perf_counter()

    t0 = time.perf_counter()
    raw = rd.read_parquet(args.input, columns=["url", "html", "lang"])
    n_rows = raw.count()
    metrics["rows"] = int(n_rows)
    metrics["stages"]["count"] = round(time.perf_counter() - t0, 3)

    # extracted view: html dropped inside the batch fn (never shuffled)
    extracted = raw.map_batches(extract_text_batch, batch_format="pyarrow", zero_copy_batch=True)

    t0 = time.perf_counter()
    tbl = build_keyed_sketch(extracted, "lang", "url", lambda: HyperLogLog(args.hll_p))
    sk = sketch_table_to_dict(tbl, "lang")
    metrics["stages"]["hll_by_lang"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    pb, lineage = checkpointed_partitioned_bloom(
        rd.read_parquet(args.input, columns=["url"]),
        "url",
        capacity=args.capacity or max(n_rows, 1),
        ckpt_dir=args.ckpt_dir,
        fp_rate=args.fp_rate,
        num_shards=args.num_shards,
    )
    metrics["stages"]["bloom_build"] = round(time.perf_counter() - t0, 3)
    metrics["bloom"] = {
        "inserted": int(pb.count),
        "total_bits": int(pb.total_bits),
        "num_shards": pb.num_shards,
        "lineage_rows": lineage.num_rows,
        "lineage_rows_in_sum": int(pa.compute.sum(lineage.column("rows_in")).as_py() or 0),
    }

    os.makedirs(args.output, exist_ok=True)
    out_rows = [
        {"lang": lang, "est_urls": float(h.estimate())} for lang, h in sorted(sk.items())
    ]
    pq.write_table(
        pa.Table.from_pylist(out_rows), os.path.join(args.output, "lang_url_counts.parquet")
    )
    metrics["wall_s"] = round(time.perf_counter() - t_all, 3)
    with open(os.path.join(args.output, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2, sort_keys=True)
    print(json.dumps({"ok": True, **{k: metrics[k] for k in ("rows", "wall_s")}}))
    ray.shutdown()


if __name__ == "__main__":
    main()
