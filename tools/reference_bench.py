"""The reference's benchmark protocol, Ray-Data-native (simple_benchmark.cpp
re-expressed; SURVEY.md §2 #23, #25, #28-32, #34):

- workload: n seeded random 16-char ASCII strings (F3), p = 0.01; test set =
  n/10 rows, half inserted / half fresh (generate_unified_test_data semantics,
  simple_benchmark.cpp:542-567)
- matrix: filter family × parallelism (num_cpus standing in for threads),
  identical dataset for every cell (the fairness rule, lines 853-858)
- per cell: timed insert phase, timed query phase, confusion matrix vs the exact
  ground truth, derived fp/fn rates and bits-per-item
- sink: ``benchmark_results.tsv`` with the reference's 14-column schema
  (simple_benchmark.cpp:162): filter, threads, insert_count, test_count,
  expected_inserted, insert_ms, contains_ms, tp, fp, fn, fp_rate, fn_rate,
  total_bits, bits_per_item

Usage: python tools/reference_bench.py [--n 2500000] [--cpus 8,32] [--out tsv]
Each parallelism level runs in the current process with a fresh ray.init.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TSV_COLUMNS = [
    "filter",
    "threads",
    "insert_count",
    "test_count",
    "expected_inserted",
    "insert_ms",
    "contains_ms",
    "tp",
    "fp",
    "fn",
    "fp_rate",
    "fn_rate",
    "total_bits",
    "bits_per_item",
]


def write_tsv_row(path: str, row: dict) -> None:
    """Append one row; write the header iff the file is absent/empty
    (write_tsv_row semantics, simple_benchmark.cpp:139-180)."""
    need_header = not os.path.exists(path) or os.path.getsize(path) == 0
    with open(path, "a") as f:
        if need_header:
            f.write("\t".join(TSV_COLUMNS) + "\n")
        f.write("\t".join(str(row[c]) for c in TSV_COLUMNS) + "\n")


def run_cell(filter_name: str, n: int, num_cpus: int, keys_dir: str, queries_path: str, out_tsv: str):
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    from raysketch.pipeline.partitioned import build_partitioned_bloom
    from raysketch.pipeline.probe import confusion_matrix
    from raysketch.pipeline.build import build_sketch
    from raysketch.sketches.bloom import BloomSketch

    p = 0.01
    ds = rd.read_parquet(keys_dir, columns=["key"])

    t0 = time.perf_counter()
    if filter_name == "partitioned_bloom":
        sk, _ = build_partitioned_bloom(ds, "key", capacity=n, fp_rate=p, num_shards=256)
    elif filter_name == "partitioned_bloom_shuffle":
        sk, _ = build_partitioned_bloom(
            ds, "key", capacity=n, fp_rate=p, num_shards=256, mode="shuffle"
        )
    elif filter_name == "bloom_classic":
        sk = build_sketch(ds, "key", lambda: BloomSketch(n, p, algo="classic"))
    elif filter_name == "bloom_classic_xxh32":
        # the reference's XXH32 hash pair (simple_benchmark.cpp:35-40, seeds 0 /
        # 0x87654321) on the classic geometry
        sk = build_sketch(ds, "key", lambda: BloomSketch(n, p, algo="classic", hash_algo="xxh32"))
    elif filter_name == "bloom_classic_murmur3":
        sk = build_sketch(ds, "key", lambda: BloomSketch(n, p, algo="classic", hash_algo="murmur3"))
    elif filter_name == "bloom_blocked":
        sk = build_sketch(ds, "key", lambda: BloomSketch(n, p, algo="blocked"))
    elif filter_name == "bloom_blocked256":
        # 256-bit cache-line blocked layout (bloom_filters.h:94-159)
        sk = build_sketch(ds, "key", lambda: BloomSketch(n, p, algo="blocked", block_bits=256))
    elif filter_name == "bloom_patterned":
        # mask-table patterned variant (bloom_filters.h:354-536)
        sk = build_sketch(ds, "key", lambda: BloomSketch(n, p, algo="patterned"))
    else:
        raise ValueError(filter_name)
    insert_ms = (time.perf_counter() - t0) * 1000

    qds = rd.read_parquet(queries_path)
    t0 = time.perf_counter()
    cm = confusion_matrix(qds, sk, "key", concurrency=(1, num_cpus))
    contains_ms = (time.perf_counter() - t0) * 1000

    total_bits = sk.total_bits
    row = {
        "filter": filter_name,
        "threads": num_cpus,
        "insert_count": n,
        "test_count": cm["test_count"],
        "expected_inserted": n,
        "insert_ms": round(insert_ms, 2),
        "contains_ms": round(contains_ms, 2),
        "tp": cm["tp"],
        "fp": cm["fp"],
        "fn": cm["fn"],
        "fp_rate": round(cm["fp_rate"], 6),
        "fn_rate": round(cm["fn_rate"], 6),
        "total_bits": total_bits,
        "bits_per_item": round(total_bits / n, 3),
    }
    write_tsv_row(out_tsv, row)
    print(
        f"{filter_name:28s} cpus={num_cpus:3d} insert {insert_ms/1000:6.2f}s "
        f"({n/insert_ms*1000:,.0f}/s) query {contains_ms/1000:6.2f}s "
        f"fp_rate={cm['fp_rate']:.4f} fn={cm['fn']}"
    )
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_500_000)  # the reference's n, line 855
    ap.add_argument("--cpus", type=str, default="8,32")
    ap.add_argument(
        "--filters",
        type=str,
        default="partitioned_bloom,bloom_classic,bloom_blocked,bloom_blocked256,bloom_patterned,bloom_classic_xxh32",
    )
    ap.add_argument("--out", type=str, default="/tmp/raysketch_bench/benchmark_results.tsv")
    ap.add_argument("--workdir", type=str, default="/tmp/raysketch_bench")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    from raysketch.io.corpus import gen_membership_queries, gen_raw_keys

    keys_dir = os.path.join(args.workdir, f"raw_keys_{args.n}")
    gen_raw_keys(keys_dir, rows=args.n)
    queries_path = os.path.join(args.workdir, f"queries_{args.n}.parquet")
    # test set = n/10, half inserted half fresh (simple_benchmark.cpp:549)
    _gen_queries_for_keys(queries_path, keys_dir, args.n // 10)

    import ray

    for ncpu in (int(c) for c in args.cpus.split(",")):
        ray.init(
            address="local",
            num_cpus=ncpu,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
        import ray.data as rd

        rd.DataContext.get_current().enable_progress_bars = False
        rd.read_parquet(keys_dir, columns=["key"]).count()  # warm
        for f in args.filters.split(","):
            run_cell(f, args.n, ncpu, keys_dir, queries_path, args.out)
        ray.shutdown()


def _gen_queries_for_keys(out_path: str, keys_dir: str, n_queries: int, seed: int = 43):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(out_path):
        return
    half = n_queries // 2
    keys = pq.ParquetDataset(keys_dir).read(columns=["key"])["key"]
    pos = keys.slice(0, half).to_pylist()  # first-k prefix, simple_benchmark.cpp:553-558
    rng = np.random.default_rng(seed)
    codes = rng.integers(32, 127, size=(n_queries - half, 17), dtype=np.uint8)  # len 17 → disjoint
    neg = [bytes(c).decode() for c in codes]
    tbl = pa.table(
        {
            "key": pa.array(pos + neg, type=pa.string()),
            "is_positive": pa.array([True] * len(pos) + [False] * len(neg)),
        }
    )
    pq.write_table(tbl, out_path)


if __name__ == "__main__":
    main()
