"""Benchmark harness (driver contract: prints ONE JSON line).

Headline pipelines over ``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1) with
``ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS or 32)``:

- ``bloom_build``      partitioned-Bloom build over replicated lineitem orderkeys
                       (REPLICATE× the sf0.1 file → multi-million-row hash+shuffle+
                       build, the reference's n=2.5M insert-phase analogue)
- ``bloom_probe``      confusion-matrix probe phase over orders keys
- ``hll / cms / tdigest / kll``  sketch builds (partial + tree-merge, no shuffle)
- ``minhash_dedup``    near-dup LSH over documents
- ``ann_topk``         brute-force cosine top-k over embeddings
- ``window_events``    tumbling-window aggregate
- ``dedup_exact``      hash-partitioned exact dedup

``--scaling``: run the same headline job in two fresh processes at num_cpus=8 and
num_cpus=32 on the same input and report throughputs + efficiency = (T32/T8)/4
(the sandbox protocol for the north rule's N vs 4N criterion — BASELINE.md).

Fairness discipline (simple_benchmark.cpp:853-858): identical input files and
parameters for every parallelism level; one untimed warm-read first so the OS page
cache is hot at both levels.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPLICATE = 8  # lineitem sf0.1 × 8 = 4.8M rows for the build phase


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import numpy as np
    import ray.data as rd

    ctx = rd.DataContext.get_current()
    ctx.enable_progress_bars = False

    from raysketch.pipeline.ann import ann_cosine_topk
    from raysketch.pipeline.build import build_sketch
    from raysketch.pipeline.dedup import exact_dedup, minhash_lsh_dedup
    from raysketch.pipeline.events import tumbling_window_agg
    from raysketch.pipeline.partitioned import build_partitioned_bloom
    from raysketch.pipeline.probe import confusion_matrix
    from raysketch.sketches.cms import CountMinSketch
    from raysketch.sketches.hll import HyperLogLog
    from raysketch.sketches.kll import KLL
    from raysketch.sketches.tdigest import TDigest

    li_path = f"{sf_dir}/lineitem.parquet"
    li_paths = [li_path] * REPLICATE

    # untimed warm read (page cache + worker startup)
    rd.read_parquet(li_path, columns=["l_orderkey"]).count()

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    def timed(name):
        class _T:
            def __enter__(self):
                self.t0 = time.perf_counter()
                return self

            def __exit__(self, *a):
                timings[name] = round(time.perf_counter() - self.t0, 3)

        return _T()

    # 1. flagship: partitioned Bloom build over replicated orderkeys
    n_rows = 600_000 * REPLICATE
    with timed("bloom_build"):
        ds = rd.read_parquet(li_paths, columns=["l_orderkey"])
        pb, lineage = build_partitioned_bloom(ds, "l_orderkey", capacity=n_rows, num_shards=256)
    extras["bloom_build_rows"] = n_rows
    extras["bloom_build_rows_per_sec"] = round(n_rows / timings["bloom_build"], 1)

    # 2. probe phase: orders keys with exact membership labels (the ground-truth
    # set is the reference's unordered_set oracle — built once, broadcast)
    import pyarrow as pa
    import pyarrow.parquet as pq

    li_keys = np.unique(
        pq.read_table(li_path, columns=["l_orderkey"]).column("l_orderkey").to_numpy()
    )
    keys_ref = ray.put(li_keys)  # sorted

    with timed("bloom_probe"):
        orders = rd.read_parquet([f"{sf_dir}/orders.parquet"] * REPLICATE, columns=["o_orderkey"])

        def label(batch):
            lk = ray.get(keys_ref)
            keys = np.asarray(batch.column("o_orderkey"))
            idx = np.clip(np.searchsorted(lk, keys), 0, len(lk) - 1)
            return pa.table(
                {"o_orderkey": batch.column("o_orderkey"), "is_positive": pa.array(lk[idx] == keys)}
            )

        probe_ds = orders.map_batches(label, batch_format="pyarrow")
        cm = confusion_matrix(probe_ds, pb, "o_orderkey", concurrency=(1, num_cpus))
    extras["bloom_probe_rows"] = 150_000 * REPLICATE
    extras["bloom_probe_rows_per_sec"] = round(150_000 * REPLICATE / timings["bloom_probe"], 1)
    extras["fn"] = int(cm["fn"])
    extras["fp_rate"] = round(float(cm["fp_rate"]), 5)

    # 3. sketch builds (combiner + tree merge — no shuffle)
    with timed("hll"):
        build_sketch(rd.read_parquet(li_paths, columns=["l_partkey"]), "l_partkey", lambda: HyperLogLog(14))
    with timed("cms"):
        build_sketch(rd.read_parquet(li_paths, columns=["l_suppkey"]), "l_suppkey", lambda: CountMinSketch(width=16384, depth=5))
    with timed("tdigest"):
        build_sketch(rd.read_parquet(li_paths, columns=["l_extendedprice"]), "l_extendedprice", lambda: TDigest(200))
    with timed("kll"):
        build_sketch(rd.read_parquet(li_paths, columns=["l_extendedprice"]), "l_extendedprice", lambda: KLL(200))

    # 4. text / dedup / ann / windows
    with timed("dedup_exact"):
        exact_dedup(rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])).count()
    with timed("minhash_dedup"):
        minhash_lsh_dedup(rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]))
    with timed("ann_topk"):
        emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        q = np.stack([np.asarray(r["embedding"], dtype=np.float32) for r in emb.take(8)])
        ann_cosine_topk(emb, q, k=10, concurrency=(1, num_cpus))
    with timed("window_events"):
        tumbling_window_agg(rd.read_parquet(f"{sf_dir}/events.parquet"), window_s=86400).count()

    ray.shutdown()
    total = round(sum(timings.values()), 3)
    return {
        "metric": "raysketch headline pipelines wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "extras": extras,
    }


def run_scaling(sf_dir: str) -> dict:
    import subprocess

    out = {}
    for ncpu in (8, 32):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=sf_dir)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        out[ncpu] = json.loads(p.stdout.strip().splitlines()[-1])
    t8 = out[8]["queries"]["bloom_build"]
    t32 = out[32]["queries"]["bloom_build"]
    tp8 = out[8]["extras"]["bloom_build_rows_per_sec"]
    tp32 = out[32]["extras"]["bloom_build_rows_per_sec"]
    eff = (tp32 / tp8) / 4
    t8_tot, t32_tot = out[8]["value"], out[32]["value"]
    return {
        "metric": "scaling efficiency (bloom_build rows/sec, 8 vs 32 cpus)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "throughput_8": tp8,
        "throughput_32": tp32,
        "bloom_build_sec_8": t8,
        "bloom_build_sec_32": t32,
        "total_sec_8": t8_tot,
        "total_sec_32": t32_tot,
        "total_speedup": round(t8_tot / t32_tot, 3),
        "sf": sf_dir,
    }


if __name__ == "__main__":
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(sf_dir)))
    else:
        num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
        print(json.dumps(run_bench(sf_dir, num_cpus)))
