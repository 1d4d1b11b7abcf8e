"""Full training-data chain scale cell — the composed-engine evidence.

Runs the COMPLETE web-corpus curation chain every LLM-pretraining pipeline
needs, end-to-end over the cached 200k-doc Common-Crawl-style corpus
(bench.py's /tmp/raysketch_wp200k, 32 parquet files), each stage a streaming
Ray Data composition, and reports per-stage wall time + survivor counts +
end-to-end docs/s:

  read (pruned cols) -> extract_text (html dropped in the same batch)
    -> token-length gate (exact percentile thresholds, two scans, no shuffle)
    -> line_dedup (CCNet-style boilerplate-line removal; hash-only exchange)
    -> minhash near-dup removal (banded LSH + exact-Jaccard verify; planted
       5% exact dups so the stage does real work)
    -> benchmark decontamination (broadcast n-gram set, one map pass)
    -> pack_sequences (concat-and-cut, one range sort + 16 B/block scan)
    -> resumable sharded parquet export

Reference anchor: this composes the whitelist build->probe->report loop of
simple_benchmark.cpp:67-120 into the full curation chain those primitives
exist to serve. Scale notes: the near-dup/decontam drop sets here ride
ray.put broadcasts (tens of KB at 200k docs); past ~5M ids both have the
documented join regime (dedup._emit_pairs join path, decontam hot_switch).

Usage: python tools/chain_cell.py [--rows 200000] [--cpus 32]
Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def run_chain(rows: int = 200_000, budget: int = 2048, num_files: int = 32):
    """Run the full curation chain over the ``rows``-doc cached corpus inside
    the CURRENT Ray session. Returns ``(timings, counts, (lo, hi))``."""
    import ray
    import ray.data as rd

    from raysketch.hashing import hash_column
    from raysketch.io.corpus import gen_webpages
    from raysketch.io.shards import write_corpus_shards
    from raysketch.pipeline.decontam import decontaminate, line_dedup
    from raysketch.pipeline.dedup import minhash_lsh_dedup
    from raysketch.pipeline.export import pack_sequences
    from raysketch.pipeline.text import extract_text_batch, length_filter

    web_dir = (
        "/tmp/raysketch_wp200k"
        if rows == 200_000
        else gen_webpages(f"/tmp/raysketch_wp{rows}", rows=rows, num_files=num_files)
    )
    gen_webpages(web_dir, rows=rows, num_files=num_files)  # idempotent/cached

    timings: dict[str, float] = {}
    counts: dict[str, int] = {}
    t_start = time.perf_counter()

    # ---- 1. read + extract + id/token columns (one fused batch pass) ------
    t0 = time.perf_counter()

    def prep(t: pa.Table) -> pa.Table:
        t = extract_text_batch(t)  # (url, lang, text); html dropped
        ids = hash_column(t.column("url").combine_chunks(), algo="xxh64", seed=0)
        txt = t.column("text").combine_chunks()
        n_chars = pc.binary_length(txt).cast(pa.int64())
        return pa.table(
            {
                "doc_id": pa.array(ids.view(np.int64)),
                "text": txt,
                "n_chars": n_chars,
            }
        )

    docs = (
        rd.read_parquet(web_dir, columns=["url", "html", "lang"])
        .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )
    counts["input_docs"] = docs.count()
    timings["extract"] = round(time.perf_counter() - t0, 3)

    # ---- 2. exact-percentile length gate -----------------------------------
    t0 = time.perf_counter()
    gated, lo, hi = length_filter(docs, col="n_chars", id_col="doc_id")
    gated = gated.materialize()
    counts["after_length_gate"] = gated.count()
    timings["length_gate"] = round(time.perf_counter() - t0, 3)

    # ---- 3. duplicated-line (boilerplate) removal ---------------------------
    t0 = time.perf_counter()
    ld = line_dedup(gated, text_col="text", id_col="doc_id", min_docs=5).materialize()
    counts["lines_removed"] = int(ld.sum("n_removed"))
    clean = ld.select_columns(["doc_id", "clean_text"]).materialize()
    timings["line_dedup"] = round(time.perf_counter() - t0, 3)

    # ---- 4. near-dup removal (planted 5% exact dups) ------------------------
    # plant: re-label a deterministic 5% slice with fresh ids; identical text
    # => Jaccard 1.0, so LSH must recover them and the drop must remove them
    t0 = time.perf_counter()

    def plant(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column("doc_id"))
        sel = np.nonzero(ids % 20 == 3)[0]
        if len(sel) == 0:
            return t.select(["doc_id", "clean_text"])
        dup = t.take(pa.array(sel))
        new_ids = np.asarray(dup.column("doc_id")) * np.int64(-1)
        dup = pa.table({"doc_id": pa.array(new_ids), "clean_text": dup.column("clean_text")})
        return pa.concat_tables([t.select(["doc_id", "clean_text"]), dup])

    planted = clean.map_batches(plant, batch_format="pyarrow", zero_copy_batch=True).materialize()
    counts["after_plant"] = planted.count()
    clusters = minhash_lsh_dedup(
        planted, text_col="clean_text", id_col="doc_id", threshold=0.8
    )
    cl_doc = np.asarray(clusters.column("doc_id"))
    cl_lab = np.asarray(clusters.column("cluster_id"))
    drop = np.sort(cl_doc[cl_doc != cl_lab])  # keep one representative per cluster
    counts["neardup_dropped"] = int(len(drop))
    drop_ref = ray.put(drop)

    def drop_dups(t: pa.Table) -> pa.Table:
        d = ray.get(drop_ref)
        if len(d) == 0:  # d[pos] on an empty array would raise
            return t
        ids = np.asarray(t.column("doc_id"))
        pos = np.searchsorted(d, ids)
        pos[pos == len(d)] = 0
        hit = d[pos] == ids
        return t.filter(pa.array(~hit))

    deduped = planted.map_batches(
        drop_dups, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    counts["after_neardup"] = deduped.count()
    timings["neardup"] = round(time.perf_counter() - t0, 3)

    # ---- 5. benchmark decontamination ---------------------------------------
    # benchmark set: a deterministic 200-doc slice of the corpus itself, so
    # overlap is guaranteed (every bench doc contaminates at least itself).
    # Selected by id predicate, NOT limit(): Dataset.limit picks whichever
    # blocks arrive first, so the bench set (and the drop count) varied run
    # to run with Ray scheduling (observed 200 vs 201 dropped).
    t0 = time.perf_counter()

    def min_ids(t):
        ids = np.sort(np.asarray(t.column("doc_id")))[:200]
        return pa.table({"doc_id": pa.array(ids, pa.int64())})

    partial_mins = np.sort(
        np.concatenate(
            [
                np.asarray(b.column("doc_id"))
                for b in deduped.select_columns(["doc_id"])
                .map_batches(min_ids, batch_format="pyarrow", zero_copy_batch=True)
                .iter_batches(batch_format="pyarrow")
                if b.num_rows
            ]
        )
    )
    bench_max = int(partial_mins[min(199, len(partial_mins) - 1)])
    bench = deduped.filter(expr=f"doc_id <= {bench_max}").materialize()
    contam = decontaminate(
        deduped, bench, text_col="clean_text", id_col="doc_id", n=4, min_overlap=1
    )
    bad = np.sort(
        np.concatenate(
            [np.asarray(b.column("doc_id")) for b in contam.iter_batches(batch_format="pyarrow") if b.num_rows]
            or [np.array([], dtype=np.int64)]
        )
    )
    counts["decontam_dropped"] = int(len(bad))
    bad_ref = ray.put(bad)

    def drop_bad(t: pa.Table) -> pa.Table:
        d = ray.get(bad_ref)
        if len(d) == 0:  # d[pos] on an empty array would raise
            return t
        ids = np.asarray(t.column("doc_id"))
        pos = np.searchsorted(d, ids)
        pos[pos == len(d)] = 0
        hit = d[pos] == ids
        return t.filter(pa.array(~hit))

    final_docs = deduped.map_batches(
        drop_bad, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    counts["final_docs"] = final_docs.count()
    timings["decontam"] = round(time.perf_counter() - t0, 3)

    # ---- 6. sequence packing -------------------------------------------------
    t0 = time.perf_counter()

    def tok(t: pa.Table) -> pa.Table:
        txt = t.column("clean_text").combine_chunks()
        n = np.maximum(np.asarray(pc.binary_length(txt)).astype(np.int64) // 6, 1)
        return pa.table({"doc_id": t.column("doc_id"), "n_tokens": pa.array(n)})

    packed = pack_sequences(
        final_docs.map_batches(tok, batch_format="pyarrow", zero_copy_batch=True),
        id_col="doc_id",
        token_col="n_tokens",
        budget=budget,
    ).materialize()
    counts["packed_rows"] = packed.count()
    timings["pack"] = round(time.perf_counter() - t0, 3)

    # ---- 7. resumable sharded export ----------------------------------------
    t0 = time.perf_counter()
    out_dir = f"/tmp/raysketch_chain_out_{rows}"
    shutil.rmtree(out_dir, ignore_errors=True)
    summary = write_corpus_shards(final_docs, out_dir, key_col="doc_id", num_shards=32)
    counts["export_shards"] = int(len(summary))
    timings["export"] = round(time.perf_counter() - t0, 3)

    timings["total"] = round(time.perf_counter() - t_start, 3)
    return timings, counts, (int(lo), int(hi))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--budget", type=int, default=2048)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
                 logging_level="ERROR")
    timings, counts, gate = run_chain(rows=args.rows, budget=args.budget)
    total = timings.pop("total")
    print(
        json.dumps(
            {
                "metric": "full curation chain (extract->gate->line_dedup->neardup->decontam->pack->export)",
                "value": total,
                "unit": "sec",
                "docs_per_sec": round(counts["input_docs"] / total, 1),
                "stages": timings,
                "counts": counts,
                "length_gate": list(gate),
                "num_cpus": args.cpus,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
