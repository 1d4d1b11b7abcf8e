"""End-to-end Ray Data pipeline tests (SURVEY.md §5 item 4): distributed result ==
single-process oracle (bitwise for Bloom/HLL/CMS registers), byte-identical
extracted text, confusion-matrix invariants, checkpoint/resume identity."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import raysketch.pipeline.text as rtext
from raysketch.io.corpus import gen_membership_queries, gen_webpages
from raysketch.pipeline.build import build_keyed_sketch, build_sketch, sketch_table_to_dict
from raysketch.pipeline.checkpoint import checkpointed_partitioned_bloom, finished_shards
from raysketch.pipeline.partitioned import build_partitioned_bloom
from raysketch.pipeline.probe import (
    bloom_anti_join,
    bloom_semi_join,
    confusion_matrix,
    exact_semi_join,
)
from raysketch.sketches.bloom import PartitionedBloom
from raysketch.sketches.cms import CountMinSketch
from raysketch.sketches.hll import HyperLogLog
from raysketch.sketches.tdigest import TDigest

N_ROWS = 8000


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("webpages")
    gen_webpages(str(d), rows=N_ROWS, num_files=4)
    return str(d)


@pytest.fixture(scope="module")
def queries_path(tmp_path_factory, corpus_dir):
    p = tmp_path_factory.mktemp("queries") / "queries.parquet"
    gen_membership_queries(str(p), corpus_dir, n_queries=2000)
    return str(p)


def _read(corpus_dir, **kw):
    import ray.data as rd

    return rd.read_parquet(corpus_dir, **kw)


def test_corpus_deterministic(tmp_path, corpus_dir):
    d2 = tmp_path / "again"
    gen_webpages(str(d2), rows=N_ROWS, num_files=4)
    a = pq.ParquetDataset(corpus_dir).read()
    b = pq.ParquetDataset(str(d2)).read()
    assert a.equals(b)


def test_extract_text_byte_identical(corpus_dir, ray_session):
    # per-row invariant: extract_text(html) == text column, byte for byte
    ds = _read(corpus_dir, columns=["url", "html", "text"])
    out = ds.map_batches(
        lambda b: pa.table(
            {
                "url": b.column("url"),
                "extracted": rtext.extract_text_array(b.column("html")),
                "text": b.column("text"),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    mismatches = out.map_batches(
        lambda b: pa.table(
            {"bad": [int(pa.compute.sum(pa.compute.not_equal(b.column("extracted"), b.column("text"))).as_py() or 0)]}
        ),
        batch_format="pyarrow",
    ).sum("bad")
    assert mismatches == 0


def test_distributed_bloom_equals_oracle_bitwise(corpus_dir, ray_session):
    ds = _read(corpus_dir, columns=["url"])
    pb, lineage = build_partitioned_bloom(ds, "url", capacity=N_ROWS, num_shards=16, mode="shuffle")
    # single-process oracle over the same rows
    urls = pq.ParquetDataset(corpus_dir).read(columns=["url"])["url"].combine_chunks()
    oracle = PartitionedBloom(N_ROWS, 0.01, num_shards=16)
    oracle.update_column(urls)
    assert pb.to_bytes() == oracle.to_bytes()  # bitwise identity across the shuffle
    assert lineage.num_rows == 16
    assert sum(lineage.column("rows_in").to_pylist()) == N_ROWS
    # partial-merge strategy produces the same bits too
    pb2, lin2 = build_partitioned_bloom(ds, "url", capacity=N_ROWS, num_shards=16, mode="partial")
    assert pb2.to_bytes() == pb.to_bytes()
    assert sum(lin2.column("rows_in").to_pylist()) == N_ROWS


def test_confusion_matrix_invariants(corpus_dir, queries_path, ray_session):
    import ray.data as rd

    ds = _read(corpus_dir, columns=["url"])
    pb, _ = build_partitioned_bloom(ds, "url", capacity=N_ROWS, num_shards=16)
    qds = rd.read_parquet(queries_path)
    cm = confusion_matrix(qds, pb, "url")
    assert cm["fn"] == 0  # no false negatives — the Bloom invariant
    assert cm["fp_rate"] <= 0.02  # p=0.01 with small-n slack
    assert cm["test_count"] == 2000


def test_semi_and_anti_join(corpus_dir, queries_path, ray_session):
    import ray.data as rd

    ds = _read(corpus_dir, columns=["url"])
    pb, _ = build_partitioned_bloom(ds, "url", capacity=N_ROWS, num_shards=16)
    qds = rd.read_parquet(queries_path)
    semi = bloom_semi_join(qds, pb, "url").take_all()
    anti = bloom_anti_join(qds, pb, "url").take_all()
    assert len(semi) + len(anti) == 2000
    # every positive row must appear in the semi-join (no false negatives)
    assert sum(1 for r in semi if r["is_positive"]) == 1000
    # every anti-join row is genuinely absent
    assert all(not r["is_positive"] for r in anti)


def test_exact_broadcast_semi_join(corpus_dir, ray_session):
    ds = _read(corpus_dir, columns=["url", "lang"])
    urls = pq.ParquetDataset(corpus_dir).read(columns=["url"])["url"]
    keys = urls.slice(0, 100).to_pylist()
    out = exact_semi_join(ds, keys, "url").take_all()
    assert sorted(r["url"] for r in out) == sorted(keys)


def test_build_sketch_hll_bitwise_vs_oracle(corpus_dir, ray_session):
    ds = _read(corpus_dir, columns=["url"])
    hll = build_sketch(ds, "url", lambda: HyperLogLog(12))
    urls = pq.ParquetDataset(corpus_dir).read(columns=["url"])["url"].combine_chunks()
    oracle = HyperLogLog(12)
    oracle.update_column(urls)
    assert np.array_equal(hll.registers, oracle.registers)
    exact = len(set(urls.to_pylist()))
    assert abs(hll.estimate() - exact) / exact < 3 * hll.rel_error + 0.01


def test_build_sketch_tdigest(corpus_dir, ray_session):
    ds = _read(corpus_dir, columns=["text"])
    ds = ds.map_batches(
        lambda b: pa.table({"tlen": pa.compute.utf8_length(b.column("text"))}),
        batch_format="pyarrow",
    )
    td = build_sketch(ds, "tlen", lambda: TDigest(200))
    lens = pa.compute.utf8_length(
        pq.ParquetDataset(corpus_dir).read(columns=["text"])["text"]
    ).to_numpy()
    s = np.sort(lens)
    for q in (0.25, 0.5, 0.9):
        rank = np.searchsorted(s, td.quantile(q)) / len(s)
        assert abs(rank - q) <= 0.02


def test_keyed_sketch_per_lang(corpus_dir, ray_session):
    ds = _read(corpus_dir, columns=["lang", "url"])
    tbl = build_keyed_sketch(ds, "lang", "url", lambda: HyperLogLog(12))
    sketches = sketch_table_to_dict(tbl, "lang")
    full = pq.ParquetDataset(corpus_dir).read(columns=["lang", "url"])
    langs = np.asarray(full["lang"].combine_chunks())
    urls = np.asarray(full["url"].combine_chunks())
    for lang, sk in sketches.items():
        exact = len(set(urls[langs == lang]))
        assert abs(sk.estimate() - exact) / max(exact, 1) < 3 * sk.rel_error + 0.05
        # bitwise identical to a single-process per-lang build
        oracle = HyperLogLog(12)
        oracle.update_column(pa.array(urls[langs == lang]))
        assert np.array_equal(sk.registers, oracle.registers)


def test_checkpoint_resume_identity(corpus_dir, tmp_path, ray_session):
    ds = _read(corpus_dir, columns=["url"])
    ck = str(tmp_path / "ckpt")
    pb1, lin1 = checkpointed_partitioned_bloom(ds, "url", N_ROWS, ck, num_shards=16)
    assert len(finished_shards(ck)) == 16
    # sabotage: remove three shard files → resume rebuilds exactly those; a
    # leftover .tmp file from a "crash" must be ignored by finished_shards
    for sid in (2, 7, 11):
        os.remove(os.path.join(ck, f"shard-{sid:05d}.parquet"))
    with open(os.path.join(ck, "shard-00002.parquet.tmp-deadbeef"), "wb") as f:
        f.write(b"garbage from a crashed writer")
    assert len(finished_shards(ck)) == 13
    pb2, lin2 = checkpointed_partitioned_bloom(ds, "url", N_ROWS, ck, num_shards=16)
    assert pb2.to_bytes() == pb1.to_bytes()  # resumed build bitwise-identical
    # mismatched params are refused
    with pytest.raises(ValueError):
        checkpointed_partitioned_bloom(ds, "url", N_ROWS, ck, num_shards=32)


def test_checkpointed_keyed_sketch_resume_identity(corpus_dir, tmp_path, ray_session):
    """Keyed (per-lang) HLL build with per-key-shard checkpoints: a resumed run
    rebuilds ONLY the sabotaged key-shards and the assembled table is identical
    (HLL merge is order-invariant, so partial rebuilds are bitwise-stable)."""
    from raysketch.pipeline.checkpoint import checkpointed_keyed_sketch

    ds = _read(corpus_dir, columns=["lang", "url"])
    ck = str(tmp_path / "keyed_ckpt")
    t1 = checkpointed_keyed_sketch(ds, "lang", "url", lambda: HyperLogLog(12), ck, num_shards=8)
    assert len(finished_shards(ck)) == 8
    for sid in (1, 5):
        os.remove(os.path.join(ck, f"shard-{sid:05d}.parquet"))
    assert len(finished_shards(ck)) == 6
    t2 = checkpointed_keyed_sketch(ds, "lang", "url", lambda: HyperLogLog(12), ck, num_shards=8)
    assert t2.equals(t1)
    with pytest.raises(ValueError):
        checkpointed_keyed_sketch(ds, "lang", "url", lambda: HyperLogLog(12), ck, num_shards=16)


def test_build_keyed_sketch_high_cardinality(ray_session):
    """10k distinct keys (the url-host regime): the partial stage must stay
    O(n log n) — argsort + segment bounds, not a boolean mask per key — and
    produce one correct blob per key."""
    import ray.data as rd

    n, n_keys = 30_000, 10_000
    tbl = pa.table(
        {
            "host": pa.array([f"host{i % n_keys}" for i in range(n)]),
            "v": pa.array([f"u{i}" for i in range(n)]),
        }
    )
    out = build_keyed_sketch(
        rd.from_arrow(tbl).repartition(4), "host", "v", lambda: HyperLogLog(12)
    )
    assert out.num_rows == n_keys
    rows_in = np.asarray(out.column("rows_in"))
    assert (rows_in == 3).all()  # every host saw exactly 3 rows
    sk = sketch_table_to_dict(out.slice(0, 5), "host")
    for v in sk.values():
        assert abs(v.estimate() - 3) < 0.5  # 3 distinct values per key


def test_build_keyed_sketch_as_dataset_identity(corpus_dir, ray_session):
    """as_dataset=True (the high-key-cardinality escape hatch: blob rows never
    collect on the driver) must yield exactly the table path's rows."""
    ds = _read(corpus_dir, columns=["lang", "url"])
    tbl = build_keyed_sketch(ds, "lang", "url", lambda: HyperLogLog(12))
    out_ds = build_keyed_sketch(ds, "lang", "url", lambda: HyperLogLog(12), as_dataset=True)
    import ray.data

    assert isinstance(out_ds, ray.data.Dataset)
    got = out_ds.to_pandas().sort_values("lang").reset_index(drop=True)
    exp = tbl.to_pandas().sort_values("lang").reset_index(drop=True)
    assert got["lang"].tolist() == exp["lang"].tolist()
    assert got["rows_in"].tolist() == exp["rows_in"].tolist()
    assert all(a == b for a, b in zip(got["state"], exp["state"]))  # bitwise blobs


def test_cms_distributed_bitwise(corpus_dir, ray_session):
    ds = _read(corpus_dir, columns=["lang"])
    cms = build_sketch(ds, "lang", lambda: CountMinSketch(width=1024, depth=4))
    langs = pq.ParquetDataset(corpus_dir).read(columns=["lang"])["lang"].combine_chunks()
    oracle = CountMinSketch(width=1024, depth=4)
    oracle.update_column(langs)
    assert np.array_equal(cms.table, oracle.table)
    assert cms.total == N_ROWS


def test_shuffle_probe_bitwise_equal_broadcast(corpus_dir, queries_path, ray_session):
    """The shard-routed probe (too-big-to-broadcast regime, gloom.h:216-230
    contains-routing) must produce EXACTLY the broadcast probe's confusion
    counts — same (h1,h2), same per-shard bits, different data movement."""
    import ray.data as rd

    from raysketch.pipeline.probe import confusion_matrix_shuffle

    ds = _read(corpus_dir, columns=["url"])
    pb, _ = build_partitioned_bloom(ds, "url", capacity=N_ROWS, num_shards=16)
    qds = rd.read_parquet(queries_path)
    cm_b = confusion_matrix(qds, pb, "url")
    cm_s = confusion_matrix_shuffle(qds, pb, "url")
    assert {k: cm_b[k] for k in ("tp", "fp", "fn", "tn")} == {
        k: cm_s[k] for k in ("tp", "fp", "fn", "tn")
    }
    assert cm_s["fn"] == 0


def test_job_entry_runs_and_resumes(corpus_dir, tmp_path):
    """tools/job_entry.py — the `ray job submit` surface: end-to-end run writes
    per-shard checkpoints + per-lang estimates + metrics; a resubmission resumes
    (all shards already finished → zero rows re-shuffled)."""
    import json
    import subprocess
    import sys as _sys

    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    cmd = [
        _sys.executable,
        "/root/repo/tools/job_entry.py",
        "--input", corpus_dir,
        "--ckpt-dir", ckpt,
        "--output", out,
        "--num-shards", "8",
        "--local",
    ]
    env = dict(os.environ, PYTHONPATH="/root/repo")
    r1 = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=300)
    assert r1.returncode == 0, r1.stderr[-2000:]
    first = json.loads(r1.stdout.strip().splitlines()[-1])
    assert first["ok"] and first["rows"] == N_ROWS
    m = json.load(open(f"{out}/metrics.json"))
    assert m["bloom"]["lineage_rows_in_sum"] == N_ROWS
    assert len(finished_shards(ckpt)) == 8
    import pyarrow.parquet as pq2

    langs = pq2.read_table(f"{out}/lang_url_counts.parquet")
    assert langs.num_rows >= 1
    # resubmit: all shards finished → resume path, lineage says 0 new rows
    r2 = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=300)
    assert r2.returncode == 0, r2.stderr[-2000:]
    m2 = json.load(open(f"{out}/metrics.json"))
    assert m2["bloom"]["inserted"] == m["bloom"]["inserted"]  # identical filter


def test_top_k_per_group(ray_session):
    """top_k_per_group == pandas groupby-head oracle with the same ordering."""
    import pandas as pd
    import ray.data as rd

    from raysketch.pipeline.relational import top_k_per_group

    rng = np.random.default_rng(5)
    n = 5000
    tbl = pa.table(
        {
            "k": pa.array(rng.integers(0, 200, n)),
            "v": pa.array(rng.normal(size=n)),
            "id": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    got = (
        top_k_per_group(rd.from_arrow(tbl).repartition(6), "k", "v", k=4, tiebreak_col="id")
        .to_pandas()
        .sort_values(["k", "v", "id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    df = tbl.to_pandas().sort_values(["k", "v", "id"], ascending=[True, False, True])
    exp = df.groupby("k").head(4).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_top_k_per_group_string_keys(ray_session):
    """String group keys + string tiebreak (the top-tokens-per-lang shape), with
    an upstream groupby fused into the same chain — exercises the captured-
    context hash-shuffle parallelism cap."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    from raysketch.pipeline.relational import top_k_per_group

    rng = np.random.default_rng(7)
    n = 4000
    langs = np.array(["en", "fr", "de"])[rng.integers(0, 3, n)]
    toks = np.array([f"t{i:02d}" for i in rng.integers(0, 40, n)])
    tbl = pa.table(
        {
            "lang": pa.array(langs.tolist(), pa.string()),
            "token": pa.array(toks.tolist(), pa.string()),
            "n": pa.array(np.ones(n, dtype=np.int64)),
        }
    )
    counts = rd.from_arrow(tbl).repartition(4).groupby(["lang", "token"]).aggregate(
        Sum("n", alias_name="n")
    )
    got = (
        top_k_per_group(counts, "lang", "n", k=3, tiebreak_col="token")
        .to_pandas()[["lang", "token", "n"]]
        .sort_values(["lang", "n", "token"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    exp = (
        tbl.to_pandas()
        .groupby(["lang", "token"], as_index=False)["n"]
        .sum()
        .sort_values(["lang", "n", "token"], ascending=[True, False, True])
        .groupby("lang")
        .head(3)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)
