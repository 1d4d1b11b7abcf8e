"""Sources: raw-keys generator (F3), whitelist reader (#24), media fixture."""

import numpy as np
import pyarrow.parquet as pq

from raysketch.io.corpus import gen_raw_keys, read_whitelist


def test_gen_raw_keys_deterministic(tmp_path):
    d1 = tmp_path / "a"
    d2 = tmp_path / "b"
    gen_raw_keys(str(d1), rows=1000, num_files=2)
    gen_raw_keys(str(d2), rows=1000, num_files=2)
    t1 = pq.ParquetDataset(str(d1)).read()
    t2 = pq.ParquetDataset(str(d2)).read()
    assert t1.equals(t2)
    keys = t1["key"].to_pylist()
    assert len(keys) == 1000
    assert all(len(k) == 16 for k in keys)
    assert all(all(32 <= ord(c) <= 126 for c in k) for k in keys[:20])
    # near-unique (random 16-char keys)
    assert len(set(keys)) > 990


def test_read_whitelist(tmp_path, ray_session):
    p = tmp_path / "whitelist.txt"
    p.write_text("\n".join(f"domain{i}.example" for i in range(100)))
    ins, qry = read_whitelist(str(p), seed=42, insert_n=60, query_n=40)
    ins_rows = [r["text"] for r in ins.take_all()]
    qry_rows = [r["text"] for r in qry.take_all()]
    assert len(ins_rows) == 60 and len(qry_rows) == 40
    assert not (set(ins_rows) & set(qry_rows))  # prefix split → disjoint
    # seeded shuffle → deterministic
    ins2, _ = read_whitelist(str(p), seed=42, insert_n=60, query_n=40)
    assert [r["text"] for r in ins2.take_all()] == ins_rows


def test_viz_bench_summary(tmp_path):
    """tools/viz_bench.py summary path over a generated TSV (SURVEY.md §2 #36):
    derived throughput columns + per-filter summary frame. Plots are exercised
    iff matplotlib exists (not in this container)."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import importlib

    viz = importlib.import_module("viz_bench")
    from reference_bench import TSV_COLUMNS, write_tsv_row

    tsv = str(tmp_path / "r.tsv")
    for i, (f, ncpu) in enumerate([("a", 2), ("a", 8), ("b", 2), ("b", 8)]):
        write_tsv_row(
            tsv,
            {
                "filter": f,
                "threads": ncpu,
                "insert_count": 1000,
                "test_count": 100,
                "expected_inserted": 1000,
                "insert_ms": 10.0 + i,
                "contains_ms": 5.0 + i,
                "tp": 50,
                "fp": 1,
                "fn": 0,
                "fp_rate": 0.02,
                "fn_rate": 0.0,
                "total_bits": 9600,
                "bits_per_item": 9.6,
            },
        )
    df = viz.load_data(tsv)
    assert len(df) == 4
    assert "insert_throughput_m" in df and "query_throughput_m" in df
    assert abs(df["insert_throughput_m"].iloc[0] - 0.1) < 1e-9  # 1000/10ms = 0.1M/s
    summary = viz.summarize(df)
    assert set(summary.index) == {"a", "b"}
    assert ("fp_rate", "mean") in summary.columns
    written = viz.plot(df, str(tmp_path / "plots"))
    assert written == [] or len(written) == 4  # [] without matplotlib
