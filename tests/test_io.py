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
