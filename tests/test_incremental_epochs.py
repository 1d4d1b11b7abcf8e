"""Two-epoch incremental-corpus pipeline, end to end (VERDICT r3 next-round #8):

epoch 1 → checkpointed Bloom build → (simulated restart) resume from the
checkpoint → epoch 2 anti-joins against the epoch-1 filter — verified against
a DuckDB oracle over BOTH epochs:

- every kept epoch-2 row is genuinely new            (exact: no false negatives)
- every epoch-1 duplicate in epoch 2 is excluded     (exact: same guarantee)
- genuinely-new rows dropped (Bloom false positives) ≤ 2p + slack
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from raysketch.pipeline.checkpoint import checkpointed_partitioned_bloom, finished_shards
from raysketch.pipeline.probe import probe_partitioned_ckpt


def _epochs():
    e1 = pd.DataFrame(
        {
            "doc_id": np.arange(3000, dtype=np.int64),
            "text": [f"epoch one document body {i} alpha beta" for i in range(3000)],
        }
    )
    dup_ids = np.arange(0, 3000, 2)[:1500]
    e2 = pd.DataFrame(
        {
            "doc_id": np.arange(10_000, 10_000 + 3000, dtype=np.int64),
            "text": (
                [f"epoch one document body {i} alpha beta" for i in dup_ids]  # dups
                + [f"epoch two fresh document {i} gamma delta" for i in range(1500)]
            ),
        }
    )
    return e1, e2


def test_two_epoch_checkpoint_resume_anti_join(ray_session, tmp_path):
    import ray.data as rd

    e1, e2 = _epochs()
    ckpt = str(tmp_path / "epoch1_bloom")

    # epoch 1: checkpointed build (per-shard parquet, task-side atomic writes)
    ds1 = rd.from_pandas(e1).repartition(4)
    pb1, lin1 = checkpointed_partitioned_bloom(ds1, "text", capacity=4000, ckpt_dir=ckpt, num_shards=8)
    assert finished_shards(ckpt) == set(range(8))

    # simulated restart: resume must rebuild NOTHING and load identical bits
    pb_resumed, lin2 = checkpointed_partitioned_bloom(
        ds1, "text", capacity=4000, ckpt_dir=ckpt, num_shards=8
    )
    assert pb_resumed.to_bytes() == pb1.to_bytes()

    # epoch 2: shard-routed probe straight from the checkpoint dir; anti-join
    # semantics = keep rows the filter reports ABSENT
    ds2 = rd.from_pandas(e2).repartition(4)
    probed = probe_partitioned_ckpt(ds2, ckpt, "text", keep=("doc_id", "text")).take_all()
    kept_ids = sorted(r["doc_id"] for r in probed if not r["member"])

    # DuckDB oracle over the UNION corpus: the genuinely-new epoch-2 rows
    con = duckdb.connect()
    con.register("epoch1", e1)
    con.register("epoch2", e2)
    new_ids = set(
        r[0]
        for r in con.execute(
            "SELECT doc_id FROM epoch2 WHERE text NOT IN (SELECT text FROM epoch1)"
        ).fetchall()
    )
    dup_ids = set(e2["doc_id"]) - new_ids

    # exact guarantees: kept ⊆ genuinely-new, and no epoch-1 duplicate survives
    assert set(kept_ids) <= new_ids
    assert not (set(kept_ids) & dup_ids)
    # approximate guarantee: genuinely-new rows lost to false positives ≤ 2p
    dropped_new = len(new_ids) - len(kept_ids)
    assert dropped_new <= max(2 * 0.01 * len(new_ids), 3.0)


def test_epoch_dedup_three_epochs(ray_session, tmp_path):
    """The production wrapper: three epochs through one checkpoint dir.
    Exact-negative invariant: no kept row ever repeats a key already folded
    into the filter; FP losses bounded by the configured rate."""
    import ray.data as rd

    from raysketch.pipeline.checkpoint import epoch_dedup

    ck = str(tmp_path / "epochs")
    e1 = pd.DataFrame(
        {"doc_id": np.arange(2000), "text": [f"first wave doc {i}" for i in range(2000)]}
    )
    out1 = epoch_dedup(rd.from_pandas(e1).repartition(4), ck, capacity=10_000, num_shards=8)
    assert out1.count() == 2000

    e2 = pd.DataFrame(
        {
            "doc_id": np.arange(5000, 7000),
            "text": [f"first wave doc {i}" for i in range(1000)]  # dups of e1
            + [f"second wave doc {i}" for i in range(1000)],
        }
    )
    out2 = epoch_dedup(rd.from_pandas(e2).repartition(4), ck, capacity=10_000, num_shards=8)
    kept2 = out2.to_pandas()
    assert set(kept2.columns) == {"doc_id", "text"}
    # exact-negative: every e1 duplicate excluded
    assert not set(kept2["text"]) & set(e1["text"])
    # FP losses only: at p=0.01, ~10 of the 1000 fresh may drop
    assert len(kept2) >= 1000 - 40
    assert all(t.startswith("second wave") for t in kept2["text"])

    e3 = pd.DataFrame(
        {
            "doc_id": np.arange(9000, 10_500),
            "text": [f"second wave doc {i}" for i in range(500)]  # dups of kept2
            + [f"first wave doc {i}" for i in range(500)]  # dups of e1
            + [f"third wave doc {i}" for i in range(500)],
        }
    )
    out3 = epoch_dedup(rd.from_pandas(e3).repartition(4), ck, capacity=10_000, num_shards=8)
    kept3 = out3.to_pandas()
    prior_keys = set(e1["text"]) | set(kept2["text"])
    assert not set(kept3["text"]) & prior_keys
    assert len(kept3) >= 500 - 40
    assert all(t.startswith("third wave") for t in kept3["text"])
