"""Tests for the resumable sharded Parquet export."""

import os

import numpy as np
import pandas as pd
import pytest


def _df(n=500):
    rng = np.random.default_rng(3)
    return pd.DataFrame(
        {
            "doc_id": rng.permutation(n * 2)[:n],
            "text": [f"doc {i}" for i in range(n)],
        }
    )


def _ds(df, blocks=4):
    import ray

    return ray.data.from_pandas(df).repartition(blocks)


class TestWriteCorpusShards:
    def test_roundtrip_and_counts(self, ray_session, tmp_path):
        from raysketch.io.shards import read_corpus_shards, write_corpus_shards

        df = _df()
        out = write_corpus_shards(_ds(df), str(tmp_path / "x"), num_shards=8)
        assert out["n_rows"].sum() == len(df)
        assert not out["skipped"].any()
        want_counts = df.groupby(df["doc_id"] % 8).size()
        got_counts = out.set_index("shard")["n_rows"]
        assert dict(got_counts) == dict(want_counts)
        back = (
            read_corpus_shards(str(tmp_path / "x"))
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        pd.testing.assert_frame_equal(back, df.sort_values("doc_id", ignore_index=True))

    def test_resume_skips_finished_shards(self, ray_session, tmp_path):
        from raysketch.io.shards import read_corpus_shards, write_corpus_shards

        df = _df()
        d = str(tmp_path / "y")
        write_corpus_shards(_ds(df), d, num_shards=8)
        # simulate a partial failure: two shards missing
        os.remove(os.path.join(d, "part-00002.parquet"))
        os.remove(os.path.join(d, "part-00005.parquet"))
        mtimes = {
            f: os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d)
            if f.startswith("part-")
        }
        out = write_corpus_shards(_ds(df), d, num_shards=8)
        # only the missing shards were rewritten; the rest untouched
        rewritten = set(out[~out["skipped"]]["shard"])
        assert rewritten == {2, 5}
        for f, m in mtimes.items():
            assert os.path.getmtime(os.path.join(d, f)) == m
        back = (
            read_corpus_shards(d).to_pandas().sort_values("doc_id", ignore_index=True)
        )
        pd.testing.assert_frame_equal(back, df.sort_values("doc_id", ignore_index=True))

    def test_deterministic_shard_bytes(self, ray_session, tmp_path):
        from raysketch.io.shards import write_corpus_shards

        df = _df()
        write_corpus_shards(_ds(df, blocks=2), str(tmp_path / "a"), num_shards=4)
        write_corpus_shards(_ds(df, blocks=7), str(tmp_path / "b"), num_shards=4)
        for i in range(4):
            fa = (tmp_path / "a" / f"part-{i:05d}.parquet").read_bytes()
            fb = (tmp_path / "b" / f"part-{i:05d}.parquet").read_bytes()
            assert fa == fb

    def test_param_mismatch_raises(self, ray_session, tmp_path):
        from raysketch.io.shards import write_corpus_shards

        d = str(tmp_path / "z")
        write_corpus_shards(_ds(_df()), d, num_shards=4)
        with pytest.raises(ValueError, match="resume parameter mismatch"):
            write_corpus_shards(_ds(_df()), d, num_shards=8)

    def test_hash_shard_fn(self, ray_session, tmp_path):
        from raysketch.io.shards import read_corpus_shards, write_corpus_shards

        df = _df(200)
        d = str(tmp_path / "h")
        out = write_corpus_shards(_ds(df), d, num_shards=4, shard_fn="hash")
        assert out["n_rows"].sum() == len(df)
        back = read_corpus_shards(d).to_pandas().sort_values("doc_id", ignore_index=True)
        pd.testing.assert_frame_equal(back, df.sort_values("doc_id", ignore_index=True))


def test_resume_ignores_leftover_tmp_files(ray_session, tmp_path):
    """A crashed run leaves `part-NNNNN.parquet.tmp-xxxx` files behind; the
    atomic-rename discipline means they are garbage. finished_parts must not
    count them, resume must proceed normally, and read_corpus_shards must not
    read them."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from raysketch.io.shards import (
        finished_parts,
        read_corpus_shards,
        write_corpus_shards,
    )

    out = tmp_path / "resume"
    out.mkdir()
    (out / "part-00001.parquet.tmp-deadbeef").write_bytes(b"garbage")
    pq.write_table(
        pa.table({"doc_id": pa.array([1], pa.int64()), "text": pa.array(["pre"])}),
        str(out / "part-00001.parquet"),
    )
    json.dump(
        {"key_col": "doc_id", "num_shards": 4, "shard_fn": "mod"},
        open(out / "manifest.json", "w"),
    )
    assert finished_parts(str(out)) == {1}
    docs = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(100), pa.int64()), "text": pa.array(["x"] * 100)}
        )
    )
    summary = write_corpus_shards(docs, str(out), key_col="doc_id", num_shards=4)
    assert summary[summary["shard"] == 1]["skipped"].item()
    # 75 rows in the three rebuilt shards + the 1 preexisting row; the garbage
    # tmp file is never read
    assert read_corpus_shards(str(out)).count() == 76
