"""Text-stage unit tests + sliding-window oracle test."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from raysketch.pipeline.events import sliding_window_agg
from raysketch.pipeline.text import (
    LangIdStage,
    extract_text_array,
    fingerprint_batch,
    quality_batch,
    token_count_batch,
)


def test_extract_text_edge_cases():
    html = pa.array(
        [
            b"<html><body><p>hello world</p></body></html>",
            b"no markers at all",
            b"<p></p>",
            b"</p> before <p>",  # close before open → invalid → empty
            b"<p>unterminated",
        ],
        type=pa.binary(),
    )
    out = extract_text_array(html)
    assert out.to_pylist() == ["hello world", "", "", "", ""]


def test_token_and_quality():
    batch = pa.table({"text": pa.array(["a bb  ccc", "", "single"])})
    t = token_count_batch(batch)
    assert t.column("n_tokens").to_pylist() == [3, 0, 1]
    q = quality_batch(batch)
    assert q.column("q_chars").to_pylist() == [9, 0, 6]
    assert q.column("q_tokens").to_pylist() == [3, 0, 1]


def test_lang_id_heuristic():
    stage = LangIdStage()
    batch = pa.table(
        {
            "text": pa.array(
                [
                    "the cat and the dog went to the park for a walk in the sun",
                    "der hund und die katze sind nicht mit der maus auf dem tisch",
                    "xyzzy qwerty asdf",  # no markers → und
                ]
            )
        }
    )
    out = stage(batch)
    assert out.column("lang_pred").to_pylist() == ["en", "de", "und"]


def test_fingerprint_deterministic():
    batch = pa.table({"doc_id": pa.array([1, 2]), "text": pa.array(["same", "same"])})
    out = fingerprint_batch(batch)
    fps = out.column("fingerprint").to_pylist()
    assert fps[0] == fps[1]


def test_sliding_window_matches_pandas(ray_session):
    import ray.data as rd

    ds = rd.read_parquet("/root/testdata/sf0.001/events.parquet")
    got = sliding_window_agg(ds, window_s=7200, slide_s=3600).to_pandas()
    df = pq.read_table("/root/testdata/sf0.001/events.parquet").to_pandas()
    epoch = df["ts"].astype("int64") // 10**6  # us → s
    rows = []
    for i in range(2):  # fan = 2
        d = pd.DataFrame(
            {
                "event_type": df["event_type"],
                "window_start": (epoch // 3600) * 3600 - i * 3600,
                "value": df["value"],
            }
        )
        rows.append(d)
    exp = (
        pd.concat(rows)
        .groupby(["event_type", "window_start"])["value"]
        .agg(["count", "sum"])
        .reset_index()
    )
    m = got.merge(exp, on=["event_type", "window_start"], how="outer")
    assert len(m) == len(exp) == len(got)
    assert (m["n_events"] == m["count"]).all()
    assert np.allclose(m["sum_value"], m["sum"])
