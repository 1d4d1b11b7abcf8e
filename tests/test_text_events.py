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


def test_window_epoch_unit_safe(ray_session):
    """Tumbling windows must yield identical window_start for the same instants
    carried as timestamp[s]/[ms]/[us]/[ns] (ADVICE r1: the [us] divisor was
    hard-coded → 1000x-off windows for other units)."""
    import ray.data as rd

    from raysketch.pipeline.events import tumbling_window_agg

    secs = np.array([0, 100, 86_400, 86_500, 200_000], dtype=np.int64)
    frames = {}
    for unit, mult in [("s", 1), ("ms", 1_000), ("us", 1_000_000), ("ns", 1_000_000_000)]:
        tbl = pa.table(
            {
                "ts": pa.array(secs * mult, pa.timestamp(unit)),
                "event_type": pa.array(["a"] * len(secs)),
                "value": pa.array([1.0] * len(secs)),
            }
        )
        out = tumbling_window_agg(rd.from_arrow(tbl), window_s=86_400).to_pandas()
        frames[unit] = out.sort_values("window_start").reset_index(drop=True)
    for unit in ("ms", "us", "ns"):
        pd.testing.assert_frame_equal(frames["s"], frames[unit])
    assert frames["s"]["window_start"].tolist() == [0, 86_400, 172_800]


def test_sessionize_vectorized_no_map_groups(ray_session):
    """sessionize: HASH_SHUFFLE repartition + per-block segment math must match a
    pandas per-user oracle (and the plan must not contain a MapGroups stage)."""
    import ray.data as rd

    from raysketch.pipeline.events import sessionize

    rng = np.random.default_rng(3)
    n = 5000
    users = rng.integers(0, 200, size=n)
    ts = np.sort(rng.integers(0, 1_000_000, size=n))
    tbl = pa.table(
        {
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array(ts * 1_000_000, pa.timestamp("us")),
        }
    )
    got = (
        sessionize(rd.from_arrow(tbl), gap_s=1800)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    df = pd.DataFrame({"user_id": users, "ts": ts}).sort_values(["user_id", "ts"])
    exp = (
        df.groupby("user_id")["ts"]
        .agg(
            n_events="size",
            n_sessions=lambda s: int((np.diff(s.to_numpy()) > 1800).sum()) + 1,
        )
        .reset_index()
    )
    exp["n_events"] = exp["n_events"].astype("int64")
    exp["n_sessions"] = exp["n_sessions"].astype("int64")
    pd.testing.assert_frame_equal(got, exp)


def test_asof_join_matches_pandas(ray_session):
    """asof_join vs pandas merge_asof (direction='backward', allow_exact_matches)
    on random keyed streams, including users with no right rows at all."""
    import ray.data as rd

    from raysketch.pipeline.events import asof_join

    rng = np.random.default_rng(21)
    nl, nr = 800, 300
    lt = pa.table(
        {
            "event_id": pa.array(np.arange(nl, dtype=np.int64)),
            "user_id": pa.array(rng.integers(0, 40, nl)),
            "ts": pa.array(rng.choice(10_000_000, size=nl, replace=False) * 1000, pa.timestamp("us")),
        }
    )
    rt = pa.table(
        {
            "user_id": pa.array(rng.integers(0, 30, nr)),  # users 30-39 unmatched
            "ts": pa.array(rng.choice(10_000_000, size=nr, replace=False) * 1000 + 500, pa.timestamp("us")),
            "value": pa.array(rng.normal(size=nr)),
        }
    )
    got = (
        asof_join(rd.from_arrow(lt).repartition(4), rd.from_arrow(rt).repartition(3))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    ldf = lt.to_pandas().sort_values("ts")
    rdf = rt.to_pandas().sort_values("ts")
    exp = pd.merge_asof(ldf, rdf, on="ts", by="user_id", direction="backward").sort_values(
        "event_id"
    )
    assert len(got) == nl
    assert np.allclose(got["matched_value"], exp["value"].to_numpy(), equal_nan=True)
    exp_ts = exp["ts"].astype("int64")  # pandas may upcast; matched ts from merge
    # merge_asof does not return the matched right ts; check match presence only
    assert (got["matched_value"].isna().to_numpy() == exp["value"].isna().to_numpy()).all()


def test_range_join_matches_bruteforce(ray_session):
    """range_join vs a brute-force pandas oracle on random keyed streams."""
    import ray.data as rd

    from raysketch.pipeline.events import range_join

    rng = np.random.default_rng(33)
    nl, nr, w = 400, 250, 900_000
    lt = pa.table(
        {
            "event_id": pa.array(np.arange(nl, dtype=np.int64)),
            "user_id": pa.array(rng.integers(0, 25, nl)),
            "ts": pa.array(rng.integers(0, 20_000_000, nl), pa.timestamp("us")),
        }
    )
    rt = pa.table(
        {
            "user_id": pa.array(rng.integers(0, 25, nr)),
            "ts": pa.array(rng.integers(0, 20_000_000, nr), pa.timestamp("us")),
            "value": pa.array(rng.normal(size=nr)),
        }
    )
    got = (
        range_join(rd.from_arrow(lt).repartition(4), rd.from_arrow(rt).repartition(3), window_us=w)
        .to_pandas()
        .sort_values(["event_id", "matched_ts_us", "matched_value"])
        .reset_index(drop=True)
    )
    ldf, rdf = lt.to_pandas(), rt.to_pandas()
    ldf["ts_us"] = ldf["ts"].astype("int64")
    rdf["ts_us"] = rdf["ts"].astype("int64")
    exp = ldf.merge(rdf, on="user_id", suffixes=("", "_r"))
    exp = exp[(exp["ts_us_r"] >= exp["ts_us"] - w) & (exp["ts_us_r"] <= exp["ts_us"])]
    exp = exp.sort_values(["event_id", "ts_us_r", "value"]).reset_index(drop=True)
    assert len(got) == len(exp)
    assert got["event_id"].tolist() == exp["event_id"].tolist()
    assert np.allclose(got["matched_ts_us"], exp["ts_us_r"])
    assert np.allclose(got["matched_value"], exp["value"])


def test_range_join_high_cardinality_keys(ray_session):
    """100k distinct keys in one block: the r4 rank-space composite bounds must
    stay correct (and flat in key cardinality — no per-key Python loop). Oracle
    is closed-form: each key k has right rows at ts=1000k and 1000k+500_000,
    left at ts=1000k+600_000 with window 400_000 → exactly the +500_000 row
    matches for even keys; odd keys have no right rows at all."""
    import ray.data as rd

    from raysketch.pipeline.events import range_join

    nk = 100_000
    keys = np.arange(nk, dtype=np.int64)
    even = keys[keys % 2 == 0]
    lt = pa.table(
        {
            "event_id": pa.array(keys),
            "user_id": pa.array(keys),
            "ts": pa.array(keys * 1_000 + 600_000, pa.timestamp("us")),
        }
    )
    rt = pa.table(
        {
            "user_id": pa.array(np.repeat(even, 2)),
            "ts": pa.array(
                (np.repeat(even, 2) * 1_000 + np.tile([0, 500_000], len(even))),
                pa.timestamp("us"),
            ),
            "value": pa.array(np.repeat(even, 2).astype(np.float64)),
        }
    )
    got = (
        range_join(
            rd.from_arrow(lt).repartition(2), rd.from_arrow(rt).repartition(2), window_us=400_000
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # only the +500_000 right row of each EVEN key is inside [ts-400k, ts]
    assert got["event_id"].to_numpy().tolist() == even.tolist()
    assert (got["matched_ts_us"].to_numpy() == even * 1_000 + 500_000).all()
    assert (got["matched_value"].to_numpy() == even.astype(np.float64)).all()


def test_repetition_signals_match_python_oracle():
    """repetition_batch vs a per-doc Counter oracle on adversarial docs: empty,
    single-line, all-duplicate, mixed-length lines, repeated 2-grams."""
    from collections import Counter

    import pyarrow as pa

    from raysketch.pipeline.text import repetition_batch

    rng = np.random.default_rng(3)
    texts = ["", "one single line", "dup\ndup\ndup", "a b a b a b a b"]
    for _ in range(40):
        lines = [
            " ".join(rng.choice(["w1", "w2", "w3", "tok4", "x"], size=rng.integers(0, 6)))
            for _ in range(rng.integers(1, 8))
        ]
        texts.append("\n".join(lines))
    out = repetition_batch(pa.table({"text": pa.array(texts)}))
    for i, t in enumerate(texts):
        lines = t.split("\n")
        lc = Counter(lines)
        n_lines, n_distinct = len(lines), len(lc)
        exp_dup = (n_lines - n_distinct) / n_lines
        chars = sum(len(l) for l in lines)
        dup_chars = sum(len(l) for l in lines if lc[l] >= 2)
        exp_char = dup_chars / chars if chars else 0.0
        toks = t.split()
        grams = Counter(zip(toks, toks[1:]))
        n2 = sum(grams.values())
        exp_top2 = max(grams.values()) / n2 if n2 else 0.0
        assert out.column("r_dup_line_frac")[i].as_py() == exp_dup, (i, t)
        assert abs(out.column("r_dup_line_char_frac")[i].as_py() - exp_char) < 1e-12
        assert out.column("r_top2gram_frac")[i].as_py() == exp_top2, (i, t)
