"""Randomized property tests: stream operators vs DuckDB on adversarial shapes.

The gate checks asof_join/range_join/sessionize against DuckDB oracles on the
REAL events table (sf0.01 and sf0.1); these seeded trials add the shapes real
data rarely exercises — duplicate timestamps within a key, exact ties at the
window edge, keys present on only one side, single-event users — over random
tables small enough to run every trial in-suite.

The right side is deduplicated to one row per (key, ts) during generation:
with duplicate right timestamps the at-or-before match is ambiguous (both the
library's lexsort tie-break and DuckDB's ASOF pick an arbitrary winner), so
uniqueness makes the expected match well-defined and the comparison exact.
"""

from __future__ import annotations

import random

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


def _random_events(rng, n, n_keys, ts_range):
    keys = [rng.randrange(n_keys) for _ in range(n)]
    ts = [rng.randrange(ts_range) * 1_000_000 for _ in range(n)]  # whole seconds in us
    return keys, ts


def _left_table(rng, n, n_keys, ts_range):
    keys, ts = _random_events(rng, n, n_keys, ts_range)
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "user_id": pa.array(keys, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )


def _right_table(rng, n, n_keys, ts_range):
    keys, ts = _random_events(rng, n, n_keys, ts_range)
    seen = {}
    for k, t in zip(keys, ts):
        seen[(k, t)] = rng.random()  # last wins; one row per (key, ts)
    rows = sorted(seen.items())
    return pa.table(
        {
            "user_id": pa.array([k for (k, _), _ in rows], pa.int64()),
            "ts": pa.array([t for (_, t), _ in rows], pa.timestamp("us")),
            "value": pa.array([round(v, 6) for _, v in rows], pa.float64()),
        }
    )


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_asof_join_matches_duckdb(ray_session, seed):
    from raysketch.pipeline.events import asof_join

    rng = random.Random(seed)
    lt = _left_table(rng, 120, 8, 40)
    rt = _right_table(rng, 90, 10, 40)
    got = (
        asof_join(rd.from_arrow(lt).repartition(4), rd.from_arrow(rt).repartition(3))
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )
    con = duckdb.connect()
    con.register("l", lt.to_pandas())
    con.register("r", rt.to_pandas())
    exp = con.sql(
        "SELECT l.event_id, "
        "floor(epoch(r.ts))::BIGINT * 1000000 AS m_ts, r.value AS m_val "
        "FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts "
        "ORDER BY l.event_id"
    ).df()
    assert len(got) == len(exp)
    g_ts = got["matched_ts_us"].astype("float64").to_numpy()
    e_ts = exp["m_ts"].astype("float64").to_numpy()
    assert np.array_equal(np.isnan(g_ts), np.isnan(e_ts))
    m = ~np.isnan(g_ts)
    assert np.array_equal(g_ts[m], e_ts[m])
    g_v = got["matched_value"].to_numpy()[m]
    e_v = exp["m_val"].to_numpy()[m]
    assert np.allclose(g_v, e_v)


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_range_join_matches_duckdb(ray_session, seed):
    from raysketch.pipeline.events import range_join

    rng = random.Random(seed)
    lt = _left_table(rng, 80, 6, 30)
    rt = _right_table(rng, 70, 8, 30)
    w = 5_000_000  # 5 s window in us — exact edge ties occur often at this density
    got = range_join(
        rd.from_arrow(lt).repartition(3), rd.from_arrow(rt).repartition(2), window_us=w
    ).to_pandas()
    con = duckdb.connect()
    con.register("l", lt.to_pandas())
    con.register("r", rt.to_pandas())
    exp = con.sql(
        f"SELECT l.event_id, floor(epoch(r.ts))::BIGINT * 1000000 AS m_ts, "
        f"r.value AS m_val FROM l JOIN r ON l.user_id = r.user_id "
        f"AND r.ts BETWEEN l.ts - INTERVAL {w} MICROSECONDS AND l.ts"
    ).df()
    key = lambda df, a, b, c: sorted(zip(df[a].tolist(), df[b].tolist(), df[c].tolist()))
    got_pairs = key(got, "event_id", "matched_ts_us", "matched_value")
    exp_pairs = key(exp, "event_id", "m_ts", "m_val")
    assert len(got_pairs) == len(exp_pairs)
    for (ga, gb, gc), (ea, eb, ec) in zip(got_pairs, exp_pairs):
        assert ga == ea and gb == eb and abs(gc - ec) < 1e-9


@pytest.mark.parametrize("seed", [21, 22, 23])
def test_sessionize_matches_duckdb(ray_session, seed):
    from raysketch.pipeline.events import sessionize

    rng = random.Random(seed)
    lt = _left_table(rng, 150, 7, 3600)
    gap = 300
    got = (
        sessionize(rd.from_arrow(lt).repartition(4), gap_s=gap)
        .to_pandas()
        .sort_values("user_id", ignore_index=True)
    )
    con = duckdb.connect()
    con.register("l", lt.to_pandas())
    exp = con.sql(
        f"""
        WITH g AS (
          SELECT user_id, ts,
                 CASE WHEN floor(epoch(ts)) - floor(epoch(lag(ts) OVER
                   (PARTITION BY user_id ORDER BY ts))) > {gap}
                 THEN 1 ELSE 0 END AS new_s
          FROM l
        )
        SELECT user_id, COUNT(*)::BIGINT AS n_events,
               (SUM(new_s) + 1)::BIGINT AS n_sessions
        FROM g GROUP BY user_id ORDER BY user_id
        """
    ).df()
    assert got["user_id"].tolist() == exp["user_id"].tolist()
    assert got["n_events"].tolist() == exp["n_events"].tolist()
    assert got["n_sessions"].tolist() == exp["n_sessions"].tolist()


@pytest.mark.parametrize("seed", [31, 32, 33])
def test_top_k_per_group_matches_duckdb(ray_session, seed):
    # heavy ties on order_col with a tiebreak column: must equal SQL
    # QUALIFY row_number() OVER (PARTITION BY key ORDER BY v DESC, tb ASC)
    from raysketch.pipeline.relational import top_k_per_group

    rng = random.Random(seed)
    n = 200
    t = pa.table(
        {
            "k": pa.array([rng.randrange(6) for _ in range(n)], pa.int64()),
            "v": pa.array([float(rng.randrange(5)) for _ in range(n)]),  # heavy ties
            "tb": pa.array(rng.sample(range(10_000), n), pa.int64()),  # unique
        }
    )
    got = (
        top_k_per_group(rd.from_arrow(t).repartition(4), "k", "v", 3, tiebreak_col="tb")
        .to_pandas()
        .sort_values(["k", "v", "tb"], ascending=[True, False, True], ignore_index=True)
    )
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    exp = con.sql(
        "SELECT k, v, tb FROM t QUALIFY row_number() OVER "
        "(PARTITION BY k ORDER BY v DESC, tb ASC) <= 3 "
        "ORDER BY k, v DESC, tb"
    ).df()
    assert got["k"].tolist() == exp["k"].tolist()
    assert got["v"].tolist() == exp["v"].tolist()
    assert got["tb"].tolist() == exp["tb"].tolist()


@pytest.mark.parametrize("seed", [41, 42])
def test_tumbling_window_matches_duckdb(ray_session, seed):
    from raysketch.pipeline.events import tumbling_window_agg

    rng = random.Random(seed)
    n = 300
    t = pa.table(
        {
            "ts": pa.array(
                [rng.randrange(10_000) * 1_000_000 for _ in range(n)], pa.timestamp("us")
            ),
            "event_type": pa.array([rng.choice("abc") for _ in range(n)]),
            "value": pa.array([round(rng.random(), 6) for _ in range(n)]),
        }
    )
    got = (
        tumbling_window_agg(rd.from_arrow(t).repartition(4), window_s=600)
        .to_pandas()
        .sort_values(["event_type", "window_start"], ignore_index=True)
    )
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    exp = con.sql(
        "SELECT event_type, (floor(epoch(ts))::BIGINT // 600) * 600 AS window_start, "
        "COUNT(*)::BIGINT AS n_events, SUM(value) AS sum_value, "
        "MIN(value) AS min_value, MAX(value) AS max_value "
        "FROM t GROUP BY 1, 2 ORDER BY 1, 2"
    ).df()
    assert got["event_type"].tolist() == exp["event_type"].tolist()
    assert got["window_start"].tolist() == exp["window_start"].tolist()
    assert got["n_events"].tolist() == exp["n_events"].tolist()
    assert np.allclose(got["sum_value"], exp["sum_value"])
    assert np.allclose(got["min_value"], exp["min_value"])
    assert np.allclose(got["max_value"], exp["max_value"])


@pytest.mark.parametrize("seed", [51, 52])
def test_sliding_window_matches_duckdb(ray_session, seed):
    # each event belongs to window_s // slide_s windows; the SQL oracle fans
    # out with generate_series over the same window starts
    from raysketch.pipeline.events import sliding_window_agg

    rng = random.Random(seed)
    n = 200
    t = pa.table(
        {
            "ts": pa.array(
                [rng.randrange(5_000) * 1_000_000 for _ in range(n)], pa.timestamp("us")
            ),
            "event_type": pa.array([rng.choice("ab") for _ in range(n)]),
            "value": pa.array([round(rng.random(), 6) for _ in range(n)]),
        }
    )
    window_s, slide_s = 600, 200
    got = (
        sliding_window_agg(
            rd.from_arrow(t).repartition(3), window_s=window_s, slide_s=slide_s
        )
        .to_pandas()
        .sort_values(["event_type", "window_start"], ignore_index=True)
    )
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    exp = con.sql(
        f"""
        WITH f AS (
          SELECT event_type, value,
                 (floor(epoch(ts))::BIGINT // {slide_s}) * {slide_s} - g.i * {slide_s}
                   AS window_start
          FROM t, generate_series(0, {window_s // slide_s - 1}) g(i)
        )
        SELECT event_type, window_start, COUNT(*)::BIGINT AS n_events,
               SUM(value) AS sum_value
        FROM f GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).df()
    assert got["event_type"].tolist() == exp["event_type"].tolist()
    assert got["window_start"].tolist() == exp["window_start"].tolist()
    assert got["n_events"].tolist() == exp["n_events"].tolist()
    assert np.allclose(got["sum_value"], exp["sum_value"])


@pytest.mark.parametrize("seed", [61, 62])
def test_line_dedup_matches_python_reference(ray_session, seed):
    # random docs built from a small line pool (so hot lines emerge naturally,
    # in BOTH regimes) vs a direct Python reference of the CCNet rule: drop
    # every line appearing in >= min_docs DISTINCT docs, rebuild the text
    from collections import defaultdict

    from raysketch.pipeline.decontam import line_dedup

    rng = random.Random(seed)
    pool = [f"line pool {i}" for i in range(12)]
    docs, texts = [], []
    for d in range(60):
        lines = [rng.choice(pool) for _ in range(rng.randrange(1, 6))]
        docs.append(d)
        texts.append("\n".join(lines))
    min_docs = 5
    df = defaultdict(set)
    for d, tx in zip(docs, texts):
        for ln in set(tx.split("\n")):
            df[ln].add(d)
    hot = {ln for ln, s in df.items() if len(s) >= min_docs}
    expected = {
        d: "\n".join(ln for ln in tx.split("\n") if ln not in hot)
        for d, tx in zip(docs, texts)
    }
    t = pa.table({"doc_id": pa.array(docs, pa.int64()), "text": pa.array(texts)})
    for hot_switch in (5_000_000, 0):  # broadcast regime, then join regime
        out = (
            line_dedup(
                rd.from_arrow(t).repartition(4), min_docs=min_docs, hot_switch=hot_switch
            )
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        got = dict(zip(out["doc_id"], out["clean_text"]))
        assert got == expected, f"hot_switch={hot_switch}"
