"""Decontamination + hot-ngram operators (raysketch.pipeline.decontam)."""

import numpy as np
import pyarrow as pa
import pytest

from raysketch.pipeline.decontam import (
    _doc_tokens,
    _ngram_occurrences,
    _per_doc_distinct,
    decontaminate,
    hot_ngrams,
)


def _py_ngrams(text: str, n: int) -> list[str]:
    toks = text.split()
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def test_ngram_occurrences_sql_parity():
    """Full-width n-grams only; docs with < n tokens emit NOTHING (the SQL
    lead()-window semantics), and hash-distinctness matches string-distinctness
    on a small vocabulary."""
    texts = pa.array(["a b c d", "x y", "", "a b c", "p  q   r s"])
    _, th, offs = _doc_tokens(texts)
    starts, h, doc = _ngram_occurrences(th, offs, 3)
    # doc0: 2 trigrams; doc1: 0 (2 toks); doc2: 0; doc3: 1; doc4: 2 (ws runs)
    assert np.bincount(doc, minlength=5).tolist() == [2, 0, 0, 1, 2]
    py = sum((_py_ngrams(t.as_py(), 3) for t in texts), [])
    # distinct hash count == distinct string count (no collisions here)
    assert len(np.unique(h)) == len(set(py))
    # equal strings -> equal hashes: "a b c" appears in doc0 and doc3
    by_doc = {d: set(h[doc == d]) for d in range(5)}
    assert by_doc[0] & by_doc[3]


def test_per_doc_distinct():
    h = np.array([5, 5, 7, 5, 7, 7], dtype=np.uint64)
    doc = np.array([0, 0, 0, 1, 1, 1], dtype=np.int64)
    hd, dd = _per_doc_distinct(h, doc)
    assert sorted(zip(dd.tolist(), hd.tolist())) == [(0, 5), (0, 7), (1, 5), (1, 7)]


@pytest.mark.usefixtures("ray_session")
def test_decontaminate_planted():
    """Bench doc shares an exact 4-gram window with two corpus docs; counts are
    per-doc-distinct (doc 2 repeats the contaminated window but counts each
    distinct 4-gram once)."""
    import ray.data as rd

    bench = rd.from_arrow(pa.table({"doc_id": [100], "text": ["q1 q2 q3 q4 q5"]}))
    corpus = rd.from_arrow(
        pa.table(
            {
                "doc_id": [0, 1, 2, 3],
                "text": [
                    "z0 q1 q2 q3 q4 z1",  # one bench 4-gram
                    "c0 c1 c2 c3 c4 c5",  # clean
                    "q1 q2 q3 q4 q5 q1 q2 q3 q4 q5",  # both 4-grams, repeated
                    "q4 q3 q2 q1",  # right tokens, wrong order
                ],
            }
        )
    )
    out = (
        decontaminate(corpus, bench, n=4, min_overlap=1)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert out["doc_id"].tolist() == [0, 2]
    # doc2 text has 7 windows but only 2 distinct bench 4-grams
    assert out["overlap_ngrams"].tolist() == [1, 2]


@pytest.mark.usefixtures("ray_session")
def test_hot_ngrams_matches_python_reference():
    import ray.data as rd

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(12)]
    texts = [" ".join(rng.choice(vocab, size=30)) for _ in range(60)]
    ds = rd.from_arrow(pa.table({"text": texts})).repartition(4)
    out = hot_ngrams(ds, n=2, min_docs=8)
    # pure-Python distinct-doc counts
    from collections import Counter

    c = Counter()
    for t in texts:
        c.update(set(_py_ngrams(t, 2)))
    truth = sorted((g, n) for g, n in c.items() if n >= 8)
    got = list(zip(out.column("ngram").to_pylist(), out.column("n_docs").to_pylist()))
    assert got == truth
    assert len(truth) > 5  # fixture actually exercises the threshold


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("switch", [5_000_000, 0], ids=["broadcast", "join"])
def test_dup_span_stats_both_regimes(switch):
    """Planted shared substring: docs 0/1 share an exact 8-char span
    ('SHAREDXY'), doc 2 is unique, doc 3 is shorter than the window (no row)."""
    import ray.data as rd

    from raysketch.pipeline.decontam import dup_span_stats

    texts = [
        "aaaaSHAREDXYbbbb",
        "ccccSHAREDXYdddd",
        "eeeeffffgggghhhh",
        "short",
    ]
    ds = rd.from_arrow(pa.table({"doc_id": [0, 1, 2, 3], "text": texts})).repartition(3)
    out = (
        dup_span_stats(ds, window=8, dup_switch=switch)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert out["doc_id"].tolist() == [0, 1, 2]
    assert out["n_windows"].tolist() == [9, 9, 9]
    # only the single exactly-aligned 'SHAREDXY' window is shared
    assert out["n_dup_windows"].tolist() == [1, 1, 0]


@pytest.mark.usefixtures("ray_session")
def test_hot_ngrams_empty_hot_set():
    """min_docs above any df → empty result with a stable schema (the all-empty
    Dataset → pandas path loses column names; regression for the bench crash)."""
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"text": ["a b c", "d e f"]}))
    out = hot_ngrams(ds, n=2, min_docs=99)
    assert out.num_rows == 0
    assert out.column_names == ["ngram", "n_docs"]


@pytest.mark.usefixtures("ray_session")
def test_df_counts_matches_pandas_groupby():
    """_df_counts ≡ groupby-sum on random (h, c) partials, incl. min_count."""
    import pandas as pd
    import ray.data as rd

    from raysketch.pipeline.decontam import _df_counts

    rng = np.random.default_rng(5)
    h = rng.integers(-50, 50, size=5000).astype(np.int64)
    c = rng.integers(1, 4, size=5000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"h": h, "c": c})).repartition(7)
    got = (
        _df_counts(ds, out_col="n", min_count=120)
        .to_pandas()
        .sort_values("h", ignore_index=True)
    )
    want = pd.DataFrame({"h": h, "c": c}).groupby("h", as_index=False)["c"].sum()
    want = want[want["c"] >= 120].rename(columns={"c": "n"}).reset_index(drop=True)
    assert got["h"].tolist() == want["h"].tolist()
    assert got["n"].tolist() == want["n"].tolist()


def test_char_window_hashes_string_parity():
    """Window-hash equality ≡ substring equality on a random ASCII fixture."""
    from raysketch.pipeline.decontam import _char_window_hashes

    rng = np.random.default_rng(9)
    alpha = np.array(list("abcd"))
    texts = ["".join(rng.choice(alpha, size=rng.integers(0, 30))) for _ in range(200)]
    L = 5
    h, doc, nwin = _char_window_hashes(pa.array(texts), L)
    subs = [t[i : i + L] for t in texts for i in range(max(len(t) - L + 1, 0))]
    assert len(h) == len(subs)
    assert nwin.tolist() == [max(len(t) - L + 1, 0) for t in texts]
    # same hash <-> same substring (alphabet tiny => plenty of collisions to test)
    import collections

    by_hash = collections.defaultdict(set)
    for hh, s in zip(h, subs):
        by_hash[int(hh)].add(s)
    assert all(len(v) == 1 for v in by_hash.values())
    by_str = collections.defaultdict(set)
    for hh, s in zip(h, subs):
        by_str[s].add(int(hh))
    assert all(len(v) == 1 for v in by_str.values())


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("switch", [5_000_000, 0], ids=["broadcast", "join"])
def test_hot_ngrams_both_regimes(switch):
    """Both recovery regimes (broadcast hot set vs distributed hash-join,
    VERDICT r4 next-round #2) produce the identical hot table."""
    import ray.data as rd

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(12)]
    texts = [" ".join(rng.choice(vocab, size=30)) for _ in range(60)]
    ds = rd.from_arrow(pa.table({"text": texts})).repartition(4)
    out = hot_ngrams(ds, n=2, min_docs=8, hot_switch=switch)
    from collections import Counter

    c = Counter()
    for t in texts:
        c.update(set(_py_ngrams(t, 2)))
    truth = sorted((g, n) for g, n in c.items() if n >= 8)
    got = list(zip(out.column("ngram").to_pylist(), out.column("n_docs").to_pylist()))
    assert got == truth


@pytest.mark.usefixtures("ray_session")
def test_hot_ngrams_recovery_driver_bounded():
    """The r4 weak item: boilerplate present in EVERY block used to ship
    O(hot x blocks) recovery rows to the driver. Now the per-hash
    representative reduces distributedly — the driver sees only the
    <= 2-per-block edge fixup — and the strings still come out right."""
    import ray.data as rd

    nblocks, per_block = 30, 10
    boiler = "all rights reserved worldwide"  # 4 hot trigram-source tokens
    texts = [
        f"{boiler} unique{i} filler{i} tail{i}" for i in range(nblocks * per_block)
    ]
    ds = rd.from_arrow(pa.table({"text": texts})).repartition(nblocks)
    stats: dict = {}
    out = hot_ngrams(ds, n=3, min_docs=50, _stats=stats)
    hot = set(out.column("ngram").to_pylist())
    assert "all rights reserved" in hot
    assert "rights reserved worldwide" in hot
    # every unique{i}-containing trigram is below threshold
    assert all("unique" not in g for g in hot)
    assert out.column("n_docs").to_pylist() == [nblocks * per_block] * out.num_rows
    # hot x blocks would be 2 * 30 = 60+ recovery rows at the driver; the edge
    # set is bounded by sorted blocks, not by (hot x blocks)
    assert stats["edge_rows"] <= 2 * (nblocks + 4)


@pytest.mark.usefixtures("ray_session")
def test_hot_ngrams_as_dataset():
    """The 100 TB escape hatch returns a Dataset and never collects."""
    import ray.data as rd

    texts = ["spam ham eggs"] * 12 + ["one off text"]
    ds = rd.from_arrow(pa.table({"text": texts})).repartition(3)
    out = hot_ngrams(ds, n=3, min_docs=5, as_dataset=True)
    rows = sorted(
        (r["ngram"], r["n_docs"]) for r in out.take_all()
    )
    assert rows == [("spam ham eggs", 12)]
