"""rare_token_stats (both regimes) + redact_batch (raysketch.pipeline.text)."""

import numpy as np
import pyarrow as pa
import pytest

from raysketch.pipeline.text import _EMAIL_RE, rare_token_stats, redact_batch


def _fixture_ds(repart=3):
    import ray.data as rd

    # df: 'a'→4 docs, 'b'→3, 'c'→2, unique u{i}→1
    texts = [
        "a b c u0 u0",
        "a b c u1",
        "a b u2",
        "a u3 u3 u3",
    ]
    ds = rd.from_arrow(pa.table({"doc_id": list(range(4)), "text": texts}))
    return ds.repartition(repart)


EXPECT = {
    # min_df=3 → common = {a, b}; rare occurrences: c + u's
    0: (5, 3),  # c u0 u0
    1: (4, 2),  # c u1
    2: (3, 1),  # u2
    3: (4, 3),  # u3 ×3
}


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("switch", [5_000_000, 0], ids=["broadcast", "join"])
def test_rare_token_stats_both_regimes(switch):
    out = (
        rare_token_stats(_fixture_ds(), min_df=3, common_switch=switch)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    got = {
        int(r.doc_id): (int(r.n_tokens), int(r.n_rare)) for r in out.itertuples()
    }
    assert got == EXPECT


def test_redact_batch_counts_and_replacement():
    t = pa.table(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "write to alice@example.com or bob@test.org now",
                "no emails here, not@adomainless one",
                "",
            ],
        }
    )
    out = redact_batch(t)
    assert out.column("n_matches").to_pylist() == [2, 0, 0]
    red = out.column("text").to_pylist()
    assert red[0] == "write to [REDACTED] or [REDACTED] now"
    assert "@" in red[1]  # decoy untouched
    assert out.column("redacted_len").to_pylist() == [len(r) for r in red]
    # regex exported for oracle parity
    assert "@" in _EMAIL_RE


def test_normalize_batch():
    from raysketch.pipeline.text import normalize_batch

    t = pa.table(
        {
            "doc_id": [0, 1, 2],
            "text": ["  Hello\t WORLD  x ", "a  b\n\nc", ""],
        }
    )
    out = normalize_batch(t)
    assert out.column("text").to_pylist() == ["hello world x", "a b c", ""]
    assert out.column_names == ["doc_id", "text"]


@pytest.mark.usefixtures("ray_session")
def test_length_filter_exact_thresholds():
    import ray.data as rd

    from raysketch.pipeline.text import bounded_quantile_thresholds, length_filter

    vals = list(range(1, 101))  # 1..100, distinct
    ds = rd.from_arrow(pa.table({"doc_id": list(range(100)), "n_chars": vals})).repartition(4)
    lo, hi = bounded_quantile_thresholds(ds, "n_chars", 0.05, 0.95)
    # ceil(0.05*100)=5 -> smallest v with cum>=5 is 5; ceil(0.95*100)=95 -> 95
    assert (lo, hi) == (5, 95)
    kept, lo2, hi2 = length_filter(ds, col="n_chars")
    assert (lo2, hi2) == (5, 95)
    got = sorted(kept.to_pandas()["n_chars"])
    assert got == list(range(5, 96))


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("switch", [5_000_000, 0], ids=["broadcast", "join"])
def test_rare_token_stats_empty_doc_regimes_agree(switch):
    """Zero-token docs must appear with (0, 0) in BOTH regimes."""
    import ray.data as rd

    t = pa.table({"doc_id": [0, 1, 2], "text": ["a a b", "", "   "]})
    out = (
        rare_token_stats(rd.from_arrow(t).repartition(2), min_df=2, common_switch=switch)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert out["doc_id"].tolist() == [0, 1, 2]
    assert out["n_tokens"].tolist() == [3, 0, 0]
    # 'a' df=1 <2 rare (2 occurrences), 'b' df=1 rare: all 3 rare
    assert out["n_rare"].tolist() == [3, 0, 0]
