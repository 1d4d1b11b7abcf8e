"""Randomized property tests: dedup/decontam operators vs independent oracles.

jaccard_ngram_dedup claims EXACT all-pairs clustering (the prefix filter is a
completeness-preserving candidate generator, unlike LSH) — so on random corpora
a brute-force all-pairs union-find over exact word-shingle Jaccard must match
its clusters EXACTLY, every trial. hot_ngrams and decontaminate get direct
Python references of their stated rules (distinct-doc n-gram df; per-doc
distinct overlap counts).
"""

from __future__ import annotations

import random
from collections import defaultdict

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


def _random_docs(rng, n_docs, vocab, min_len=3, max_len=12):
    texts = []
    for _ in range(n_docs):
        n = rng.randrange(min_len, max_len)
        texts.append(" ".join(rng.choice(vocab) for _ in range(n)))
    # plant some near-dup pairs: copy with a one-token edit
    for _ in range(n_docs // 5):
        src = rng.randrange(len(texts))
        toks = texts[src].split()
        if len(toks) > 4:
            toks[rng.randrange(len(toks))] = rng.choice(vocab)
        texts.append(" ".join(toks))
    return texts


def _shingles(text, k=3):
    toks = text.split()
    if not toks:
        return frozenset([("",)])
    if len(toks) < k:
        return frozenset([tuple(toks)])
    return frozenset(tuple(toks[i : i + k]) for i in range(len(toks) - k + 1))


def _brute_clusters(texts, threshold, k=3):
    """All-pairs exact Jaccard >= threshold -> union-find -> {id: min-id}."""
    sh = [_shingles(t, k) for t in texts]
    parent = list(range(len(texts)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            inter = len(sh[i] & sh[j])
            union = len(sh[i] | sh[j])
            if union and inter / union >= threshold:
                a, b = find(i), find(j)
                if a != b:
                    parent[max(a, b)] = min(a, b)
    out = {}
    for i in range(len(texts)):
        r = find(i)
        members = [j for j in range(len(texts)) if find(j) == r]
        if len(members) > 1:
            out[i] = min(members)
    return out


@pytest.mark.parametrize("seed", [71, 72, 73])
def test_jaccard_dedup_matches_brute_force(ray_session, seed):
    from raysketch.pipeline.dedup import jaccard_ngram_dedup

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(30)]
    texts = _random_docs(rng, 40, vocab)
    expected = _brute_clusters(texts, threshold=0.8)
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
    )
    got_t = jaccard_ngram_dedup(rd.from_arrow(t).repartition(4), threshold=0.8)
    got = dict(
        zip(
            got_t.column("doc_id").to_pylist(),
            got_t.column("cluster_id").to_pylist(),
        )
    )
    # exact completeness AND precision: identical membership and labels
    # (64-bit shingle-hash collisions are ~impossible at this scale)
    assert got == expected, f"seed={seed}"


def _ngrams(text, n):
    toks = text.split()
    return set(tuple(toks[i : i + n]) for i in range(len(toks) - n + 1))


@pytest.mark.parametrize("seed", [81, 82])
@pytest.mark.parametrize("hot_switch", [5_000_000, 0])
def test_hot_ngrams_matches_reference(ray_session, seed, hot_switch):
    # (ngram, n_docs) for every word n-gram in >= min_docs DISTINCT docs —
    # both regimes must agree with the direct Python count
    from raysketch.pipeline.decontam import hot_ngrams

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab -> hot n-grams emerge
    texts = _random_docs(rng, 50, vocab, min_len=4, max_len=10)
    n, min_docs = 3, 5
    df = defaultdict(set)
    for d, tx in enumerate(texts):
        for g in _ngrams(tx, n):
            df[g].add(d)
    expected = {
        " ".join(g): len(s) for g, s in df.items() if len(s) >= min_docs
    }
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
    )
    out = hot_ngrams(
        rd.from_arrow(t).repartition(4), n=n, min_docs=min_docs, hot_switch=hot_switch
    )
    got = dict(zip(out.column("ngram").to_pylist(), out.column("n_docs").to_pylist()))
    assert got == expected, f"seed={seed} hot_switch={hot_switch}"


@pytest.mark.parametrize("seed", [91, 92])
def test_decontaminate_matches_reference(ray_session, seed):
    # overlap_ngrams = COUNT(DISTINCT n-grams shared with the bench set),
    # rows only for docs with >= min_overlap
    from raysketch.pipeline.decontam import decontaminate

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(15)]
    texts = _random_docs(rng, 40, vocab, min_len=4, max_len=9)
    bench_texts = texts[:5] + _random_docs(rng, 3, vocab, min_len=4, max_len=9)
    n, min_overlap = 3, 1
    bench_grams = set()
    for tx in bench_texts:
        bench_grams |= _ngrams(tx, n)
    expected = {}
    for d, tx in enumerate(texts):
        ov = len(_ngrams(tx, n) & bench_grams)
        if ov >= min_overlap:
            expected[d] = ov
    corpus = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
    )
    bench = pa.table(
        {
            "doc_id": pa.array(range(len(bench_texts)), pa.int64()),
            "text": pa.array(bench_texts),
        }
    )
    out = pa.concat_tables(
        b
        for b in decontaminate(
            rd.from_arrow(corpus).repartition(4),
            rd.from_arrow(bench),
            n=n,
            min_overlap=min_overlap,
        ).iter_batches(batch_format="pyarrow")
    )
    got = dict(
        zip(out.column("doc_id").to_pylist(), out.column("overlap_ngrams").to_pylist())
    )
    assert got == expected, f"seed={seed}"


@pytest.mark.parametrize("seed", [101, 102, 103])
def test_simhash_dedup_matches_brute_force(ray_session, seed):
    # the 4x16-bit band buckets are pigeonhole-COMPLETE for Hamming <= 3, so
    # brute-force clustering over the same simhash64 fingerprints must match
    # exactly — this pins the banding, pair emission, vectorized Hamming
    # verify and distributed CC (the fingerprint definition itself is pinned
    # by its own unit tests)
    from raysketch.pipeline.dedup import simhash64, simhash_dedup

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(25)]
    texts = _random_docs(rng, 45, vocab, min_len=4, max_len=10)
    fp = simhash64(pa.array(texts))
    max_h = 3
    parent = list(range(len(texts)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            if bin(int(fp[i]) ^ int(fp[j])).count("1") <= max_h:
                a, b = find(i), find(j)
                if a != b:
                    parent[max(a, b)] = min(a, b)
    expected = {}
    for i in range(len(texts)):
        r = find(i)
        members = [j for j in range(len(texts)) if find(j) == r]
        if len(members) > 1:
            expected[i] = min(members)
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
    )
    out = simhash_dedup(rd.from_arrow(t).repartition(4), max_hamming=max_h)
    got = dict(
        zip(out.column("doc_id").to_pylist(), out.column("cluster_id").to_pylist())
    )
    assert got == expected, f"seed={seed}"


@pytest.mark.parametrize("seed", [111, 112])
def test_dup_span_and_rare_token_regime_equality(ray_session, seed):
    # the broadcast and join regimes of dup_span_stats and rare_token_stats
    # must produce identical tables on random corpora (the regime switch is a
    # pure scale decision, never a semantics change)
    from raysketch.pipeline.decontam import dup_span_stats
    from raysketch.pipeline.text import rare_token_stats

    rng = random.Random(seed)
    vocab = [f"tok{i}" for i in range(18)]
    texts = _random_docs(rng, 45, vocab, min_len=4, max_len=14)
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
    )

    def collect(ds_out, sort_cols):
        return (
            pa.concat_tables(
                b for b in ds_out.iter_batches(batch_format="pyarrow") if b.num_rows
            )
            .to_pandas()
            .sort_values(sort_cols, ignore_index=True)
        )

    a = collect(
        dup_span_stats(rd.from_arrow(t).repartition(4), window=16), ["doc_id"]
    )
    b = collect(
        dup_span_stats(rd.from_arrow(t).repartition(4), window=16, dup_switch=0),
        ["doc_id"],
    )
    pd.testing.assert_frame_equal(a, b)

    a = collect(rare_token_stats(rd.from_arrow(t).repartition(4), min_df=3), ["doc_id"])
    b = collect(
        rare_token_stats(
            rd.from_arrow(t).repartition(4), min_df=3, common_switch=0
        ),
        ["doc_id"],
    )
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.parametrize("seed", [121, 122])
def test_minhash_pair_payload_regimes_identical(ray_session, monkeypatch, seed):
    # _attach_pair_payload's Bloom-prefilter join regime (the 10^9-pairs scale
    # path) must produce the same clusters as the broadcast regime — forced by
    # wrapping the module-level function with broadcast_limit=0
    import raysketch.pipeline.dedup as dd

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(30)]
    texts = _random_docs(rng, 40, vocab)
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
    )

    def run():
        out = dd.minhash_lsh_dedup(rd.from_arrow(t).repartition(4))
        return dict(
            zip(out.column("doc_id").to_pylist(), out.column("cluster_id").to_pylist())
        )

    base = run()
    orig = dd._attach_pair_payload
    monkeypatch.setattr(
        dd,
        "_attach_pair_payload",
        lambda *a, **k: orig(*a, **{**k, "broadcast_limit": 0}),
    )
    forced = run()
    assert forced == base, f"seed={seed}"
    assert base  # the planted near-dups guarantee at least one cluster


@pytest.mark.parametrize("seed", [131, 132])
def test_minhash_hot_member_regimes_identical(ray_session, monkeypatch, seed):
    # _hot_members' distributed semi-join regime (hot buckets past the
    # broadcast limit) must reproduce the broadcast regime's clusters too
    import raysketch.pipeline.dedup as dd

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(30)]
    texts = _random_docs(rng, 40, vocab)
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
    )

    def run():
        out = dd.minhash_lsh_dedup(rd.from_arrow(t).repartition(4))
        return dict(
            zip(out.column("doc_id").to_pylist(), out.column("cluster_id").to_pylist())
        )

    base = run()
    orig = dd._hot_members
    monkeypatch.setattr(
        dd, "_hot_members", lambda *a, **k: orig(*a, **{**k, "broadcast_limit": 0})
    )
    forced = run()
    assert forced == base and base, f"seed={seed}"
