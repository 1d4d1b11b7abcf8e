"""Sketch property tests — the reference's confusion-matrix oracle re-expressed
(simple_benchmark.cpp:163-167,305-313 semantics: FN must be 0, FPR ≤ p) plus the
published error bounds the north rule mandates, and merge-algebra checks
(SURVEY.md §5 items 2-3)."""

import numpy as np
import pyarrow as pa
import pytest

from raysketch.sketches.base import sketch_from_bytes
from raysketch.sketches.bloom import BloomSketch, PartitionedBloom, bloom_geometry
from raysketch.sketches.cms import CountMinSketch
from raysketch.sketches.hll import HyperLogLog
from raysketch.sketches.kll import KLL
from raysketch.sketches.tdigest import TDigest

RNG = np.random.default_rng(42)


def _keys(n, prefix="k"):
    return pa.array([f"{prefix}{i:012d}" for i in range(n)])


# ---------------------------------------------------------------------------- bloom


def test_bloom_geometry_textbook():
    m, k = bloom_geometry(1000, 0.01)
    # m = ceil(-n ln p / ln^2 2) ≈ 9585.06 → 9586, rounded up to 64-boundary
    assert 9585 <= m <= 9664 and m % 64 == 0
    assert k == 7  # round(m/n * ln2) ≈ round(6.64..)


@pytest.mark.parametrize("algo", ["classic", "blocked"])
def test_bloom_no_false_negatives(algo):
    n = 20000
    bf = BloomSketch(n, 0.01, algo=algo)
    keys = _keys(n, "in")
    bf.update_column(keys)
    assert bf.count == n
    assert bf.probe_column(keys).all()  # FN = 0, the Bloom invariant


def test_bloom_fpr_at_most_p():
    n = 50000
    bf = BloomSketch(n, 0.01)
    bf.update_column(_keys(n, "in"))
    neg = _keys(50000, "out")
    fp = int(bf.probe_column(neg).sum())
    fpr = fp / 50000
    assert fpr <= 0.015  # 1.5x statistical slack per SURVEY.md §5


def test_bloom_blocked_fpr_reasonable():
    # blocked filters trade FPR for speed; allow a looser bound
    n = 50000
    bf = BloomSketch(n, 0.01, algo="blocked")
    bf.update_column(_keys(n, "in"))
    fpr = bf.probe_column(_keys(50000, "out")).sum() / 50000
    assert fpr <= 0.05


def test_bloom_merge_algebra():
    n = 3000
    parts = [_keys(n, f"p{i}-") for i in range(3)]
    sks = []
    for p in parts:
        s = BloomSketch(3 * n, 0.01)
        s.update_column(p)
        sks.append(s)
    a, b, c = sks
    ab_c = BloomSketch.from_bytes(a.to_bytes()).merge(b).merge(c)
    bc = BloomSketch.from_bytes(b.to_bytes()).merge(c)
    a_bc = BloomSketch.from_bytes(a.to_bytes()).merge(bc)
    assert ab_c.to_bytes() == a_bc.to_bytes()  # bitwise-equal associativity
    # build(1) == merge(P partials) bitwise
    whole = BloomSketch(3 * n, 0.01)
    for p in parts:
        whole.update_column(p)
    assert whole.to_bytes() == ab_c.to_bytes()


def test_bloom_roundtrip():
    bf = BloomSketch(1000, 0.01)
    bf.update_column(_keys(1000))
    back = sketch_from_bytes(bf.to_bytes())
    assert isinstance(back, BloomSketch)
    assert back.probe_column(_keys(1000)).all()
    assert back.m == bf.m and back.count == bf.count


def test_partitioned_bloom_routing_and_merge():
    n = 16000
    pb = PartitionedBloom(n, 0.01, num_shards=16)
    keys = _keys(n, "in")
    pb.update_column(keys)
    assert pb.count == n
    assert pb.probe_column(keys).all()
    fpr = pb.probe_column(_keys(20000, "out")).sum() / 20000
    assert fpr <= 0.02
    # shard-wise merge: two halves == whole
    h1 = PartitionedBloom(n, 0.01, num_shards=16)
    h2 = PartitionedBloom(n, 0.01, num_shards=16)
    h1.update_column(_keys(n, "in").slice(0, n // 2))
    h2.update_column(_keys(n, "in").slice(n // 2))
    assert h1.merge(h2).to_bytes() == pb.to_bytes()


# ---------------------------------------------------------------------------- hll


def test_hll_error_bound():
    for true_n in (1000, 50000):
        h = HyperLogLog(precision=14)
        h.update_column(_keys(true_n))
        est = h.estimate()
        sigma = 1.04 / np.sqrt(h.m)
        assert abs(est - true_n) / true_n <= 3 * sigma + 0.01


def test_hll_merge_is_max_and_matches_single_build():
    a = HyperLogLog(12)
    b = HyperLogLog(12)
    a.update_column(_keys(10000, "a"))
    b.update_column(_keys(10000, "b"))
    whole = HyperLogLog(12)
    whole.update_column(_keys(10000, "a"))
    whole.update_column(_keys(10000, "b"))
    merged = HyperLogLog.from_bytes(a.to_bytes()).merge(b)
    assert np.array_equal(merged.registers, whole.registers)  # bitwise merge identity
    # idempotent: merging the same sketch twice changes nothing
    again = HyperLogLog.from_bytes(merged.to_bytes()).merge(merged)
    assert np.array_equal(again.registers, merged.registers)


def test_hll_roundtrip():
    h = HyperLogLog(10)
    h.update_column(_keys(500))
    back = sketch_from_bytes(h.to_bytes())
    assert back.estimate() == h.estimate()


# ---------------------------------------------------------------------------- cms


def test_cms_overestimate_only_and_bound():
    rng = np.random.default_rng(7)
    # zipf-ish frequencies
    items = np.repeat(np.arange(200), rng.integers(1, 500, size=200))
    col = pa.array([f"item{i}" for i in items])
    cms = CountMinSketch(width=2048, depth=5)
    cms.update_column(col)
    uniq, exact = np.unique(items, return_counts=True)
    est = cms.query_column(pa.array([f"item{i}" for i in uniq]))
    assert (est >= exact).all()  # overestimate-only
    n_total = len(items)
    eps = cms.eps
    viol = (est - exact > eps * n_total).mean()
    assert viol <= cms.delta + 0.01


def test_cms_merge_additive():
    a = CountMinSketch(width=512, depth=4)
    b = CountMinSketch(width=512, depth=4)
    a.update_column(_keys(1000, "x"))
    b.update_column(_keys(1000, "x"))
    whole = CountMinSketch(width=512, depth=4)
    whole.update_column(_keys(1000, "x"))
    whole.update_column(_keys(1000, "x"))
    merged = CountMinSketch.from_bytes(a.to_bytes()).merge(b)
    assert np.array_equal(merged.table, whole.table)
    assert merged.total == 2000


def test_cms_weighted():
    cms = CountMinSketch(width=1024, depth=4)
    cms.update_column(pa.array(["a", "b"]), weights=[10, 3])
    est = cms.query_column(pa.array(["a", "b"]))
    assert est[0] >= 10 and est[1] >= 3
    assert cms.total == 13


# ---------------------------------------------------------------------------- tdigest


def test_tdigest_quantile_accuracy():
    rng = np.random.default_rng(0)
    data = rng.lognormal(0, 1, 200000)
    td = TDigest(compression=200)
    for chunk in np.array_split(data, 10):
        td.update(chunk)
    s = np.sort(data)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        est = td.quantile(q)
        # rank error: where does est fall in the exact CDF?
        rank = np.searchsorted(s, est) / len(s)
        assert abs(rank - q) <= 0.01, (q, rank)


def test_tdigest_merge_accuracy():
    rng = np.random.default_rng(1)
    data = rng.normal(0, 1, 100000)
    parts = np.array_split(data, 8)
    digests = []
    for p in parts:
        t = TDigest(200)
        t.update(p)
        digests.append(t)
    merged = digests[0]
    for d in digests[1:]:
        merged.merge(d)
    s = np.sort(data)
    for q in (0.1, 0.5, 0.9):
        rank = np.searchsorted(s, merged.quantile(q)) / len(s)
        assert abs(rank - q) <= 0.015
    assert merged.total == len(data)


def test_tdigest_roundtrip():
    td = TDigest(100)
    td.update(np.arange(1000.0))
    back = sketch_from_bytes(td.to_bytes())
    assert abs(back.quantile(0.5) - td.quantile(0.5)) < 1e-9


# ---------------------------------------------------------------------------- kll


def test_kll_rank_error_bound():
    rng = np.random.default_rng(3)
    data = rng.uniform(0, 1, 200000)
    kll = KLL(k=200)
    for chunk in np.array_split(data, 20):
        kll.update(chunk)
    s = np.sort(data)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        est = kll.quantile(q)
        rank = np.searchsorted(s, est) / len(s)
        assert abs(rank - q) <= 0.025, (q, rank)  # ~O(1/k) with slack


def test_kll_merge_accuracy():
    rng = np.random.default_rng(4)
    data = rng.normal(5, 2, 100000)
    parts = np.array_split(data, 8)
    sks = []
    for i, p in enumerate(parts):
        k = KLL(k=200, seed=100 + i)
        k.update(p)
        sks.append(k)
    merged = sks[0]
    for s_ in sks[1:]:
        merged.merge(s_)
    s = np.sort(data)
    for q in (0.1, 0.5, 0.9):
        rank = np.searchsorted(s, merged.quantile(q)) / len(s)
        assert abs(rank - q) <= 0.03
    assert merged.total == len(data)


def test_kll_roundtrip():
    k = KLL(k=128)
    k.update(np.arange(5000.0))
    back = sketch_from_bytes(k.to_bytes())
    assert back.quantile(0.5) == k.quantile(0.5)
    assert back.total == 5000


# ---------------------------------------------------------------------------- ddsketch


def test_ddsketch_relative_error_bound():
    from raysketch.sketches.ddsketch import DDSketch

    rng = np.random.default_rng(11)
    data = rng.lognormal(2, 1.5, 100000)
    dd = DDSketch(alpha=0.01)
    for chunk in np.array_split(data, 10):
        dd.update(chunk)
    s = np.sort(data)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        est = dd.quantile(q)
        exact = s[int(q * (len(s) - 1))]
        assert abs(est - exact) <= 0.0101 * exact, (q, est, exact)  # relative err ≤ α


def test_ddsketch_negative_and_zero():
    from raysketch.sketches.ddsketch import DDSketch

    dd = DDSketch(alpha=0.02)
    dd.update([-100.0, -1.0, 0.0, 0.0, 1.0, 100.0])
    assert dd.total == 6
    assert dd.quantile(0.0) <= -98
    assert dd.quantile(0.5) == 0.0
    assert abs(dd.quantile(1.0) - 100) <= 2.1


def test_ddsketch_merge_equals_single_stream():
    from raysketch.sketches.ddsketch import DDSketch

    rng = np.random.default_rng(12)
    data = rng.exponential(10, 50000)
    parts = np.array_split(data, 8)
    merged = DDSketch(alpha=0.01)
    whole = DDSketch(alpha=0.01)
    whole.update(data)
    sks = []
    for p in parts:
        d = DDSketch(alpha=0.01)
        d.update(p)
        sks.append(d)
    merged = sks[0]
    for d in sks[1:]:
        merged.merge(d)
    # merge is exact: same buckets as the single-stream build
    assert merged.pos == whole.pos and merged.total == whole.total


def test_ddsketch_roundtrip():
    from raysketch.sketches.base import sketch_from_bytes
    from raysketch.sketches.ddsketch import DDSketch

    dd = DDSketch(alpha=0.01)
    dd.update(np.arange(1.0, 1000.0))
    back = sketch_from_bytes(dd.to_bytes())
    assert back.quantile(0.5) == dd.quantile(0.5)
    assert back.total == dd.total


# ---------------------------------------------------------------------------- theta


def test_theta_estimate_and_bounds():
    from raysketch.sketches.theta import ThetaSketch

    t = ThetaSketch(k=4096)
    t.update_column(_keys(100000))
    est = t.estimate()
    assert abs(est - 100000) / 100000 <= 3 * t.rel_error


def test_theta_set_algebra():
    from raysketch.sketches.theta import ThetaSketch

    # A = 0..59999, B = 40000..99999 → |A∪B|=100k, |A∩B|=20k, |A\B|=40k
    a = ThetaSketch(k=4096)
    b = ThetaSketch(k=4096)
    a.update_column(_keys(60000))
    b.update_column(pa.array([f"k{i:012d}" for i in range(40000, 100000)]))
    inter = a.intersect_estimate(b)
    diff = a.difference_estimate(b)
    union = ThetaSketch.from_bytes(a.to_bytes()).merge(b).estimate()
    assert abs(union - 100000) / 100000 <= 0.05
    assert abs(inter - 20000) / 20000 <= 0.10
    assert abs(diff - 40000) / 40000 <= 0.08


def test_theta_merge_matches_single_build_exactly():
    from raysketch.sketches.theta import ThetaSketch

    a = ThetaSketch(k=1024)
    b = ThetaSketch(k=1024)
    a.update_column(_keys(5000, "x"))
    b.update_column(_keys(5000, "y"))
    whole = ThetaSketch(k=1024)
    whole.update_column(_keys(5000, "x"))
    whole.update_column(_keys(5000, "y"))
    merged = ThetaSketch.from_bytes(a.to_bytes()).merge(b)
    assert np.array_equal(merged.values, whole.values)
    assert merged.theta == whole.theta


def test_theta_roundtrip():
    from raysketch.sketches.base import sketch_from_bytes
    from raysketch.sketches.theta import ThetaSketch

    t = ThetaSketch(k=256)
    t.update_column(_keys(10000))
    back = sketch_from_bytes(t.to_bytes())
    assert back.estimate() == t.estimate()


def test_bloom_blocked256_invariants():
    """256-bit cache-line blocked layout (bloom_filters.h:94-159): no false
    negatives, FPR well under the 64-bit blocked variant at the same geometry,
    merge/roundtrip identity preserved."""
    import pyarrow as pa

    keys = pa.array([f"key{i}" for i in range(20000)])
    neg = pa.array([f"neg{i}" for i in range(40000)])
    sk = BloomSketch(20000, 0.01, algo="blocked", block_bits=256)
    sk.update_column(keys)
    assert sk.probe_column(keys).all()  # zero false negatives
    fpr256 = sk.probe_column(neg).mean()
    sk64 = BloomSketch(20000, 0.01, algo="blocked", block_bits=64)
    sk64.update_column(keys)
    assert fpr256 < sk64.probe_column(neg).mean()
    assert fpr256 < 0.04
    # split-build OR-merge equals single build bitwise
    a = BloomSketch(20000, 0.01, algo="blocked", block_bits=256)
    b = BloomSketch(20000, 0.01, algo="blocked", block_bits=256)
    a.update_column(keys.slice(0, 10000))
    b.update_column(keys.slice(10000))
    assert a.merge(b).to_bytes() == sk.to_bytes()
    rt = BloomSketch.from_bytes(sk.to_bytes())
    assert rt.to_bytes() == sk.to_bytes()
    # geometry guard: 64/256 variants must not merge
    with pytest.raises(ValueError):
        sk64.merge(sk)


def test_misra_gries_bounds_and_merge():
    """MG guarantees (Misra-Gries'82 + Agarwal et al. PODS'12 mergeable form):
    true - N/(k+1) <= estimate <= true, for any partition/merge tree; every key
    with frequency > N/(k+1) is retained."""
    import pyarrow as pa

    from raysketch.sketches.mg import MisraGries

    rng = np.random.default_rng(7)
    # zipf-ish stream with far more distinct keys than k
    vals = rng.zipf(1.3, size=60_000) % 5000
    keys = np.array([f"k{v}" for v in vals])
    true = {}
    for k_ in keys:
        true[k_] = true.get(k_, 0) + 1
    N = len(keys)

    k = 64
    single = MisraGries(k)
    single.update_column(pa.array(keys))
    # merged from 8 arbitrary partitions
    merged = MisraGries(k)
    for part in np.array_split(keys, 8):
        p = MisraGries(k)
        p.update_column(pa.array(part))
        merged.merge(p)

    for sk in (single, merged):
        assert sk.total == N
        bound = N / (k + 1)
        for key, t in true.items():
            est = sk.estimate(key)
            assert est <= t
            assert est >= t - bound - 1e-9
            if t > bound:
                assert key in sk.counters  # heavy hitters always retained
        assert len(sk.counters) <= k
    # roundtrip
    rt = MisraGries.from_bytes(merged.to_bytes())
    assert rt.counters == merged.counters and rt.total == merged.total


def test_misra_gries_exact_when_k_exceeds_cardinality():
    import pyarrow as pa

    from raysketch.sketches.mg import MisraGries

    mg = MisraGries(100)
    mg.update_column(pa.array(["a"] * 5 + ["b"] * 3 + ["c"]))
    mg2 = MisraGries(100)
    mg2.update_column(pa.array(["a", "c", "c"]))
    mg.merge(mg2)
    assert mg.topk(3) == [("a", 6), ("b", 3), ("c", 3)]


def test_reservoir_uniformity_and_merge():
    """Reservoir invariants: exactly k items once N >= k, all from the stream,
    roughly uniform inclusion (chi-square-loose) both single-stream and across
    an 8-way partition/merge tree."""
    import pyarrow as pa

    from raysketch.sketches.reservoir import ReservoirSample

    stream = np.arange(20_000, dtype=np.int64)
    k = 500

    def build_merged(seed):
        acc = ReservoirSample(k, seed=seed)
        for i, part in enumerate(np.array_split(stream, 8)):
            p = ReservoirSample(k, seed=seed * 1000 + i + 1)
            p.update_column(pa.array(part))
            acc.merge(p)
        return acc

    # inclusion frequency per decile over repeated runs must be ~uniform
    for builder in (
        lambda s: (lambda r: (r.update_column(pa.array(stream)), r)[1])(ReservoirSample(k, seed=s)),
        build_merged,
    ):
        decile_hits = np.zeros(10)
        for seed in range(30):
            r = builder(seed)
            s = np.array(r.sample())
            assert len(s) == k and len(np.unique(s)) == k
            assert r.n_seen == len(stream)
            decile_hits += np.bincount(s // 2000, minlength=10)
        frac = decile_hits / decile_hits.sum()
        assert np.all(np.abs(frac - 0.1) < 0.02), frac
    # roundtrip
    r = build_merged(1)
    rt = ReservoirSample.from_bytes(r.to_bytes())
    assert rt.sample() == r.sample() and rt.n_seen == r.n_seen


def test_reservoir_merge_partial_fill():
    """ADVICE r2 scenario: merging two PARTIALLY-FILLED reservoirs (10+10 items,
    k=16) must always produce min(k, n1+n2) = 16 distinct items with uniform
    inclusion — the old clamped-binomial merge undersized ~10% of such merges."""
    import pyarrow as pa

    from raysketch.sketches.reservoir import ReservoirSample

    k = 16
    counts = np.zeros(20)
    for seed in range(300):
        r1 = ReservoirSample(k, seed=seed)
        r1.update_column(pa.array(np.arange(10, dtype=np.int64)))
        r2 = ReservoirSample(k, seed=seed + 1000)
        r2.update_column(pa.array(np.arange(10, 20, dtype=np.int64)))
        r1.merge(r2)
        s = r1.sample()
        assert len(s) == 16 and len(set(s)) == 16
        assert r1.n_seen == 20
        counts[np.array(s)] += 1
    frac = counts / counts.sum()
    assert np.all(np.abs(frac - 1 / 20) < 0.01), frac  # ~4σ band


def test_bloom_patterned_invariants():
    """Patterned (mask-table) variant, bloom_filters.h:354-536 semantics: one
    precomputed k-bit mask per item — no false negatives, reasonable FPR, and
    deterministic mask table so independent equal-geometry builds OR-merge to
    the same bits as a single build."""
    import pyarrow as pa

    keys = pa.array([f"key{i}" for i in range(20000)])
    neg = pa.array([f"neg{i}" for i in range(40000)])
    sk = BloomSketch(20000, 0.01, algo="patterned")
    sk.update_column(keys)
    assert sk.probe_column(keys).all()
    fpr = sk.probe_column(neg).mean()
    assert fpr < 0.06  # mask reuse costs some FPR vs classic; must stay sane
    a = BloomSketch(20000, 0.01, algo="patterned")
    b = BloomSketch(20000, 0.01, algo="patterned")
    a.update_column(keys.slice(0, 10000))
    b.update_column(keys.slice(10000))
    assert a.merge(b).to_bytes() == sk.to_bytes()
    rt = BloomSketch.from_bytes(sk.to_bytes())
    assert rt.probe_column(keys).all() and rt.to_bytes() == sk.to_bytes()


# ---------------------------------------------------------------------- counting bloom


def test_counting_bloom_delete_is_exact_inverse():
    """insert(A ∪ B); delete(B) leaves counters element-wise identical to a
    fresh insert(A) — the Summary-Cache deletable guarantee, checkable exactly
    because no counter saturates at these sizes."""
    from raysketch.sketches.counting_bloom import CountingBloom

    a = _keys(15000, "keep")
    b = _keys(5000, "drop")
    cb = CountingBloom(20000, 0.01)
    cb.update_column(a)
    cb.update_column(b)
    assert cb.probe_column(a).all() and cb.probe_column(b).all()
    cb.delete_column(b)
    ref = CountingBloom(20000, 0.01)
    ref.update_column(a)
    assert np.array_equal(cb._cnt, ref._cnt)
    assert cb.count == 15000
    # survivors: no false negatives; deleted keys revert to fp-rate membership
    assert cb.probe_column(a).all()
    assert cb.probe_column(b).mean() < 0.05
    fresh = _keys(40000, "neg")
    assert cb.probe_column(fresh).mean() <= 2 * 0.01 + 0.003


def test_counting_bloom_merge_saturating_and_roundtrip():
    from raysketch.sketches.base import sketch_from_bytes
    from raysketch.sketches.counting_bloom import CountingBloom, SATURATE

    keys = _keys(20000)
    one = CountingBloom(20000, 0.01)
    one.update_column(keys)
    p1, p2 = CountingBloom(20000, 0.01), CountingBloom(20000, 0.01)
    p1.update_column(keys.slice(0, 8000))
    p2.update_column(keys.slice(8000))
    assert np.array_equal(p1.merge(p2)._cnt, one._cnt)  # merge ≡ single build
    rt = sketch_from_bytes(one.to_bytes())
    assert np.array_equal(rt._cnt, one._cnt) and rt.count == one.count
    # saturating add is pinned, never wraps
    s1, s2 = CountingBloom(64, 0.5), CountingBloom(64, 0.5)
    s1._cnt[:] = SATURATE - 1
    s2._cnt[:] = 5
    s1.merge(s2)
    assert (s1._cnt == SATURATE).all()
    s1.delete_hashes(np.array([1], dtype=np.uint32), np.array([2], dtype=np.uint32))
    assert (s1._cnt == SATURATE).all()  # pinned counters never decrement


def test_bloom_cardinality_estimate():
    """Swamidass–Baldi fill-ratio estimate within a few % at half load, for the
    plain filter and the counting variant (same estimator, counter>0 bits)."""
    from raysketch.sketches.counting_bloom import CountingBloom

    n = 30000
    bf = BloomSketch(2 * n, 0.01)
    bf.update_column(_keys(n))
    assert abs(bf.estimate_cardinality() - n) / n < 0.03
    cb = CountingBloom(2 * n, 0.01)
    cb.update_column(_keys(n))
    assert abs(cb.estimate_cardinality() - n) / n < 0.03
    cb.delete_column(_keys(n // 2))  # first half deleted
    est = cb.estimate_cardinality()
    assert abs(est - n / 2) / (n / 2) < 0.05  # estimate tracks deletions


def test_sketch_registry_self_populates():
    """A fresh worker process may deserialize a blob without having imported the
    producing sketch module — sketch_from_bytes must lazily populate the
    registry rather than raise 'unregistered sketch kind' (the bloom_delete
    contract query hit exactly this in a cold Ray worker)."""
    from raysketch.sketches import base
    from raysketch.sketches.counting_bloom import CountingBloom

    cb = CountingBloom(100, 0.01)
    cb.update_column(_keys(50))
    blob = cb.to_bytes()
    saved = dict(base._REGISTRY)
    try:
        base._REGISTRY.clear()
        rt = base.sketch_from_bytes(blob)  # must self-heal, not KeyError
        assert np.array_equal(rt._cnt, cb._cnt)
    finally:
        base._REGISTRY.update(saved)
