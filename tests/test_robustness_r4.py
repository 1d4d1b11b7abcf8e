"""Round-4 robustness fixes (ADVICE r3): empty-partition joins, offset-overflow
guard, rotate-by-zero guard, empty-dataset quantiles, reservoir value typing."""

import numpy as np
import pyarrow as pa
import pytest

from raysketch.pipeline.dedup import _pack_u64_binary, exact_dedup
from raysketch.pipeline.decontam import _ngram_occurrences
from raysketch.pipeline.text import bounded_quantile_thresholds
from raysketch.sketches.weighted_reservoir import WeightedReservoir


def test_exact_dedup_join_strategy_small_skewed(ray_session):
    """strategy='join' on tiny, skewed data: keyed repartition leaves empty
    blocks; the coalescing repartition must keep Acero's join alive and the
    output identical to the broadcast path."""
    import ray.data as rd

    rows = [{"doc_id": i, "text": "same text" if i % 2 else f"t{i}"} for i in range(10)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
    out_join = sorted(r["doc_id"] for r in exact_dedup(ds, strategy="join", num_partitions=8).take_all())
    out_bcast = sorted(r["doc_id"] for r in exact_dedup(ds, strategy="broadcast").take_all())
    assert out_join == out_bcast
    assert 1 in out_join  # min doc_id of the "same text" group


def test_pack_u64_binary_always_large():
    """Packed blobs are large_binary (int64 offsets) for EVERY block — immune
    to the 2 GiB int32-offset wrap (r5: VERDICT next-round #7) without the
    mixed binary/large_binary schemas a per-block size-triggered promotion
    would hand downstream joins (r5 review)."""
    vals = np.arange(5, dtype=np.uint64)
    counts = np.array([2, 3], dtype=np.int64)
    packed = _pack_u64_binary(vals, counts)
    assert packed.type == pa.large_binary()
    assert packed.to_pylist() == [vals[:2].tobytes(), vals[2:].tobytes()]


def test_ngram_rotate_by_zero_guard():
    # n=30 makes pos=29 hit r=(13*29+7)%64 == 0 — formerly a shift-by-64 UB path
    th = (np.arange(40, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))
    doc_offs = np.array([0, 40], dtype=np.int64)
    s1, h1, d1 = _ngram_occurrences(th, doc_offs, 30)
    s2, h2, d2 = _ngram_occurrences(th, doc_offs, 30)
    assert len(h1) == 40 - 30 + 1
    np.testing.assert_array_equal(h1, h2)
    # identity rotate at r=0: the pos-29 term must contribute t itself, which
    # distinct inputs keep distinct
    assert len(np.unique(h1)) == len(h1)


def test_bounded_quantile_thresholds_empty_raises(ray_session):
    import ray.data as rd

    empty = rd.from_arrow(pa.table({"n_chars": pa.array([], pa.int64())}))
    with pytest.raises(ValueError, match="no rows"):
        bounded_quantile_thresholds(empty, "n_chars")


def test_weighted_reservoir_rejects_binary_values():
    sk = WeightedReservoir(k=4)
    vals = pa.array([b"ab", b"cd"], pa.binary())
    with pytest.raises(TypeError, match="binary"):
        sk.update_columns(vals, np.array([1.0, 2.0]))


def test_weighted_reservoir_size_bytes_counts_value_payload():
    sk = WeightedReservoir(k=4)
    sk.update_columns(pa.array(["x" * 100, "y"]), np.array([1.0, 2.0]))
    assert sk.size_bytes >= 100  # payload, not just 24*k bookkeeping
    WeightedReservoir.from_bytes(sk.to_bytes())  # still round-trips
