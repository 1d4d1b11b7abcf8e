"""Hashing kernel tests: golden vectors + scalar↔vectorized equivalence.

Golden vectors come from the published verification values of MurmurHash3 x86_32
(Appleby's SMHasher) and XXH64 (Collet's xxHash spec), the same algorithms the
reference vendors (bloom.h:150-219, external/xxhash.h)."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from raysketch.hashing import (
    CLASSIC_SEEDS,
    GLOOM_SEEDS,
    column_spans,
    hash_column,
    hash_pair,
    murmur3_32_scalar,
    murmur3_32_vec,
    shard_of,
    xxh64_scalar,
    xxh64_vec,
)

MURMUR_GOLDEN = [
    (b"", 0, 0x00000000),
    (b"", 1, 0x514E28B7),
    (b"", 0xFFFFFFFF, 0x81F16F39),
    (b"test", 0x9747B28C, 0x704B81DC),
    (b"Hello, world!", 0x9747B28C, 0x24884CBA),
    (b"The quick brown fox jumps over the lazy dog", 0x9747B28C, 0x2FA826CD),
]

XXH64_GOLDEN = [
    (b"", 0, 0xEF46DB3751D8E999),
    (b"a", 0, 0xD24EC4F1A98C6E5B),
    (b"abc", 0, 0x44BC2CF5AD770999),
]


@pytest.mark.parametrize("data,seed,expect", MURMUR_GOLDEN)
def test_murmur3_scalar_golden(data, seed, expect):
    assert murmur3_32_scalar(data, seed) == expect


@pytest.mark.parametrize("data,seed,expect", XXH64_GOLDEN)
def test_xxh64_scalar_golden(data, seed, expect):
    assert xxh64_scalar(data, seed) == expect


def _spans_of(items: list[bytes]):
    lengths = np.array([len(b) for b in items], dtype=np.int64)
    starts = np.zeros(len(items), dtype=np.int64)
    if len(items) > 1:
        np.cumsum(lengths[:-1], out=starts[1:])
    data = np.frombuffer(b"".join(items), dtype=np.uint8)
    return data, starts, lengths


def test_vec_matches_scalar_structured():
    # lengths covering every tail case, block boundary, and stripe boundary
    items = [bytes(range(i % 251)) * (1 + i // 7) for i in range(0, 80)]
    items += [b"", b"a", b"ab", b"abc", b"abcd", b"x" * 31, b"x" * 32, b"x" * 33, b"y" * 1000]
    data, starts, lengths = _spans_of(items)
    for seed in (0, 1, 0x87654321, 0x9E3779B97F4A7C15):
        got_m = murmur3_32_vec(data, starts, lengths, seed)
        want_m = [murmur3_32_scalar(b, seed) for b in items]
        assert got_m.tolist() == want_m
        got_x = xxh64_vec(data, starts, lengths, seed)
        want_x = [xxh64_scalar(b, seed) for b in items]
        assert got_x.tolist() == want_x


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.binary(min_size=0, max_size=200), min_size=1, max_size=50),
    st.integers(min_value=0, max_value=2**63),
)
def test_vec_matches_scalar_hypothesis(items, seed):
    data, starts, lengths = _spans_of(items)
    assert murmur3_32_vec(data, starts, lengths, seed & 0xFFFFFFFF).tolist() == [
        murmur3_32_scalar(b, seed & 0xFFFFFFFF) for b in items
    ]
    assert xxh64_vec(data, starts, lengths, seed).tolist() == [
        xxh64_scalar(b, seed) for b in items
    ]


def test_arrow_string_column_zero_copy():
    arr = pa.array(["hello", "", "world", "a" * 100, None, "tail123"])
    h = hash_column(arr, algo="xxh64", seed=0)
    assert h[0] == xxh64_scalar(b"hello", 0)
    assert h[1] == xxh64_scalar(b"", 0)
    assert h[4] == xxh64_scalar(b"", 0)  # null hashes as empty
    assert h[5] == xxh64_scalar(b"tail123", 0)


def test_arrow_sliced_column():
    arr = pa.array(["aaa", "bbb", "ccc", "ddd"]).slice(1, 2)
    h = hash_column(arr, algo="murmur3", seed=7)
    assert h.tolist() == [murmur3_32_scalar(b"bbb", 7), murmur3_32_scalar(b"ccc", 7)]


def test_int64_column_little_endian_bytes():
    # trivially-copyable branch: hash of the 8 LE bytes (bloom.h:454-456 semantics)
    arr = pa.array([0, 1, 2**40], type=pa.int64())
    h = hash_column(arr, algo="xxh64", seed=0)
    assert h[0] == xxh64_scalar((0).to_bytes(8, "little"), 0)
    assert h[2] == xxh64_scalar((2**40).to_bytes(8, "little"), 0)


def test_hash_pair_modes():
    arr = pa.array(["alpha", "beta", "gamma"])
    h1, h2 = hash_pair(arr, algo="xxh64", seeds=CLASSIC_SEEDS)
    assert h1.dtype == np.uint32 and h2.dtype == np.uint32
    assert h1[0] == xxh64_scalar(b"alpha", 0) & 0xFFFFFFFF
    assert h2[0] == xxh64_scalar(b"alpha", 0x87654321) & 0xFFFFFFFF
    # gloom rule: h2 forced odd
    _, h2g = hash_pair(arr, algo="xxh64", seeds=GLOOM_SEEDS, h2_odd=True)
    assert (h2g % 2 == 1).all()
    # split mode: one pass, two halves
    h1s, h2s = hash_pair(arr, algo="xxh64_split")
    full = xxh64_scalar(b"alpha", 0)
    assert h1s[0] == full & 0xFFFFFFFF and h2s[0] == full >> 32


def test_shard_routing():
    h1 = np.array([0x12345678, 0xFFFF0000, 0x0000FFFF], dtype=np.uint32)
    s = shard_of(h1, 256)
    # (h1 >> 16) & 255 — parallel_bloom.h:110 semantics
    assert s.tolist() == [(0x1234) & 255, 0xFFFF & 255, 0]
    with pytest.raises(ValueError):
        shard_of(h1, 100)


def test_column_spans_object_ndarray():
    arr = np.array(["abc", "de", ""], dtype=object)
    data, starts, lengths = column_spans(arr)
    assert lengths.tolist() == [3, 2, 0]
    assert bytes(data[starts[0] : starts[0] + 3]) == b"abc"


def test_numeric_nulls_hash_consistently():
    """A null in a numeric batch must not change other values' hashes (ADVICE r1:
    to_numpy promoted int→float64 on any null, silently breaking Bloom's
    no-false-negative guarantee for nullable numeric columns)."""
    a = pa.array([1, 2, 3], pa.int64())
    b = pa.array([1, 2, None], pa.int64())
    ha, hb = hash_column(a), hash_column(b)
    assert ha[0] == hb[0] and ha[1] == hb[1]
    # nulls hash as empty strings — same rule as the string path
    assert hb[2] == xxh64_scalar(b"", 0)
    # sliced arrays honour the offset
    c = pa.array([9, 1, 2, None], pa.int64()).slice(1)
    assert (hash_column(c) == hb).all()
    # floats and timestamps too
    f_null = hash_column(pa.array([1.5, None], pa.float64()))
    f_clean = hash_column(pa.array([1.5], pa.float64()))
    assert f_null[0] == f_clean[0]
    t_null = hash_column(pa.array([1_000_000, None], pa.timestamp("us")))
    t_clean = hash_column(pa.array([1_000_000], pa.timestamp("us")))
    assert t_null[0] == t_clean[0]


def test_xxh32_golden_vectors():
    """Published XXH32 vectors (xxHash spec) + scalar↔vectorized agreement.
    The reference benches the XXH32 pair alongside XXH64
    (simple_benchmark.cpp:35-40, seeds 0 / 0x87654321)."""
    from raysketch.hashing import xxh32_scalar

    assert xxh32_scalar(b"") == 0x02CC5D05
    assert xxh32_scalar(b"a") == 0x550D7456
    assert xxh32_scalar(b"abc") == 0x32D153FF
    assert xxh32_scalar(b"Nobody inspects the spammish repetition") == 0xE2293B2F


@given(
    st.lists(st.text(min_size=0, max_size=70), min_size=1, max_size=40),
    st.sampled_from([0, 1, 0x87654321]),
)
@settings(max_examples=60, deadline=None)
def test_xxh32_vec_matches_scalar(strs, seed):
    from raysketch.hashing import xxh32_scalar

    arr = pa.array(strs, pa.string())
    h = hash_column(arr, algo="xxh32", seed=seed)
    for i, s in enumerate(strs):
        assert int(h[i]) == xxh32_scalar(s.encode(), seed)


def test_xxh32_pair_mode():
    arr = pa.array(["alpha", "beta"])
    from raysketch.hashing import xxh32_scalar

    h1, h2 = hash_pair(arr, algo="xxh32", seeds=CLASSIC_SEEDS)
    assert int(h1[0]) == xxh32_scalar(b"alpha", 0)
    assert int(h2[0]) == xxh32_scalar(b"alpha", 0x87654321)
