"""Round-5 robustness fixes (ADVICE r4 + VERDICT next-round items):
large_binary pack fallback, sort-exchange dtype/empty guards, the distributed
hot_ngrams string recovery, and the line_dedup hot-set join regime."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from raysketch.pipeline.dedup import _pack_u64_binary, _unpack_u64_binary


def test_pack_u64_large_binary_roundtrip():
    """_unpack_u64_binary reads the (always-large_binary) int64 offsets,
    including through slices."""
    rng = np.random.default_rng(3)
    counts = rng.integers(0, 6, size=40).astype(np.int64)
    vals = rng.integers(0, 2**63, size=int(counts.sum())).astype(np.uint64)
    packed = _pack_u64_binary(vals, counts)
    assert packed.type == pa.large_binary()
    v2, offs = _unpack_u64_binary(packed)
    np.testing.assert_array_equal(v2, vals)
    np.testing.assert_array_equal(np.diff(offs), counts)
    # sliced large_binary reads still line up (offset-aware unpack)
    v3, o3 = _unpack_u64_binary(packed.slice(7, 20))
    start = int(counts[:7].sum())
    np.testing.assert_array_equal(v3, vals[start : start + int(counts[7:27].sum())])


def test_sorted_keyed_reduce_rejects_non_int64(ray_session):
    import ray.data as rd

    from raysketch.pipeline.exchange import sorted_keyed_reduce

    ds = rd.from_arrow(
        pa.table({"k": pa.array(["a", "b"]), "v": pa.array([1, 2], pa.int64())})
    )
    with pytest.raises(TypeError, match="int64-only"):
        sorted_keyed_reduce(ds, "k", {"v": "sum"})


def test_sorted_keyed_reduce_empty_input(ray_session):
    import ray.data as rd

    from raysketch.pipeline.exchange import sorted_keyed_reduce

    ds = rd.from_arrow(
        pa.table({"k": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    )
    out = sorted_keyed_reduce(ds, "k", {"v": "sum"})
    assert out.count() == 0


def test_exact_dedup_empty_input(ray_session):
    import ray.data as rd

    from raysketch.pipeline.dedup import exact_dedup

    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    )
    assert exact_dedup(ds).count() == 0


class TestSortedFirstPerKey:
    def test_matches_pandas_first(self, ray_session):
        """Any-representative semantics on key-dependent payloads: every key's
        payload is a function of the key, so the result must equal pandas
        drop_duplicates regardless of which occurrence won."""
        import ray.data as rd

        from raysketch.pipeline.exchange import sorted_first_per_key

        rng = np.random.default_rng(7)
        k = rng.integers(0, 2_000, size=20_000).astype(np.int64)
        df = pd.DataFrame({"k": k, "s": [f"str-{v}" for v in k], "v": k * 3})
        ds = rd.from_pandas(df).repartition(8)
        got = (
            sorted_first_per_key(ds, "k", ["s", "v"])
            .to_pandas()
            .sort_values("k", ignore_index=True)
        )
        want = (
            df.drop_duplicates("k").sort_values("k", ignore_index=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_driver_traffic_is_edge_bounded(self, ray_session):
        """The stress shape of VERDICT r4 'What's wrong #1': every key present
        in EVERY block. Driver-received rows (the edge fixup) must be bounded
        by blocks, never keys x blocks."""
        import ray.data as rd

        from raysketch.pipeline.exchange import sorted_first_per_key

        nkeys, nblocks, reps = 500, 40, 40  # every key occurs in ~every block
        k = np.tile(np.arange(nkeys, dtype=np.int64), reps)
        df = pd.DataFrame({"k": k, "s": [f"p{v}" for v in k]})
        ds = rd.from_pandas(df.sample(frac=1.0, random_state=0)).repartition(nblocks)
        stats: dict = {}
        got = sorted_first_per_key(ds, "k", ["s"], _stats=stats).to_pandas()
        assert len(got) == nkeys
        assert sorted(got["k"]) == list(range(nkeys))
        assert (got["s"] == "p" + got["k"].astype(str)).all()
        # old behavior shipped O(keys x blocks) = 20_000 rows to the driver;
        # the sort-exchange ships <= 2 per sorted block
        assert stats["edge_rows"] <= 2 * (nblocks + 4)

    def test_empty_input(self, ray_session):
        import ray.data as rd

        from raysketch.pipeline.exchange import sorted_first_per_key

        ds = rd.from_arrow(
            pa.table({"k": pa.array([], pa.int64()), "s": pa.array([], pa.string())})
        )
        assert sorted_first_per_key(ds, "k", ["s"]).count() == 0


class TestNullTextTolerance:
    """Real web corpora carry null/empty text and html; every text-facing
    operator must pass them through (treating null like empty) rather than
    crash. Batch-level kernels run directly; the dataset pipelines are
    covered by the line_dedup/exact_dedup cases."""

    @staticmethod
    def _table():
        return pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "text": pa.array(
                    [
                        "the quick brown fox jumps over the lazy dog",
                        "the quick brown fox jumps over the lazy dog",
                        None,
                        "",
                        "completely different words entirely here",
                    ]
                ),
                "html": pa.array(
                    [b"<p>x</p>", None, b"<p>y</p>", b"", b"<div>z</div>"],
                    pa.binary(),
                ),
            }
        )

    def test_batch_kernels_accept_nulls(self):
        from raysketch.pipeline import text as T

        t = self._table()
        for fn, col in [
            (T.extract_text_batch, "html"),
            (T.token_count_batch, "text"),
            (T.quality_batch, "text"),
            (T.repetition_batch, "text"),
            (T.fingerprint_batch, "text"),
        ]:
            out = fn(t) if col == "html" else fn(t, col="text")
            assert out.num_rows == t.num_rows, fn.__name__

    def test_extract_text_null_html_warning_free(self):
        # null positions from find_substring must be filled BEFORE the int64
        # cast — the NaN->int64 cast is undefined and warns (text.py fix, r5)
        import warnings

        from raysketch.pipeline.text import extract_text_array

        html = pa.array(
            [b"<p>hello</p>", None, b"no markers", None, b"<p></p>"], pa.binary()
        )
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            out = extract_text_array(html)
        assert out.to_pylist() == ["hello", "", "", "", ""]

    def test_exact_dedup_null_text(self, ray_session):
        import ray.data as rd

        from raysketch.pipeline.dedup import exact_dedup

        ds = rd.from_arrow(self._table())
        got = sorted(exact_dedup(ds, text_col="text", id_col="doc_id").to_pandas()["doc_id"])
        # docs 1/2 are exact dups (one survivor). Null text fingerprints as a
        # length-0 span, i.e. null ≡ "" for dedup purposes — docs 3/4 merge
        # to one survivor too (the min-id winner). Pinned convention.
        assert got == [1, 3, 5]

    def test_line_dedup_null_text(self, ray_session):
        import ray.data as rd

        from raysketch.pipeline.decontam import line_dedup

        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(["a\nb\nc", "a\nx", None, "a\ny"]),
            }
        )
        out = (
            line_dedup(rd.from_arrow(t), text_col="text", id_col="doc_id", min_docs=3)
            .to_pandas()
            .sort_values("doc_id")
        )
        assert out["clean_text"].tolist() == ["b\nc", "x", "", "y"]
        assert out["n_removed"].tolist() == [1, 1, 0, 1]


def test_stratified_sample_null_keys_clear_error(ray_session):
    """Null stratum keys fail with a clear contract error instead of numpy's
    cryptic 'None < str' TypeError deep in the lexsort."""
    import ray.data as rd

    from raysketch.pipeline.export import stratified_sample

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "lang": pa.array(["en", None, "de"]),
        }
    )
    with pytest.raises(Exception, match="contains nulls"):
        stratified_sample(
            rd.from_arrow(t), key_col="lang", id_col="doc_id", n_target=2
        ).materialize()


class TestCoalesceOverblocked:
    """The r5 scheduling-overhead fix: a sort exchange fed hundreds of tiny
    blocks (hot_ngrams' per-scan-task recovery hits) must coalesce before
    sorting — and must NOT touch inputs whose blocks are already large."""

    def test_tiny_blocks_coalesce_and_result_exact(self, ray_session):
        import ray.data as rd

        from raysketch.pipeline.exchange import (
            _coalesce_overblocked,
            sorted_first_per_key,
        )

        rng = np.random.default_rng(11)
        k = rng.integers(0, 300, size=6_000).astype(np.int64)
        df = pd.DataFrame({"k": k, "s": [f"v{v}" for v in k]})
        ds = rd.from_pandas(df).repartition(120).materialize()
        out = _coalesce_overblocked(ds, 6_000)
        assert out.materialize().num_blocks() < 120
        got = (
            sorted_first_per_key(ds, "k", ["s"])
            .to_pandas()
            .sort_values("k", ignore_index=True)
        )
        want = df.drop_duplicates("k").sort_values("k", ignore_index=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_large_blocks_untouched(self, ray_session):
        import ray.data as rd

        from raysketch.pipeline.exchange import _coalesce_overblocked

        n = 40_000  # 4 blocks x 10k rows >> the 4096-row tiny threshold
        ds = (
            rd.from_pandas(pd.DataFrame({"k": np.arange(n, dtype=np.int64)}))
            .repartition(4)
            .materialize()
        )
        assert _coalesce_overblocked(ds, n) is ds


class TestChunkTextMultibyte:
    """Chunk boundaries snap back to UTF-8 codepoint starts: every chunk is
    valid UTF-8 (the unsnapped gather emitted bytes that exploded with
    UnicodeDecodeError on first read), non-overlapping chunks reassemble to
    the original text exactly (no byte lost — the straddling codepoint moves
    whole into the next chunk), and pure-ASCII output is bitwise unchanged
    (the SQL substring oracle's byte==char contract)."""

    def test_multibyte_chunks_valid_and_lossless(self):
        from collections import defaultdict

        import pyarrow as pa

        from raysketch.pipeline.text import chunk_text_batch

        texts = ["é" * 10, "abc😀def✓gh" * 3, "plain ascii " * 4, "", "x"]
        t = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        )
        out = chunk_text_batch(t, chunk_size=5, stride=5)
        rebuilt = defaultdict(str)
        for did, s in zip(
            out.column("doc_id").to_pylist(), out.column("chunk_text").to_pylist()
        ):
            s.encode("utf-8")  # raises if the chunk were cut mid-codepoint
            rebuilt[did] += s
        for i, txt in enumerate(texts):
            assert rebuilt.get(i, "") == txt

    def test_ascii_bitwise_unchanged(self):
        import pyarrow as pa

        from raysketch.pipeline.text import chunk_text_batch

        t = pa.table(
            {"doc_id": pa.array([7], pa.int64()), "text": pa.array(["abcdefghij"])}
        )
        out = chunk_text_batch(t, chunk_size=4, stride=3)
        assert out.column("chunk_text").to_pylist() == ["abcd", "defg", "ghij", "j"]
        assert out.column("start_off").to_pylist() == [0, 3, 6, 9]

    def test_fuzz_random_unicode(self):
        # seeded fuzz: random multibyte strings x random chunk geometries;
        # every chunk valid UTF-8, overlap-agnostic coverage (every byte of
        # the original appears in at least one chunk), start_offs strictly
        # increasing per doc
        import random

        import pyarrow as pa

        from raysketch.pipeline.text import chunk_text_batch

        rng = random.Random(42)
        alphabet = "aé✓😀 \n字ß"
        for trial in range(20):
            texts = [
                "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 40)))
                for _ in range(8)
            ]
            chunk = rng.randrange(4, 12)
            stride = rng.randrange(max(1, chunk // 2), chunk + 1)
            t = pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts),
                }
            )
            out = chunk_text_batch(t, chunk_size=chunk, stride=stride)
            per_doc_offs = {}
            covered = {i: set() for i in range(len(texts))}
            for did, off, s in zip(
                out.column("doc_id").to_pylist(),
                out.column("start_off").to_pylist(),
                out.column("chunk_text").to_pylist(),
            ):
                b = s.encode("utf-8")  # validity
                assert per_doc_offs.get(did, -1) < off  # strictly increasing
                per_doc_offs[did] = off
                covered[did].update(range(off, off + len(b)))
            for i, txt in enumerate(texts):
                nb = len(txt.encode("utf-8"))
                assert covered[i] == set(range(nb)), (trial, i)
