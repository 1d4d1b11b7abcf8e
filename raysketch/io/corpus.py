"""Deterministic synthetic web-page corpus (FIXTURES.md F1/F2).

The authoritative input shape from BASELINE.json ``input_hint``:
``(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)``.
Fully seeded (no wall clock, no ``random_device`` — the seeded-shuffle precedent of
benchmark_bloom.cpp:80), written as multi-file Parquet so Ray gets multiple input
blocks. ``extract_text(html) == text`` byte-for-byte per url is the per-row
invariant the pipeline is checked against.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

EPOCH_2018_02_01_US = 1517443200 * 1_000_000

LANGS = ["en", "de", "fr", "es", "tr", "zh"]
LANG_WEIGHTS = np.array([0.55, 0.15, 0.11, 0.09, 0.06, 0.04])  # Zipfian, en-heavy

WEBPAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def _vocab(size: int = 1000) -> list[str]:
    rng = np.random.default_rng(1337)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    words = []
    seen = set()
    while len(words) < size:
        n = int(rng.integers(3, 10))
        w = "".join(rng.choice(letters, size=n))
        if w not in seen:
            seen.add(w)
            words.append(w)
    return words


_VOCAB = _vocab()


def _make_rows(start: int, count: int, seed: int, n_hosts: int) -> pa.Table:
    rng = np.random.default_rng(np.random.SeedSequence([seed, start]))
    idx = np.arange(start, start + count, dtype=np.int64)
    # Zipf-distributed host ids (skew), unique path per row
    hosts = rng.zipf(1.3, size=count) % n_hosts
    # path from a multiplicative hash of the row index (unique, deterministic)
    path = (idx.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(16)
    urls = [f"https://site{h}.example/{p:012x}" for h, p in zip(hosts, path)]
    ts = pa.array(EPOCH_2018_02_01_US + idx * 1_000_000, type=pa.timestamp("us"))
    nwords = rng.integers(5, 201, size=count)
    tok_ids = rng.integers(0, len(_VOCAB), size=int(nwords.sum()))
    texts = []
    pos = 0
    vocab = _VOCAB
    for nw in nwords:
        texts.append(" ".join(vocab[t] for t in tok_ids[pos : pos + nw]))
        pos += nw
    htmls = [
        f"<html><head><title>T{i}</title></head><body><p>{t}</p></body></html>".encode()
        for i, t in zip(idx, texts)
    ]
    langs = rng.choice(np.array(LANGS), size=count, p=LANG_WEIGHTS / LANG_WEIGHTS.sum())
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": ts,
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs.tolist(), type=pa.string()),
        }
    )


def gen_webpages(
    out_dir: str,
    rows: int = 100_000,
    seed: int = 42,
    n_hosts: int = 1000,
    num_files: int = 8,
    overwrite: bool = False,
) -> str:
    """Write the F1 ``webpages`` corpus as ``num_files`` Parquet files. Idempotent:
    returns immediately if the directory already holds the expected files."""
    os.makedirs(out_dir, exist_ok=True)
    expected = [os.path.join(out_dir, f"part-{i:05d}.parquet") for i in range(num_files)]
    if not overwrite and all(os.path.exists(p) for p in expected):
        return out_dir
    per = (rows + num_files - 1) // num_files
    start = 0
    for i, path in enumerate(expected):
        count = min(per, rows - start)
        tbl = _make_rows(start, count, seed, n_hosts)
        pq.write_table(tbl, path)
        start += count
    return out_dir


def gen_raw_keys(
    out_dir: str,
    rows: int = 2_500_000,
    seed: int = 42,
    key_len: int = 16,
    num_files: int = 16,
    overwrite: bool = False,
) -> str:
    """F3 ``raw_keys``: 16-char printable-ASCII strings — the exact shape of the
    reference's benchmark workload (simple_benchmark.cpp:79-97, but seeded instead
    of ``random_device``)."""
    os.makedirs(out_dir, exist_ok=True)
    expected = [os.path.join(out_dir, f"part-{i:05d}.parquet") for i in range(num_files)]
    if not overwrite and all(os.path.exists(p) for p in expected):
        return out_dir
    per = (rows + num_files - 1) // num_files
    start = 0
    for i, path in enumerate(expected):
        count = min(per, rows - start)
        rng = np.random.default_rng(np.random.SeedSequence([seed, i]))
        codes = rng.integers(32, 127, size=(count, key_len), dtype=np.uint8)  # printable ASCII
        flat = codes.tobytes()
        offsets = np.arange(0, (count + 1) * key_len, key_len, dtype=np.int32)
        arr = pa.Array.from_buffers(
            pa.utf8(), count, [None, pa.py_buffer(offsets), pa.py_buffer(flat)]
        )
        pq.write_table(pa.table({"key": arr}), path)
        start += count
    return out_dir


def read_whitelist(path: str, seed: int = 42, insert_n: int | None = None, query_n: int | None = None):
    """Whitelist-file source (benchmark_bloom.cpp:67-83 semantics): read lines,
    seeded shuffle, prefix-split into (insert_ds, query_ds) Ray datasets."""
    import ray.data as rd

    ds = rd.read_text(path).random_shuffle(seed=seed)
    n = ds.count()
    insert_n = insert_n if insert_n is not None else n // 2
    query_n = query_n if query_n is not None else n - insert_n
    # prefix-split: first insert_n lines insert, next query_n lines query
    splits = ds.split_proportionately([insert_n / n]) if 0 < insert_n < n else (ds, ds.limit(0))
    return splits[0], splits[1].limit(query_n)


def gen_membership_queries(
    out_path: str,
    webpages_dir: str,
    n_queries: int,
    seed: int = 43,
    overwrite: bool = False,
) -> str:
    """F2 probe table: 50% inserted urls (prefix sample, simple_benchmark.cpp:553-558
    precedent) + 50% fresh disjoint urls, labeled ``is_positive``."""
    if not overwrite and os.path.exists(out_path):
        return out_path
    half = n_queries // 2
    ds = pq.ParquetDataset(webpages_dir)
    urls = ds.read(columns=["url"])["url"].combine_chunks()
    pos = urls.slice(0, half).to_pylist()
    rng = np.random.default_rng(seed)
    fresh_ids = rng.integers(10**15, 10**16, size=n_queries - half)
    neg = [f"https://fresh{i}.example/none" for i in fresh_ids]
    tbl = pa.table(
        {
            "url": pa.array(pos + neg, type=pa.string()),
            "is_positive": pa.array([True] * len(pos) + [False] * len(neg)),
        }
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pq.write_table(tbl, out_path)
    return out_path
