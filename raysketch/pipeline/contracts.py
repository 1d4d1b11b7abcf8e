"""Input-contract validators shared by the pipeline stages.

Web-corpus reality check (the r5 null-id audit): a NULL in an int64 id column
does not fail loudly — ``np.asarray`` silently converts the whole column to
float64, so downstream the id schema drifts (band rows emit float64 doc_ids),
NaN never compares equal (docs silently vanish from clusters), and ids past
2^53 collide. The dedup/export pipelines therefore REQUIRE non-null ids and
enforce it at the first batch kernel that touches the column, where the check
is one Arrow metadata read (``null_count``) per batch — free on the hot path.

Null *text*/*html* stays tolerated everywhere (pinned convention: null ≡ "");
only identity/ordering columns carry these contracts.
"""

from __future__ import annotations

import pyarrow as pa


def _check_non_null(
    batch: pa.Table, col: str, op: str, remedy: str, noun: str = "column"
) -> None:
    """One enforcement point: read ``null_count`` (Arrow column metadata, free
    when clean) and raise a named contract error with the caller's remedy."""
    if batch.column(col).null_count:
        raise ValueError(f"{op}: {noun} {col!r} contains nulls — {remedy}")


def require_non_null(batch: pa.Table, col: str, op: str) -> None:
    """Generic non-null column contract (grouping keys, timestamps): raise a
    clear error instead of the cryptic numpy failure a null would cause deep
    inside the vectorized kernel (object-array lexsort ``None < str``,
    NaT→float casts)."""
    _check_non_null(
        batch,
        col,
        op,
        "fill_null or filter null rows first (the vectorized kernel cannot "
        "order/window null values).",
    )


def require_non_null_ids(batch: pa.Table, col: str, op: str) -> None:
    """Non-null ID contract: call inside the FIRST ``map_batches`` kernel that
    reads the id column ``col``."""
    _check_non_null(
        batch,
        col,
        op,
        "ids must be non-null (a null int64 id silently float64-converts "
        "under numpy, drifting the schema and dropping docs from clusters). "
        "fill_null or re-derive ids (e.g. raysketch.hashing xxh64 of the "
        "url) first.",
        noun="id column",
    )
