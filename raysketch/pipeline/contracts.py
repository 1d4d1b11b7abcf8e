"""Input-contract validators shared by the pipeline stages.

Web-corpus reality check (the r5 null-id audit): a NULL in an int64 id column
does not fail loudly — ``np.asarray`` silently converts the whole column to
float64, so downstream the id schema drifts (band rows emit float64 doc_ids),
NaN never compares equal (docs silently vanish from clusters), and ids past
2^53 collide. The dedup/export pipelines therefore REQUIRE non-null ids and
enforce it at the first batch kernel that touches the column, where the check
is one Arrow metadata read (``null_count``) per batch — free on the hot path.

Null *text*/*html* stays tolerated everywhere (pinned convention: null ≡ "");
only the identity columns carry this contract.
"""

from __future__ import annotations

import pyarrow as pa


def require_non_null(batch: pa.Table, col: str, op: str) -> None:
    """Generic non-null column contract (grouping keys, timestamps): raise a
    clear error instead of the cryptic numpy failure a null would cause deep
    inside the vectorized kernel (object-array lexsort ``None < str``,
    NaT→float casts). Same zero-cost ``null_count`` metadata read."""
    if batch.column(col).null_count:
        raise ValueError(
            f"{op}: column {col!r} contains nulls — fill_null or filter null "
            "rows first (the vectorized kernel cannot order/window null values)."
        )


def require_non_null_ids(batch: pa.Table, col: str, op: str) -> None:
    """Raise a clear contract error when the id column ``col`` carries nulls.

    Call inside the FIRST ``map_batches`` kernel that reads ``col`` — Arrow
    tracks ``null_count`` in column metadata, so the check costs nothing when
    the column is clean.
    """
    if batch.column(col).null_count:
        raise ValueError(
            f"{op}: id column {col!r} contains nulls — ids must be non-null "
            "(a null int64 id silently float64-converts under numpy, drifting "
            "the schema and dropping docs from clusters). fill_null or "
            "re-derive ids (e.g. raysketch.hashing xxh64 of the url) first."
        )
