"""Range-sort keyed-reduction exchange.

The r4 measurement (BASELINE.md, CLAUDE.md): for per-key REDUCTIONS over
singleton-heavy key universes, Ray's range-partitioned ``sort`` beats both
the native hash aggregate (147 s, r3) and the keyed HASH_SHUFFLE
repartition (17.2 s) — 3.3 s for the same 20M-key count exchange. After
the sort a key may straddle ADJACENT blocks only, so each block finalizes
its interior keys vectorized (``reduceat``) and emits its first/last key
partials flagged ``__edge``; the driver re-reduces the <= 2-rows-per-block
edge set exactly and unions it back. Works for any associative reduction;
group co-location (pair emission) still needs the keyed repartition.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_NP_OPS = {"sum": np.add, "min": np.minimum, "max": np.maximum}


def _adjacent_differs(t: pa.Table, cols: list[str]) -> np.ndarray:
    """``out[i] = True`` when row ``i+1`` differs from row ``i`` on any of
    ``cols`` — the adjacency mask behind the sorted-block dedups, computed
    with NULL-SAFE Arrow kernels: ``null == null`` counts as equal (SQL
    DISTINCT semantics) and int64 stays int64 end-to-end (``np.asarray`` of a
    null-bearing int column silently converts to float64, where NaN breaks
    equality and distinct values past 2^53 collide — the r5 bug this
    replaced). Float NaN also counts as equal to NaN (``pc.equal`` never
    matches NaN, which would leave one surviving NaN row per pre-sort block
    — the sort places all NaNs adjacent, so this mask is the only place the
    semantics live; the edge fixup's Arrow ``group_by`` already collapses
    NaN to one key)."""
    n = t.num_rows
    diff = np.zeros(max(n - 1, 0), dtype=bool)
    for c in cols:
        x = t.column(c).combine_chunks()
        hi, lo = x.slice(1), x.slice(0, n - 1)
        eq = pc.fill_null(pc.equal(hi, lo), False)
        same = pc.or_(eq, pc.and_(pc.is_null(hi), pc.is_null(lo)))
        if pa.types.is_floating(x.type):
            nan_both = pc.fill_null(pc.and_(pc.is_nan(hi), pc.is_nan(lo)), False)
            same = pc.or_(same, nan_both)
        diff |= ~np.asarray(same)
    return diff


def _sort_unsafe_type(t: pa.DataType) -> bool:
    """Types Ray's range sort cannot partition when nulls are present: the
    boundary search runs ``np.searchsorted`` over the key column, and
    string/binary/bool columns with None become numpy object arrays where
    ``None < str`` raises TypeError. Numeric/temporal nulls ride numpy's
    NaN/NaT path, which is order-consistent (tested to 2^53+1 int64)."""
    return (
        pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or pa.types.is_binary(t)
        or pa.types.is_large_binary(t)
        or pa.types.is_boolean(t)
    )


def _null_fill_scalar(t: pa.DataType):
    if pa.types.is_boolean(t):
        return pa.scalar(False)
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return pa.scalar("", t)
    return pa.scalar(b"", t)


def _null_encode_for_sort(s, key_cols: list[str]):
    """Make ``ds.sort`` safe for null string/binary/bool keys: replace each
    sort-unsafe key column with ``fill_null`` and append an int8 is-null flag
    that JOINS the sort key right after it. Equal original tuples stay equal
    (the flag disambiguates a real "" from an encoded null), so group
    contiguity after the sort is exact, and no comparison ever sees None.
    Returns ``(dataset, sort_cols, encoded)`` where ``encoded`` is a list of
    ``(col, flag_col)`` pairs for :func:`_null_decode`. No-op (zero cost) when
    no key column is sort-unsafe — the hot int64 paths are untouched."""
    schema = s.schema()
    enc = [
        c
        for c, t in zip(schema.names, schema.types)
        if c in key_cols and _sort_unsafe_type(t)
    ]
    if not enc:
        return s, list(key_cols), []
    flag = {c: f"__nul_{c}" for c in enc}

    def encode(t: pa.Table) -> pa.Table:
        for c in enc:
            i = t.schema.get_field_index(c)
            col = t.column(c)
            isnull = pc.cast(pc.is_null(col), pa.int8())
            t = t.set_column(i, c, pc.fill_null(col, _null_fill_scalar(col.type)))
            t = t.append_column(flag[c], isnull)
        return t

    sort_cols: list[str] = []
    for c in key_cols:
        sort_cols.append(c)
        if c in flag:
            sort_cols.append(flag[c])
    return (
        s.map_batches(encode, batch_format="pyarrow", batch_size=None),
        sort_cols,
        [(c, flag[c]) for c in enc],
    )


def _null_decode(t: pa.Table, encoded: list[tuple[str, str]]) -> pa.Table:
    """Undo :func:`_null_encode_for_sort` on a sorted block: restore nulls
    where the flag is set and drop the flag columns."""
    for c, f in encoded:
        i = t.schema.get_field_index(c)
        col = t.column(c)
        mask = pc.cast(t.column(f), pa.bool_())
        t = t.set_column(i, c, pc.if_else(mask, pa.scalar(None, col.type), col))
        t = t.drop_columns([f])
    return t


_TINY_BLOCK_ROWS = 4096
_TARGET_BLOCK_ROWS = 1 << 20


def _coalesce_overblocked(s, n_rows: int):
    """Fixed per-task overhead dominates the sort exchange when the input is
    many TINY blocks — hot_ngrams' recovery emits one ~|hot|-row hit table per
    scan task, so the exchange would run 4 Ray jobs x hundreds of ~100-row
    tasks for a few thousand total rows (measured 3.6-4.8 s of pure scheduling
    at the 200k-doc bench cell). Coalesce to ~1M-row blocks first: a plain
    ``repartition`` (no keys — the sort does the placement) whose one cheap
    extra job removes hundreds of tasks from every downstream job. Strictly a
    no-op for the 20M-row reduction cells, whose blocks are already large."""
    try:
        nb = s.num_blocks()
    except Exception:
        return s
    if nb is None or nb <= 1 or n_rows // nb >= _TINY_BLOCK_ROWS:
        return s
    target = max(1, min(nb - 1, n_rows // _TARGET_BLOCK_ROWS + 1))
    return s.repartition(target)


def sorted_keyed_reduce(ds, key_col: str, aggs: dict[str, str]):
    """Exact per-key reduction of int64 columns: ``aggs`` maps column name ->
    ``"sum" | "min" | "max"``. Returns a Dataset with columns
    ``[key_col, *aggs]`` (one row per distinct key), streaming except for the
    bounded edge fixup.

    All participating columns (key included) must be int64 — the block pass
    and the edge re-reduce both coerce through int64, so a uint64 key above
    2^63 or a string key would corrupt silently. Validated up front."""
    import ray

    cols = [key_col, *aggs]
    s = ds.select_columns(cols).materialize()
    n_rows = s.count()
    if n_rows == 0:
        # ds.sort on an all-empty Dataset is undefined across Ray versions
        # (the _emit_pairs guard) — the typed empty selection IS the answer
        return s
    s = _coalesce_overblocked(s, n_rows)
    schema = s.schema()
    for name, typ in zip(schema.names, schema.types):
        if name in cols and typ != pa.int64():
            raise TypeError(
                f"sorted_keyed_reduce: column {name!r} is {typ}, but the "
                "reduction is int64-only (view uint64 keys as int64 first; "
                "use sorted_first_per_key for non-numeric payloads)"
            )
    s = s.sort(key_col)

    def block(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table(
                {
                    **{c: pa.array([], pa.int64()) for c in cols},
                    "__edge": pa.array([], pa.bool_()),
                }
            )
        for c in cols:
            if t.column(c).null_count:
                # np.asarray would float64-convert a null-bearing int64
                # column, silently corrupting the reduceat grouping
                raise ValueError(f"sorted_keyed_reduce: column {c!r} contains nulls")
        k = np.asarray(t.column(key_col))
        order = np.argsort(k, kind="stable")
        k = k[order]
        new = np.ones(n, dtype=bool)
        new[1:] = k[1:] != k[:-1]
        starts = np.nonzero(new)[0]
        out = {key_col: k[starts]}
        for c, op in aggs.items():
            out[c] = _NP_OPS[op].reduceat(np.asarray(t.column(c))[order], starts)
        edge = np.zeros(len(starts), dtype=bool)
        edge[0] = True
        edge[-1] = True
        tbl = {c: pa.array(v, pa.int64()) for c, v in out.items()}
        tbl["__edge"] = pa.array(edge)
        return pa.table(tbl)

    parts = s.map_batches(block, batch_format="pyarrow", batch_size=None).materialize()
    edge_pdf = parts.filter(expr="__edge == True").select_columns(cols).to_pandas()
    inner = parts.filter(expr="__edge == False").drop_columns(["__edge"])
    if len(edge_pdf) == 0 or key_col not in edge_pdf.columns:
        return inner
    fix = edge_pdf.groupby(key_col, as_index=False).agg(dict(aggs))
    fixed = ray.data.from_arrow(
        pa.table({c: pa.array(fix[c].to_numpy(), pa.int64()) for c in cols})
    )
    return inner.union(fixed)


def _sorted_edge_dedup(
    ds, key_cols: list[str], payload_cols: list[str], _stats: dict | None = None
):
    """The shared engine behind :func:`sorted_first_per_key` and
    :func:`sorted_distinct`: range sort by ``key_cols`` (null-encoded for
    sort-unsafe types), vectorized per-block first-occurrence dedup on the
    adjacency mask, and the <= 2-rows-per-block ``__edge`` fixup — a key
    straddling adjacent sorted blocks leaves one survivor per side; the tiny
    edge table re-dedups exactly with one Arrow ``group_by`` ("first" under
    the FD contract is any-occurrence; np.unique would float-convert null
    ints). Driver traffic is the edge set only — O(#blocks), never
    O(keys x blocks). Nulls dedup like SQL DISTINCT and float NaN keys
    dedup to one row (``_adjacent_differs`` + Arrow ``group_by`` both treat
    NaN == NaN)."""
    import ray

    cols = [*key_cols, *payload_cols]
    s = ds.select_columns(cols).materialize()
    if _stats is not None:
        _stats["edge_rows"] = 0
    n_rows = s.count()
    if n_rows == 0:
        # ds.sort on an all-empty Dataset is undefined across Ray versions
        return s
    s = _coalesce_overblocked(s, n_rows)
    s, sort_cols, encoded = _null_encode_for_sort(s, key_cols)
    s = s.sort(sort_cols)

    def block(t: pa.Table) -> pa.Table:
        t = _null_decode(t, encoded)
        n = t.num_rows
        if n == 0:
            return t.append_column("__edge", pa.array([], pa.bool_()))
        first = np.ones(n, dtype=bool)
        first[1:] = _adjacent_differs(t, key_cols)
        sel = t.filter(pa.array(first)) if not bool(first.all()) else t
        m = sel.num_rows
        edge = np.zeros(m, dtype=bool)
        edge[0] = True
        edge[-1] = True
        return sel.append_column("__edge", pa.array(edge))

    parts = s.map_batches(block, batch_format="pyarrow", batch_size=None).materialize()
    inner = parts.filter(expr="__edge == False").drop_columns(["__edge"])
    edge_batches = [
        b
        for b in parts.filter(expr="__edge == True")
        .drop_columns(["__edge"])
        .iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    if _stats is not None:
        _stats["edge_rows"] = sum(b.num_rows for b in edge_batches)
    if not edge_batches:
        return inner
    gb = pa.concat_tables(edge_batches).group_by(key_cols).aggregate(
        [(c, "first") for c in payload_cols]
    )
    fixed = pa.table(
        {
            **{k: gb.column(k) for k in key_cols},
            **{c: gb.column(f"{c}_first") for c in payload_cols},
        }
    )
    return inner.union(ray.data.from_arrow(fixed))


def sorted_first_per_key(ds, key_col: str, payload_cols: list[str], _stats: dict | None = None):
    """One representative row per distinct key, for payload columns that are
    functionally dependent on the key (e.g. hash -> recovered n-gram string):
    any occurrence is a correct representative, so the result is deterministic.

    Same exchange discipline as :func:`sorted_keyed_reduce` — see
    :func:`_sorted_edge_dedup`. Payload columns keep their Arrow types
    (strings fine); only the key must be ``ds.sort``-able (null string/bool/
    binary keys are encoded). Driver traffic is the edge set only (the r4
    hot_ngrams recovery-merge fix). ``_stats``, when passed, receives
    ``{"edge_rows": n}`` — the exact driver-received row count, asserted by
    the stress test."""
    return _sorted_edge_dedup(ds, [key_col], payload_cols, _stats)


def sorted_distinct(ds, cols: list[str]):
    """DISTINCT over ``cols`` via the range-sort exchange (see
    :func:`_sorted_edge_dedup` — distinct IS a first-per-key reduction with
    no payload). Works for any sortable column types, including multi-column
    string keys; same measured ~5x win over the keyed HASH_SHUFFLE
    repartition as sorted_keyed_reduce. Nulls dedup like SQL DISTINCT
    (null == null) and float NaN keys dedup to one row."""
    return _sorted_edge_dedup(ds, cols, [])
