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

_NP_OPS = {"sum": np.add, "min": np.minimum, "max": np.maximum}


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
    if s.count() == 0:
        # ds.sort on an all-empty Dataset is undefined across Ray versions
        # (the _emit_pairs guard) — the typed empty selection IS the answer
        return s
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


def sorted_first_per_key(ds, key_col: str, payload_cols: list[str], _stats: dict | None = None):
    """One representative row per distinct key, for payload columns that are
    functionally dependent on the key (e.g. hash -> recovered n-gram string):
    any occurrence is a correct representative, so the result is deterministic.

    Same exchange discipline as :func:`sorted_keyed_reduce`: range sort by
    ``key_col``, vectorized per-block first-occurrence dedup, and a
    <= 2-rows-per-block ``__edge`` fixup so a key straddling adjacent sorted
    blocks still yields exactly one row. Payload columns keep their Arrow
    types (strings fine); only the key must be ``ds.sort``-able. Driver
    traffic is the edge set only — O(#blocks), never O(keys x blocks) (the
    r4 hot_ngrams recovery-merge fix). ``_stats``, when passed, receives
    ``{"edge_rows": n}`` — the exact driver-received row count, asserted by
    the stress test."""
    import ray

    cols = [key_col, *payload_cols]
    s = ds.select_columns(cols).materialize()
    if _stats is not None:
        _stats["edge_rows"] = 0
    if s.count() == 0:
        # ds.sort on an all-empty Dataset is undefined across Ray versions
        return s
    s = s.sort(key_col)

    def block(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t.append_column("__edge", pa.array([], pa.bool_()))
        k = np.asarray(t.column(key_col).combine_chunks())
        first = np.ones(n, dtype=bool)
        first[1:] = k[1:] != k[:-1]
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
    et = pa.concat_tables(edge_batches)
    k = np.asarray(et.column(key_col))
    _, idx = np.unique(k, return_index=True)
    fixed = ray.data.from_arrow(et.take(pa.array(np.sort(idx))))
    return inner.union(fixed)


def sorted_distinct(ds, cols: list[str]):
    """DISTINCT over ``cols`` via the range-sort exchange: global sort by the
    key columns, vectorized adjacent-row dedup per block, and the
    <= 2-rows-per-block ``__edge`` fixup (a value straddling adjacent sorted
    blocks leaves one survivor per side; the tiny edge table dedups exactly
    with one Arrow ``group_by``). Works for any sortable column types,
    including multi-column string keys. Same measured ~5x win over the keyed
    HASH_SHUFFLE repartition as sorted_keyed_reduce (distinct IS a
    first-per-key reduction). Caveat: float NaN keys never compare equal and
    would not dedup — use the repartition path for NaN-bearing keys."""
    import ray

    s = ds.select_columns(cols).materialize()
    if s.count() == 0:
        # ds.sort on an all-empty Dataset is undefined across Ray versions
        return s
    s = s.sort(cols)

    def block(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t.append_column("__edge", pa.array([], pa.bool_()))
        new = np.zeros(n, dtype=bool)
        new[0] = True
        for c in cols:
            a = np.asarray(t.column(c).combine_chunks())
            new[1:] |= a[1:] != a[:-1]
        sel = t.filter(pa.array(new)) if not bool(new.all()) else t
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
    if not edge_batches:
        return inner
    fixed = pa.concat_tables(edge_batches).group_by(cols).aggregate([])
    return inner.union(ray.data.from_arrow(fixed))
