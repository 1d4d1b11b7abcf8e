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
    bounded edge fixup."""
    import ray

    cols = [key_col, *aggs]
    s = ds.select_columns(cols).sort(key_col)

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
