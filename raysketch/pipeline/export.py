"""Training-data export operators: token-stream sequence packing and
stratified (per-group quota) sampling.

Both are the last-mile stages of an LLM data pipeline — after dedup /
decontamination / quality gates, the surviving corpus is (a) packed into
fixed-token-budget training sequences and (b) rebalanced across languages or
sources. They follow the repo's keyed-shuffle + vectorized-block pattern
(BASELINE.md round-3: no per-group Python, block-local partials, bounded
driver state) and are integer-exact so a plain-SQL oracle states the answer.

Reference anchor: the range partitioner + per-partition sequential pass these
generalize (simple_benchmark.cpp partition loop); packing/quotas themselves
are standard LLM-pipeline practice (concat-and-cut sequence packing;
proportional stratified allocation).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raysketch.pipeline.contracts import require_non_null_ids

# Fibonacci-hash scramble for rank_by="hash": multiplication by an odd
# constant is a BIJECTION on Z/2^64 (distinct ids -> distinct ranks, no
# tie-break needed), decorrelates rank from id order, and is SQL-stateable.
# numpy computes (id mod 2^64) * PHI mod 2^64 in [0, 2^64); DuckDB's `%`
# follows the DIVIDEND's sign (negative ids -> negative remainders), so the
# matching expression needs the non-negative wrap:
# `((id::HUGEINT * 11400714819323198485) % 18446744073709551616
#   + 18446744073709551616) % 18446744073709551616`
# (identical for ids >= 0, where the plain `%` form also matches).
_RANK_PHI = np.uint64(0x9E3779B97F4A7C15)  # 11400714819323198485


def _rank_keys(ids: np.ndarray, rank_by: str) -> np.ndarray:
    if rank_by == "id":
        return ids
    if rank_by == "hash":
        if not np.issubdtype(ids.dtype, np.integer):
            # object/string ids would die in astype(uint64) with a cryptic
            # numpy error deep inside a Ray task — fail with the contract
            raise TypeError(
                "rank_by='hash' needs integer ids (the Fibonacci scramble is "
                f"mod-2^64 arithmetic); got dtype {ids.dtype}. Hash string ids "
                "to int64 first (e.g. raysketch.hashing xxh64)."
            )
        with np.errstate(over="ignore"):
            return ids.astype(np.uint64) * _RANK_PHI
    raise ValueError(f"rank_by must be 'id' or 'hash' (got {rank_by!r})")


def _keyed_parts(ds, keys: list[str], npart: int):
    """HASH_SHUFFLE keyed repartition with the repo's exchange sizing: every
    key lands wholly in one block, so one vectorized task per block sees
    complete groups."""
    from ray.data.context import ShuffleStrategy

    ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ds.context.default_hash_shuffle_parallelism = npart
    return ds.repartition(num_blocks=npart, keys=keys)


def pack_sequences(
    docs,
    *,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    budget: int = 2048,
):
    """Concat-and-cut sequence packing: documents are laid end-to-end in
    ``id_col`` order (ids must be unique) into one global token stream, which
    is cut every ``budget`` tokens. Returns per doc: ``start_seq`` /
    ``end_seq`` (the first/last training sequence the doc's tokens land in)
    and ``start_off`` (the doc's offset inside ``start_seq``). This is the
    packing discipline actually used for LLM pretraining batches (docs may
    straddle sequence boundaries); it is integer-exact, so the SQL
    window-cumsum oracle states it directly.

    Scale shape: ONE range sort by ``id_col`` (blocks = disjoint id ranges),
    then a two-level prefix sum over the SAME materialized blocks: a partials
    pass emits each block's ``(min_id, token_sum)`` (one row per block), the
    driver exclusive-scans those in id order (bounded: 16 bytes per block)
    and broadcasts the base offsets; the finalize pass looks up its block's
    base by its own min id and adds the in-block exclusive cumsum. No keyed
    exchange at all — the r4 sort-vs-hash-shuffle lesson applied to prefix
    sums (reference anchor: the static range partitioner + sequential
    per-partition pass, simple_benchmark.cpp partition loop)."""
    import ray

    sel = docs.select_columns([id_col, token_col]).materialize()

    def empty_pack(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: t.column(id_col),
                "start_seq": pa.array(np.zeros(t.num_rows, np.int64)),
                "end_seq": pa.array(np.zeros(t.num_rows, np.int64)),
                "start_off": pa.array(np.zeros(t.num_rows, np.int64)),
            }
        )

    if sel.count() == 0:
        # ds.sort on an all-empty Dataset is undefined across Ray versions
        # (the _emit_pairs guard) — skip the sort, emit the typed empty shape
        return sel.map_batches(empty_pack, batch_format="pyarrow")
    s = sel.sort(id_col).materialize()

    def block_sum(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"m": pa.array([], pa.int64()), "s": pa.array([], pa.int64())})
        require_non_null_ids(t, id_col, "pack_sequences")
        ids = np.asarray(t.column(id_col))
        n = np.asarray(t.column(token_col), dtype=np.int64)
        return pa.table(
            {"m": pa.array([int(ids.min())]), "s": pa.array([int(n.sum())])}
        )

    sums = s.map_batches(block_sum, batch_format="pyarrow", batch_size=None).to_pandas()
    if len(sums) == 0 or "m" not in sums.columns:
        return s.map_batches(empty_pack, batch_format="pyarrow")
    sums = sums.sort_values("m", ignore_index=True)
    mins = sums["m"].to_numpy(dtype=np.int64)
    if len(mins) > 1 and (mins[1:] == mins[:-1]).any():
        # two sorted blocks share a min id ⇒ duplicate ids straddle a block
        # boundary — base lookup by min id would silently mis-assign prefixes
        raise ValueError("pack_sequences requires unique ids (duplicate id spans blocks)")
    base = np.zeros(len(mins), dtype=np.int64)
    np.cumsum(sums["s"].to_numpy(dtype=np.int64)[:-1], out=base[1:])
    base_ref = ray.put((mins, base))

    def finalize(batch: pa.Table) -> pa.Table:
        m = batch.num_rows
        if m == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "start_seq": pa.array([], pa.int64()),
                    "end_seq": pa.array([], pa.int64()),
                    "start_off": pa.array([], pa.int64()),
                }
            )
        mins_all, base_all = ray.get(base_ref)
        ids = np.asarray(batch.column(id_col))
        n = np.asarray(batch.column(token_col), dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        io, no = ids[order], n[order]
        pre = np.zeros(m, dtype=np.int64)
        np.cumsum(no[:-1], out=pre[1:])
        pre += base_all[np.searchsorted(mins_all, int(io[0]))]
        start_seq = pre // budget
        last = pre + np.maximum(no - 1, 0)
        return pa.table(
            {
                id_col: pa.array(io),
                "start_seq": pa.array(start_seq),
                "end_seq": pa.array(last // budget),
                "start_off": pa.array(pre % budget),
            }
        )

    return s.map_batches(finalize, batch_format="pyarrow", batch_size=None)


def stratified_sample(
    docs,
    *,
    key_col: str = "lang",
    id_col: str = "doc_id",
    n_target: int = 1000,
    quotas: dict | None = None,
    rank_by: str = "id",
):
    """Deterministic stratified sample with proportional allocation: each key
    group gets quota ``q_g = max(1, (n_target * c_g) // total)`` (integer
    arithmetic — bit-exact in SQL) and contributes its ``q_g`` smallest
    ``id_col`` values. Returns ``(id_col, key_col)``.

    Scale shape: group counts come from one native groupby (key cardinality
    = languages/sources — tiny); quotas broadcast once. Selection is
    distributed per-group rank WITHOUT co-locating whole groups' full rows:
    a map-side partial keeps at most ``q_g`` candidate ids per key per block
    (the classic top-k combiner), so the keyed exchange ships only
    ``O(blocks x q_g)`` candidates per key, then one vectorized per-block
    pass takes the final ``q_g`` smallest per key. A hot key (English at 50%
    of a 100 TB corpus) never funnels its full group through one worker —
    only its bounded candidate set.

    ``quotas``: explicit per-key targets (``{key: n}``) override the
    proportional allocation — the domain-mixing use (see ``mix_corpora``);
    keys absent from the dict contribute nothing.

    ``rank_by``: ``"id"`` (default — the original oracle-checked ordering,
    biased toward early documents) or ``"hash"`` — rank on the Fibonacci
    scramble ``(id * 0x9E3779B97F4A7C15) mod 2^64``, an id-decorrelated,
    statistically defensible mixture that stays deterministic and
    SQL-stateable (the bijection needs no tie-break).
    """
    import ray

    narrow = docs.select_columns([id_col, key_col])
    if quotas is not None:
        if not quotas:
            return narrow.limit(0)
        skeys = sorted(quotas)
        qmap_ref = ray.put(
            (np.array(skeys), np.array([int(quotas[k]) for k in skeys], dtype=np.int64))
        )
        return _rank_select(narrow, key_col, id_col, qmap_ref, rank_by)
    # proportional allocation consumes `narrow` twice (count pass + rank
    # passes) — materialize the 2-column projection once so the input isn't
    # scanned/derived twice (r5 profile: saved a full read+hash pass; the
    # projection is ~16 B/row and spills, far below the input it projects)
    narrow = narrow.materialize()
    # group counts via in-batch partials + a tiny driver sum — NOT the native
    # groupby-count, whose aggregator actors cost 7.5 s where this pass costs
    # <1 s on the same 200k rows (r5 profile; key cardinality = languages/
    # sources, so the driver sees only keys x blocks partial rows)
    kc = _key_counts(narrow, key_col)
    if kc is None:
        return narrow.limit(0)
    keys, counts = kc
    total = int(counts.sum())
    qarr = np.maximum(1, (int(n_target) * counts) // total)
    qarr = np.minimum(qarr, counts)
    qmap_ref = ray.put((keys, qarr))
    return _rank_select(narrow, key_col, id_col, qmap_ref, rank_by)


# Driver bound for the partial-count fast path: keys x blocks partial rows
# past this switch to the distributed groupby count (a web corpus stratified
# by ~1M domains over ~500 blocks would otherwise concat 500M partial rows
# onto the driver). The quota map itself is O(distinct keys) by design.
_KEY_COUNT_DRIVER_BOUND = 2_000_000


def _key_counts(narrow, key_col: str):
    """Sorted ``(keys, counts)`` for the stratum key column. Fast path (the
    LOW-CARDINALITY case — languages/sources): per-block ``np.unique``
    partials, driver-side bincount over the keys x blocks partial rows
    (<1 s where the native groupby-count's aggregator actors cost 7.5 s on
    the same 200k rows, r5 profile). If the partial stream exceeds
    ``_KEY_COUNT_DRIVER_BOUND`` rows (high-cardinality strata), abandon it
    and fall back to the distributed ``groupby().count()`` so driver traffic
    stays O(distinct keys), never O(keys x blocks). Returns None when the
    dataset is empty."""

    def partial(b: pa.Table) -> pa.Table:
        col = b.column(key_col).combine_chunks()
        if col.null_count:
            # np.unique/lexsort over object arrays compare None — fail clearly
            raise ValueError(
                f"stratified_sample: key column {key_col!r} contains nulls; "
                "fill_null to a sentinel stratum first"
            )
        k, c = np.unique(np.asarray(col), return_counts=True)
        return pa.table({key_col: pa.array(k), "__c": pa.array(c.astype(np.int64))})

    parts = []
    rows = 0
    overflow = False
    for b in narrow.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        if not b.num_rows:
            continue
        parts.append(b)
        rows += b.num_rows
        if rows > _KEY_COUNT_DRIVER_BOUND:
            overflow = True
            break
    if overflow:
        gb = narrow.groupby(key_col).count().to_pandas()
        if len(gb) == 0:
            return None
        gb = gb.sort_values(key_col, ignore_index=True)
        return gb[key_col].to_numpy(), gb["count()"].to_numpy(dtype=np.int64)
    if not parts:
        return None
    t = pa.concat_tables(parts)
    k = np.asarray(t.column(key_col))
    c = np.asarray(t.column("__c"))
    uk, inv = np.unique(k, return_inverse=True)
    tot = np.bincount(inv, weights=c).astype(np.int64)
    return uk, tot


def _rank_select(narrow, key_col: str, id_col: str, qmap_ref, rank_by: str = "id"):
    """Two-level per-key smallest-``q`` selection: map-side top-q combiner →
    keyed exchange of candidates only → exact per-block finish. ``qmap_ref``
    broadcasts a ``(sorted_keys, quotas)`` pair; keys absent from it get
    quota 0 (their rows are dropped). Ranking is by ``_rank_keys`` order."""
    import ray

    from raysketch.pipeline.dedup import _num_partitions

    def rank_filter(batch: pa.Table) -> pa.Table:
        m = batch.num_rows
        if m == 0:
            return batch
        qkeys, qvals = ray.get(qmap_ref)
        kcol = batch.column(key_col).combine_chunks()
        if kcol.null_count:
            # np.lexsort over object arrays compares None — fail clearly
            raise ValueError(
                f"stratified_sample: key column {key_col!r} contains nulls; "
                "fill_null to a sentinel stratum first"
            )
        k = np.asarray(kcol)
        # ordering by id: a null int64 id would float64-convert (NaN ranks
        # sort last and ids past 2^53 collide, silently diverging from the
        # SQL oracle) — and under rank_by='hash' produce a misleading
        # "got dtype float64" error for a column that IS int64
        require_non_null_ids(batch, id_col, "stratified_sample")
        ids = np.asarray(batch.column(id_col))
        perm = np.lexsort((_rank_keys(ids, rank_by), k))
        ks = k[perm]
        new = np.ones(m, dtype=bool)
        new[1:] = ks[1:] != ks[:-1]
        starts = np.nonzero(new)[0]
        seg_start = np.repeat(starts, np.diff(np.append(starts, m)))
        rank = np.arange(m, dtype=np.int64) - seg_start
        idx = np.clip(np.searchsorted(qkeys, ks), 0, len(qkeys) - 1)
        q = np.where(qkeys[idx] == ks, qvals[idx], 0)
        mask = np.zeros(m, dtype=bool)
        mask[perm[rank < q]] = True
        return batch.filter(pa.array(mask))

    pre = narrow.map_batches(rank_filter, batch_format="pyarrow", zero_copy_batch=True)
    # the exchange can never fill more blocks than there are distinct quota
    # keys — capping npart at the (known) key cardinality avoids spinning
    # aggregator actors that receive nothing (r5 profile)
    qkeys, _ = ray.get(qmap_ref)
    npart = max(2, min(_num_partitions(), len(qkeys)))
    parts = _keyed_parts(pre, [key_col], npart)
    return parts.map_batches(rank_filter, batch_format="pyarrow", batch_size=None)


def mix_corpora(
    sources: dict, weights: dict, n_target: int, id_col: str = "doc_id", rank_by: str = "id"
):
    """Deterministic domain mixing: draw ``round(n_target * w_s / sum(w))``
    docs (the quota smallest ``id_col`` values — or, with ``rank_by="hash"``,
    an id-decorrelated deterministic pick) from each source Dataset and
    union them with a ``source`` label column — the training-mixture
    composition step (e.g. 60% web / 30% code / 10% books). Integer
    allocation by largest-remainder so the quotas sum exactly to
    ``n_target`` (when feasible). Each source is sampled with the
    ``stratified_sample`` candidate-bounded machinery (constant key), so no
    source funnels through one worker."""
    import ray

    names = sorted(sources)
    w = np.array([float(weights[n]) for n in names], dtype=np.float64)
    if w.sum() <= 0:
        raise ValueError("mix_corpora: weights must sum to a positive value")
    exact = n_target * w / w.sum()
    base = np.floor(exact).astype(np.int64)
    rem = n_target - int(base.sum())
    order = np.argsort(-(exact - base))
    base[order[:rem]] += 1
    quotas = {name: int(q) for name, q in zip(names, base) if q > 0}
    if not quotas:
        raise ValueError("mix_corpora: all quotas are zero")
    labeled = []
    for name in names:
        if name not in quotas:
            continue

        def add_source(t: pa.Table, _n=name) -> pa.Table:
            return t.append_column(
                "source", pa.array(np.full(t.num_rows, _n, dtype=object), pa.string())
            )

        labeled.append(
            sources[name]
            .select_columns([id_col])
            .map_batches(add_source, batch_format="pyarrow", zero_copy_batch=True)
        )
    # ONE labeled union + ONE quota-keyed selection — r5: replaces the
    # per-source stratified_sample calls (S scans + S keyed exchanges) with a
    # single pipeline; per-source rows/order are unchanged (quota per source,
    # same rank rule)
    u = labeled[0]
    for p in labeled[1:]:
        u = u.union(p)
    return stratified_sample(
        u, key_col="source", id_col=id_col, quotas=quotas, rank_by=rank_by
    )
