"""Vectorized hashing kernels over Arrow columns.

Re-implements, from the public algorithm specifications, the two hash families the
reference library uses (see SURVEY.md §1.5; reference citations:
``/root/reference/fbloom/bloom.h:150-219`` vendored MurmurHash3-32,
``/root/reference/fbloom/external/xxhash.h`` XXH32/XXH64,
``/root/reference/fbloom/gloom.h:54-59,109-111`` XXH64 seed pair + ``h2 | 1``):

- **murmur3_32** (MurmurHash3 x86_32, Austin Appleby, public domain spec)
- **xxh64** (xxHash 64-bit, Yann Collet, BSD spec)

Both are implemented twice:

- a scalar pure-Python version (``murmur3_32_scalar`` / ``xxh64_scalar``) used as the
  test oracle and for golden vectors, and
- a vectorized numpy version operating on a flat ``uint8`` byte buffer plus per-row
  ``(start, length)`` spans — the layout of an Arrow String/Binary array's buffers —
  so hashing a whole Arrow column is zero-copy and allocation-light.

The vectorized versions loop over *block index*, not over rows: iteration ``j``
processes the ``j``-th 4-byte (murmur) / 32-byte (xxh64 stripe) block of every row
that still has one, fully vectorized across rows. Rows are pre-sorted by length so
each iteration touches a contiguous, shrinking prefix (no boolean-mask rebuilds).
Total work is O(total_bytes), matching the scalar algorithms.

Seed conventions (reference contract, SURVEY.md §1.5):

- classic pair: seeds ``(0, 0x87654321)`` — bloom.h:245-251, simple_benchmark.cpp:35-46
- gloom pair:   XXH64 seeds ``(0, 0x9E3779B97F4A7C15)``, ``h1`` truncated to uint32,
  ``h2`` truncated then forced odd (``| 1``) — gloom.h:54-59, 109-111
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# ---------------------------------------------------------------------------
# constants
# ---------------------------------------------------------------------------

_M3_C1 = np.uint32(0xCC9E2D51)
_M3_C2 = np.uint32(0x1B873593)

_XX_P1 = np.uint64(0x9E3779B185EBCA87)
_XX_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_XX_P3 = np.uint64(0x165667B19E3779F9)
_XX_P4 = np.uint64(0x85EBCA77C2B2AE63)
_XX_P5 = np.uint64(0x27D4EB2F165667C5)

_U32 = np.uint32
_U64 = np.uint64
_MASK32 = 0xFFFFFFFF
_MASK64 = 0xFFFFFFFFFFFFFFFF

CLASSIC_SEEDS = (0, 0x87654321)  # bloom.h:245-251
GLOOM_SEEDS = (0, 0x9E3779B97F4A7C15)  # gloom.h:54-59


# ---------------------------------------------------------------------------
# scalar reference implementations (test oracles)
# ---------------------------------------------------------------------------


def murmur3_32_scalar(data: bytes, seed: int = 0) -> int:
    """MurmurHash3 x86_32 of ``data`` — pure-Python spec implementation."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & _MASK32
    n = len(data)
    nblocks = n // 4
    for i in range(nblocks):
        k = int.from_bytes(data[4 * i : 4 * i + 4], "little")
        k = (k * c1) & _MASK32
        k = ((k << 15) | (k >> 17)) & _MASK32
        k = (k * c2) & _MASK32
        h ^= k
        h = ((h << 13) | (h >> 19)) & _MASK32
        h = (h * 5 + 0xE6546B64) & _MASK32
    tail = data[nblocks * 4 :]
    k = 0
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & _MASK32
        k = ((k << 15) | (k >> 17)) & _MASK32
        k = (k * c2) & _MASK32
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _MASK32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _MASK32
    h ^= h >> 16
    return h


_XX32_P1 = np.uint32(2654435761)
_XX32_P2 = np.uint32(2246822519)
_XX32_P3 = np.uint32(3266489917)
_XX32_P4 = np.uint32(668265263)
_XX32_P5 = np.uint32(374761393)


def xxh32_scalar(data: bytes, seed: int = 0) -> int:
    """XXH32 of ``data`` — pure-Python spec implementation (xxHash spec, Yann
    Collet, BSD; the reference benches the XXH32/XXH64 pair side by side,
    simple_benchmark.cpp:35-40)."""
    p1, p2, p3, p4, p5 = 2654435761, 2246822519, 3266489917, 668265263, 374761393

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (32 - r))) & _MASK32

    n = len(data)
    seed &= _MASK32
    i = 0
    if n >= 16:
        a1 = (seed + p1 + p2) & _MASK32
        a2 = (seed + p2) & _MASK32
        a3 = seed
        a4 = (seed - p1) & _MASK32
        while i + 16 <= n:
            for j, a in enumerate((a1, a2, a3, a4)):
                lane = int.from_bytes(data[i + 4 * j : i + 4 * j + 4], "little")
                a = (a + lane * p2) & _MASK32
                a = (rotl(a, 13) * p1) & _MASK32
                if j == 0:
                    a1 = a
                elif j == 1:
                    a2 = a
                elif j == 2:
                    a3 = a
                else:
                    a4 = a
            i += 16
        h = (rotl(a1, 1) + rotl(a2, 7) + rotl(a3, 12) + rotl(a4, 18)) & _MASK32
    else:
        h = (seed + p5) & _MASK32
    h = (h + n) & _MASK32
    while i + 4 <= n:
        lane = int.from_bytes(data[i : i + 4], "little")
        h = (h + lane * p3) & _MASK32
        h = (rotl(h, 17) * p4) & _MASK32
        i += 4
    while i < n:
        h = (h + data[i] * p5) & _MASK32
        h = (rotl(h, 11) * p1) & _MASK32
        i += 1
    h ^= h >> 15
    h = (h * p2) & _MASK32
    h ^= h >> 13
    h = (h * p3) & _MASK32
    h ^= h >> 16
    return h


def _xx_rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK64


def _xx_round(acc: int, lane: int) -> int:
    acc = (acc + lane * 0xC2B2AE3D27D4EB4F) & _MASK64
    acc = _xx_rotl(acc, 31)
    return (acc * 0x9E3779B185EBCA87) & _MASK64


def xxh64_scalar(data: bytes, seed: int = 0) -> int:
    """XXH64 of ``data`` — pure-Python spec implementation."""
    p1, p2, p3, p4, p5 = (
        0x9E3779B185EBCA87,
        0xC2B2AE3D27D4EB4F,
        0x165667B19E3779F9,
        0x85EBCA77C2B2AE63,
        0x27D4EB2F165667C5,
    )
    n = len(data)
    seed &= _MASK64
    i = 0
    if n >= 32:
        a1 = (seed + p1 + p2) & _MASK64
        a2 = (seed + p2) & _MASK64
        a3 = seed
        a4 = (seed - p1) & _MASK64
        while i + 32 <= n:
            a1 = _xx_round(a1, int.from_bytes(data[i : i + 8], "little"))
            a2 = _xx_round(a2, int.from_bytes(data[i + 8 : i + 16], "little"))
            a3 = _xx_round(a3, int.from_bytes(data[i + 16 : i + 24], "little"))
            a4 = _xx_round(a4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_xx_rotl(a1, 1) + _xx_rotl(a2, 7) + _xx_rotl(a3, 12) + _xx_rotl(a4, 18)) & _MASK64
        for a in (a1, a2, a3, a4):
            h = ((h ^ _xx_round(0, a)) * p1 + p4) & _MASK64
    else:
        h = (seed + p5) & _MASK64
    h = (h + n) & _MASK64
    while i + 8 <= n:
        k = _xx_round(0, int.from_bytes(data[i : i + 8], "little"))
        h = ((_xx_rotl(h ^ k, 27) * p1) + p4) & _MASK64
        i += 8
    if i + 4 <= n:
        k = (int.from_bytes(data[i : i + 4], "little") * p1) & _MASK64
        h = ((_xx_rotl(h ^ k, 23) * p2) + p3) & _MASK64
        i += 4
    while i < n:
        k = (data[i] * p5) & _MASK64
        h = (_xx_rotl(h ^ k, 11) * p1) & _MASK64
        i += 1
    h ^= h >> 33
    h = (h * p2) & _MASK64
    h ^= h >> 29
    h = (h * p3) & _MASK64
    h ^= h >> 32
    return h


# ---------------------------------------------------------------------------
# Arrow column → (data, starts, lengths) spans
# ---------------------------------------------------------------------------


def column_spans(col) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Expose an Arrow/numpy column as ``(data_u8, starts, lengths)`` byte spans.

    - String/Binary Arrow arrays: zero-copy view of the offsets + data buffers
      (the bytes hashed are exactly the UTF-8 / raw bytes of each cell, matching
      the reference's string branch, bloom.h:448-453).
    - Fixed-width numeric columns: little-endian raw bytes of each value, matching
      the trivially-copyable branch (bloom.h:454-456).
    - Nulls hash as empty strings.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.Array):
        t = col.type
        if pa.types.is_string(t) or pa.types.is_binary(t):
            off_dtype = np.int32
        elif pa.types.is_large_string(t) or pa.types.is_large_binary(t):
            off_dtype = np.int64
        elif pa.types.is_integer(t) or pa.types.is_floating(t) or pa.types.is_timestamp(t):
            # raw little-endian value bytes straight from the Arrow data buffer —
            # zero-copy AND null-safe. (to_numpy on an int column with ANY null
            # promotes the whole batch to float64, silently changing every value's
            # hash vs null-free batches.) Null rows get zero-length spans, so they
            # hash as empty strings — same rule as the string/binary path.
            width = t.bit_width // 8
            bufs = col.buffers()
            data = (
                np.frombuffer(bufs[1], dtype=np.uint8)
                if bufs[1] is not None
                else np.zeros((len(col) + col.offset) * width, np.uint8)  # all-null arrays may omit the buffer
            )
            starts = (np.arange(len(col), dtype=np.int64) + col.offset) * width
            lengths = np.full(len(col), width, dtype=np.int64)
            if col.null_count:
                valid = col.is_valid().to_numpy(zero_copy_only=False)
                lengths[~valid] = 0
            return data, starts, lengths
        else:
            raise TypeError(f"unsupported Arrow type for hashing: {t}")
        bufs = col.buffers()
        offs = np.frombuffer(bufs[1], dtype=off_dtype)[col.offset : col.offset + len(col) + 1]
        offs = offs.astype(np.int64, copy=False)
        data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
        starts = offs[:-1].copy()
        lengths = (offs[1:] - offs[:-1]).copy()
        if col.null_count:
            nulls = np.array([not v for v in col.is_valid().to_pylist()])
            lengths[nulls] = 0
        return data, starts, lengths
    np_arr = np.asarray(col)
    if np_arr.dtype == object:
        enc = [v.encode() if isinstance(v, str) else (v or b"") for v in np_arr]
        lengths = np.fromiter((len(b) for b in enc), count=len(enc), dtype=np.int64)
        starts = np.zeros(len(enc), dtype=np.int64)
        np.cumsum(lengths[:-1], out=starts[1:])
        data = np.frombuffer(b"".join(enc), dtype=np.uint8)
        return data, starts, lengths
    return _fixed_width_spans(np_arr)


def _fixed_width_spans(np_arr: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    if np_arr.dtype.kind == "M":  # datetime64 → int64 epoch units
        np_arr = np_arr.view(np.int64)
    le = np_arr.astype(np_arr.dtype.newbyteorder("<"), copy=False)
    width = le.dtype.itemsize
    data = np.ascontiguousarray(le).view(np.uint8)
    n = len(np_arr)
    starts = np.arange(n, dtype=np.int64) * width
    lengths = np.full(n, width, dtype=np.int64)
    return data, starts, lengths


# ---------------------------------------------------------------------------
# vectorized murmur3_32
# ---------------------------------------------------------------------------


def _rotl32(x: np.ndarray, r: int) -> np.ndarray:
    return (x << _U32(r)) | (x >> _U32(32 - r))


def _rotl64(x: np.ndarray, r: int) -> np.ndarray:
    return (x << _U64(r)) | (x >> _U64(64 - r))


def _gather_u32(data: np.ndarray, idx: np.ndarray) -> np.ndarray:
    return (
        data[idx].astype(np.uint32)
        | (data[idx + 1].astype(np.uint32) << _U32(8))
        | (data[idx + 2].astype(np.uint32) << _U32(16))
        | (data[idx + 3].astype(np.uint32) << _U32(24))
    )


def _gather_u64(data: np.ndarray, idx: np.ndarray) -> np.ndarray:
    out = data[idx].astype(np.uint64)
    for b in range(1, 8):
        out |= data[idx + b].astype(np.uint64) << _U64(8 * b)
    return out


def murmur3_32_vec(
    data: np.ndarray, starts: np.ndarray, lengths: np.ndarray, seed: int = 0
) -> np.ndarray:
    """Vectorized MurmurHash3 x86_32 over per-row byte spans → uint32 array."""
    n = len(starts)
    if n == 0:
        return np.empty(0, dtype=np.uint32)
    nblocks = (lengths // 4).astype(np.int64)
    uniform = bool((lengths == lengths[0]).all())  # fixed-width fast path: no sort
    if uniform:
        order = None
        sb = starts
        nb = nblocks
        nb_asc = nb
    else:
        # sort rows by descending block count → iteration j touches prefix [0:cnt_j)
        order = np.argsort(-nblocks, kind="stable")
        sb = starts[order]
        nb = nblocks[order]
        nb_asc = nb[::-1]
    h = np.full(n, _U32(seed & _MASK32), dtype=np.uint32)
    maxb = int(nb.max()) if n else 0
    with np.errstate(over="ignore"):
        for j in range(maxb):
            cnt = n if uniform else n - int(np.searchsorted(nb_asc, j, side="right"))
            idx = sb[:cnt] + 4 * j
            k = _gather_u32(data, idx)
            k *= _M3_C1
            k = _rotl32(k, 15)
            k *= _M3_C2
            hh = h[:cnt]
            hh ^= k
            hh = _rotl32(hh, 13)
            hh = hh * _U32(5) + _U32(0xE6546B64)
            h[:cnt] = hh
        # tail (1-3 remaining bytes); same switch-fallthrough semantics as the spec
        sl = lengths if uniform else lengths[order]
        rem = (sl - nb * 4).astype(np.int64)
        has_tail = rem > 0
        if has_tail.any():
            ti = np.nonzero(has_tail)[0]
            tstart = sb[ti] + nb[ti] * 4
            trem = rem[ti]
            k = np.zeros(len(ti), dtype=np.uint32)
            m3 = trem >= 3
            if m3.any():
                k[m3] ^= data[tstart[m3] + 2].astype(np.uint32) << _U32(16)
            m2 = trem >= 2
            if m2.any():
                k[m2] ^= data[tstart[m2] + 1].astype(np.uint32) << _U32(8)
            k ^= data[tstart].astype(np.uint32)
            k *= _M3_C1
            k = _rotl32(k, 15)
            k *= _M3_C2
            h[ti] ^= k
        # finalization
        h ^= sl.astype(np.uint32)
        h ^= h >> _U32(16)
        h *= _U32(0x85EBCA6B)
        h ^= h >> _U32(13)
        h *= _U32(0xC2B2AE35)
        h ^= h >> _U32(16)
    if uniform:
        return h
    out = np.empty(n, dtype=np.uint32)
    out[order] = h
    return out


# ---------------------------------------------------------------------------
# vectorized xxh32
# ---------------------------------------------------------------------------


def xxh32_vec(
    data: np.ndarray, starts: np.ndarray, lengths: np.ndarray, seed: int = 0
) -> np.ndarray:
    """Vectorized XXH32 over per-row byte spans → uint32 array. Same
    block-index-loop scheme as the other kernels: iteration j processes the j-th
    16-byte stripe of every row that still has one."""
    n = len(starts)
    if n == 0:
        return np.empty(0, dtype=np.uint32)
    seed32 = _U32(seed & _MASK32)
    nstripes = np.where(lengths >= 16, lengths // 16, 0).astype(np.int64)
    uniform = bool((lengths == lengths[0]).all())
    if uniform:
        order = None
        sb, sl, ns = starts, lengths, nstripes
        ns_asc = ns
        lm = lengths >= 16
    else:
        order = np.argsort(-nstripes, kind="stable")
        sb, sl, ns = starts[order], lengths[order], nstripes[order]
        ns_asc = ns[::-1]
        lm = sl >= 16

    with np.errstate(over="ignore"):
        h = np.full(n, seed32 + _XX32_P5, dtype=np.uint32)
        nlong = int(lm.sum())
        if nlong:
            a1 = np.full(nlong, seed32 + _XX32_P1 + _XX32_P2, dtype=np.uint32)
            a2 = np.full(nlong, seed32 + _XX32_P2, dtype=np.uint32)
            a3 = np.full(nlong, seed32, dtype=np.uint32)
            a4 = np.full(nlong, seed32 - _XX32_P1, dtype=np.uint32)
            for j in range(int(ns.max())):
                cnt = n if uniform else n - int(np.searchsorted(ns_asc, j, side="right"))
                base = sb[:cnt] + 16 * j
                for lane, acc in ((0, a1), (1, a2), (2, a3), (3, a4)):
                    k = _gather_u32(data, base + 4 * lane)
                    a = acc[:cnt] + k * _XX32_P2
                    acc[:cnt] = _rotl32(a, 13) * _XX32_P1
            hl = _rotl32(a1, 1) + _rotl32(a2, 7) + _rotl32(a3, 12) + _rotl32(a4, 18)
            h[:nlong] = hl
        h += sl.astype(np.uint32)
        # tail: up to 3 4-byte rounds, then up to 3 single bytes
        p = sb + ns * 16
        ends = sb + sl
        for _ in range(3):
            cond = ends - p >= 4
            if cond.all():
                k = _gather_u32(data, p)
                h = _rotl32(h + k * _XX32_P3, 17) * _XX32_P4
                p = p + 4
                continue
            act = np.nonzero(cond)[0]
            if len(act) == 0:
                break
            k = _gather_u32(data, p[act])
            h[act] = _rotl32(h[act] + k * _XX32_P3, 17) * _XX32_P4
            p[act] += 4
        for _ in range(3):
            cond = ends > p
            if cond.all():
                h = _rotl32(h + data[p].astype(np.uint32) * _XX32_P5, 11) * _XX32_P1
                p = p + 1
                continue
            act = np.nonzero(cond)[0]
            if len(act) == 0:
                break
            h[act] = _rotl32(h[act] + data[p[act]].astype(np.uint32) * _XX32_P5, 11) * _XX32_P1
            p[act] += 1
        h ^= h >> _U32(15)
        h *= _XX32_P2
        h ^= h >> _U32(13)
        h *= _XX32_P3
        h ^= h >> _U32(16)
    if uniform:
        return h
    out = np.empty(n, dtype=np.uint32)
    out[order] = h
    return out


# ---------------------------------------------------------------------------
# vectorized xxh64
# ---------------------------------------------------------------------------


def _xx_round_vec(acc: np.ndarray, lane: np.ndarray) -> np.ndarray:
    acc = acc + lane * _XX_P2
    acc = _rotl64(acc, 31)
    return acc * _XX_P1


def xxh64_vec(
    data: np.ndarray, starts: np.ndarray, lengths: np.ndarray, seed: int = 0
) -> np.ndarray:
    """Vectorized XXH64 over per-row byte spans → uint64 array."""
    n = len(starts)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    seed64 = _U64(seed & _MASK64)
    nstripes = (lengths // 32).astype(np.int64)
    long_mask = lengths >= 32
    nstripes = np.where(long_mask, nstripes, 0)

    uniform = bool((lengths == lengths[0]).all())  # fixed-width fast path: no sort
    if uniform:
        order = None
        sb, sl, ns, lm = starts, lengths, nstripes, long_mask
        ns_asc = ns
    else:
        order = np.argsort(-nstripes, kind="stable")
        sb = starts[order]
        sl = lengths[order]
        ns = nstripes[order]
        ns_asc = ns[::-1]
        lm = long_mask[order]

    with np.errstate(over="ignore"):
        h = np.full(n, seed64 + _XX_P5, dtype=np.uint64)
        nlong = int(lm.sum())
        if nlong:
            a1 = np.full(nlong, seed64 + _XX_P1 + _XX_P2, dtype=np.uint64)
            a2 = np.full(nlong, seed64 + _XX_P2, dtype=np.uint64)
            a3 = np.full(nlong, seed64, dtype=np.uint64)
            a4 = np.full(nlong, seed64 - _XX_P1, dtype=np.uint64)
            maxs = int(ns.max())
            for j in range(maxs):
                cnt = n if uniform else n - int(np.searchsorted(ns_asc, j, side="right"))
                base = sb[:cnt] + 32 * j
                a1[:cnt] = _xx_round_vec(a1[:cnt], _gather_u64(data, base))
                a2[:cnt] = _xx_round_vec(a2[:cnt], _gather_u64(data, base + 8))
                a3[:cnt] = _xx_round_vec(a3[:cnt], _gather_u64(data, base + 16))
                a4[:cnt] = _xx_round_vec(a4[:cnt], _gather_u64(data, base + 24))
            hl = _rotl64(a1, 1) + _rotl64(a2, 7) + _rotl64(a3, 12) + _rotl64(a4, 18)
            for a in (a1, a2, a3, a4):
                hl = (hl ^ _xx_round_vec(np.zeros_like(a), a)) * _XX_P1 + _XX_P4
            h[:nlong] = hl
        h += sl.astype(np.uint64)
        # tail: per-row cursor past the stripes
        p = sb + ns * 32
        ends = sb + sl
        # up to 3 8-byte rounds (whole-array fast path when every row qualifies)
        for _ in range(3):
            cond = ends - p >= 8
            if cond.all():
                k = _xx_round_vec(np.zeros(n, dtype=np.uint64), _gather_u64(data, p))
                h = _rotl64(h ^ k, 27) * _XX_P1 + _XX_P4
                p = p + 8
                continue
            act = np.nonzero(cond)[0]
            if len(act) == 0:
                break
            k = _xx_round_vec(np.zeros(len(act), dtype=np.uint64), _gather_u64(data, p[act]))
            h[act] = _rotl64(h[act] ^ k, 27) * _XX_P1 + _XX_P4
            p[act] += 8
        cond = ends - p >= 4
        if cond.all():
            k = _gather_u32(data, p).astype(np.uint64) * _XX_P1
            h = _rotl64(h ^ k, 23) * _XX_P2 + _XX_P3
            p = p + 4
        else:
            act = np.nonzero(cond)[0]
            if len(act):
                k = _gather_u32(data, p[act]).astype(np.uint64) * _XX_P1
                h[act] = _rotl64(h[act] ^ k, 23) * _XX_P2 + _XX_P3
                p[act] += 4
        for _ in range(3):
            cond = ends > p
            if cond.all():
                k = data[p].astype(np.uint64) * _XX_P5
                h = _rotl64(h ^ k, 11) * _XX_P1
                p = p + 1
                continue
            act = np.nonzero(cond)[0]
            if len(act) == 0:
                break
            k = data[p[act]].astype(np.uint64) * _XX_P5
            h[act] = _rotl64(h[act] ^ k, 11) * _XX_P1
            p[act] += 1
        h ^= h >> _U64(33)
        h *= _XX_P2
        h ^= h >> _U64(29)
        h *= _XX_P3
        h ^= h >> _U64(32)
    if uniform:
        return h
    out = np.empty(n, dtype=np.uint64)
    out[order] = h
    return out


# ---------------------------------------------------------------------------
# public column-level API
# ---------------------------------------------------------------------------


def hash_column(col, algo: str = "xxh64", seed: int = 0) -> np.ndarray:
    """Hash every cell of an Arrow/numpy column. Returns uint32 (murmur3) or uint64."""
    data, starts, lengths = column_spans(col)
    if algo == "murmur3":
        return murmur3_32_vec(data, starts, lengths, seed)
    if algo == "xxh32":
        return xxh32_vec(data, starts, lengths, seed)
    if algo == "xxh64":
        return xxh64_vec(data, starts, lengths, seed)
    raise ValueError(f"unknown hash algo: {algo}")


def hash_pair(
    col,
    algo: str = "xxh64",
    seeds: tuple[int, int] = CLASSIC_SEEDS,
    h2_odd: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """The reference's canonical ``(h1, h2)`` uint32 hash pair for a column.

    ``algo="xxh64"``: two XXH64 passes (seeds per ``seeds``), truncated to uint32 —
    simple_benchmark.cpp:41-46 / gloom.h:94-112 semantics.
    ``algo="murmur3"``: two murmur3_32 passes — bloom.h:245-251 semantics.
    ``algo="xxh64_split"``: ONE XXH64 pass (seed ``seeds[0]``); h1 = low 32 bits,
    h2 = high 32 bits — the fast path (half the hashing work; the two halves of a
    64-bit hash are independent enough for Kirsch–Mitzenmacher double hashing).
    ``h2_odd``: force h2 odd (``| 1``), the Gloom rule (gloom.h:109-111).
    """
    data, starts, lengths = column_spans(col)
    if algo == "murmur3":
        h1 = murmur3_32_vec(data, starts, lengths, seeds[0])
        h2 = murmur3_32_vec(data, starts, lengths, seeds[1])
    elif algo == "xxh32":
        # the reference's XXH32 pair (simple_benchmark.cpp:35-40, same seed pair)
        h1 = xxh32_vec(data, starts, lengths, seeds[0])
        h2 = xxh32_vec(data, starts, lengths, seeds[1])
    elif algo == "xxh64":
        h1 = xxh64_vec(data, starts, lengths, seeds[0]).astype(np.uint32)
        h2 = xxh64_vec(data, starts, lengths, seeds[1]).astype(np.uint32)
    elif algo == "xxh64_split":
        h = xxh64_vec(data, starts, lengths, seeds[0])
        h1 = h.astype(np.uint32)
        h2 = (h >> _U64(32)).astype(np.uint32)
    else:
        raise ValueError(f"unknown hash algo: {algo}")
    if h2_odd:
        h2 = h2 | _U32(1)
    return h1, h2


def shard_of(h1: np.ndarray, num_shards: int) -> np.ndarray:
    """Reference shard routing: ``(h1 >> 16) & (num_shards - 1)``, power-of-two shards
    (parallel_bloom.h:60-61, gloom.h:127-128 — high bits avoid low-bit bias)."""
    if num_shards & (num_shards - 1):
        raise ValueError("num_shards must be a power of two")
    return ((h1.astype(np.uint32) >> _U32(16)) & _U32(num_shards - 1)).astype(np.int32)
