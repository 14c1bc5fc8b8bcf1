"""Delta + variable-byte codec for posting payloads.

Classic IR varbyte (7 data bits per byte, little-endian groups, MSB set on
continuation bytes), with numpy-vectorized encode/decode so segment build
and query decode stay off the per-element Python path.  Replaces the
reference's row-per-posting SQLite storage (``Indexer/SQLiteSearcher.java:63-83``)
with compressed per-term blocks (SURVEY.md §1.4, §7.2 step 3).

Layout helpers:

* ``encode_doc_ids`` / ``decode_doc_ids`` — sorted unique ids, delta-gap
  coded (first id absolute, then gaps >= 1).
* ``encode_position_lists`` / ``decode_position_lists`` — per-doc sorted
  position lists, flattened: lengths stream + delta-coded values stream.
* ``pack_f64`` / ``unpack_f64`` — raw little-endian float64 for tf values
  (bit-exact round-trip; rank-identity forbids lossy floats).

All functions are deterministic byte-for-byte for a given input, which is
what makes segment files comparable across resumed builds (SURVEY.md §7.5.4).
"""

from __future__ import annotations

import numpy as np

_MAX_BYTES = 10  # 64 bits / 7


# varbyte group-width thresholds: value v needs k bytes iff
# v >= 2^(7(k-1)); searchsorted over these beats bit-twiddling passes
_WIDTH_THRESHOLDS = (np.uint64(1) << (np.uint64(7) * np.arange(1, 10, dtype=np.uint64)))


def varbyte_encode(values: np.ndarray) -> bytes:
    """Encode a uint64 array.  Vectorized: one pass per byte-level."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # bytes needed per value: one searchsorted over the 9 width thresholds
    nbytes = np.searchsorted(_WIDTH_THRESHOLDS, v, side="right") + 1
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    # offset of each value's first byte
    offs = np.zeros(v.size, dtype=np.int64)
    np.cumsum(nbytes[:-1], out=offs[1:])
    for level in range(int(nbytes.max())):
        sel = nbytes > level
        idx = offs[sel] + level
        byte = (v[sel] >> np.uint64(7 * level)) & np.uint64(0x7F)
        cont = (nbytes[sel] - 1) > level
        out[idx] = byte.astype(np.uint8) | (cont.astype(np.uint8) << 7)
    return out.tobytes()


def varbyte_decode(buf: bytes | memoryview, count: int | None = None) -> np.ndarray:
    """Decode to uint64.  ``count`` (if known) is validated."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    # fast path: every value fits 7 bits (no continuation bytes) — the
    # overwhelmingly common shape for dense position gaps
    if b.max() < 0x80:
        if count is not None and b.size != count:
            raise ValueError(f"varbyte stream has {b.size} values, expected {count}")
        return b.astype(np.uint64)
    is_last = (b & 0x80) == 0
    # group id per byte = number of completed groups before it
    group = np.zeros(b.size, dtype=np.int64)
    np.cumsum(is_last[:-1], out=group[1:])
    n = int(is_last.sum())
    if count is not None and n != count:
        raise ValueError(f"varbyte stream has {n} values, expected {count}")
    starts = np.flatnonzero(np.r_[True, is_last[:-1]])
    pos_in_group = np.arange(b.size, dtype=np.int64) - starts[group]
    contrib = (b & 0x7F).astype(np.uint64) << (7 * pos_in_group).astype(np.uint64)
    out = np.add.reduceat(contrib, starts)
    return out.astype(np.uint64, copy=False)


def encode_doc_ids(doc_ids: np.ndarray) -> bytes:
    """Delta-gap encode a strictly increasing int64/uint64 id array."""
    ids = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    if ids.size == 0:
        return b""
    deltas = np.empty_like(ids)
    deltas[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=deltas[1:])
    return varbyte_encode(deltas)


def decode_doc_ids(buf: bytes | memoryview, count: int | None = None) -> np.ndarray:
    deltas = varbyte_decode(buf, count)
    return np.cumsum(deltas, dtype=np.uint64)


def encode_position_lists(lists: list[list[int]]) -> tuple[bytes, bytes]:
    """Encode per-doc sorted position lists.

    Returns ``(lens_enc, vals_enc)``: varbyte of per-doc lengths, and
    varbyte of the per-doc delta streams concatenated (first position
    absolute, then gaps).
    """
    lens = np.fromiter((len(l) for l in lists), dtype=np.uint64, count=len(lists))
    if lens.sum() == 0:
        return varbyte_encode(lens), b""
    flat = np.concatenate([np.asarray(l, dtype=np.uint64) for l in lists if l])
    # delta within each list: subtract previous element, but reset at list
    # starts (keep absolute first value)
    deltas = flat.copy()
    starts = np.zeros(len(flat), dtype=bool)
    pos = 0
    for n in lens:
        if n:
            starts[pos] = True
            pos += int(n)
    inner = ~starts
    inner[0] = False
    prev = np.roll(flat, 1)
    deltas[inner] = flat[inner] - prev[inner]
    return varbyte_encode(lens), varbyte_encode(deltas)


def decode_position_lists(
    lens_enc: bytes | memoryview, vals_enc: bytes | memoryview
) -> list[np.ndarray]:
    lens = varbyte_decode(lens_enc).astype(np.int64)
    deltas = varbyte_decode(vals_enc)
    if deltas.size == 0:
        return [np.empty(0, dtype=np.uint64) for _ in lens]
    ends = np.cumsum(lens)
    starts = ends - lens
    vals = np.cumsum(deltas, dtype=np.uint64)
    # undo the cross-list carry: subtract the running total at each list start
    out: list[np.ndarray] = []
    base = np.uint64(0)
    for s, e in zip(starts, ends):
        if s == e:
            out.append(np.empty(0, dtype=np.uint64))
            continue
        chunk = vals[s:e] - base
        base = vals[e - 1]
        out.append(chunk)
    return out


def nbytes_per_value(values: np.ndarray) -> np.ndarray:
    """Varbyte byte-count per value (vectorized)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    return np.searchsorted(_WIDTH_THRESHOLDS, v, side="right") + 1


def delta_encode_lists(values: np.ndarray, list_offsets: np.ndarray) -> np.ndarray:
    """Delta-code a flat concatenation of sorted lists: each list's first
    element stays absolute, later elements become gaps."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    deltas = v.copy()
    if v.size > 1:
        deltas[1:] = v[1:] - v[:-1]
        starts = list_offsets[:-1]
        starts = starts[starts < v.size]
        deltas[starts] = v[starts]
    return deltas


def varbyte_encode_concat(
    deltas: np.ndarray, list_offsets: np.ndarray
) -> tuple[bytes, np.ndarray]:
    """Encode the flat delta stream as ONE varbyte buffer; return
    ``(buffer, byte_length_per_list)`` so callers can rebuild per-list
    blob boundaries (an Arrow binary column) without re-encoding."""
    buf = varbyte_encode(deltas)
    if deltas.size == 0:
        return buf, np.zeros(max(len(list_offsets) - 1, 0), dtype=np.int64)
    nb = nbytes_per_value(deltas)
    byte_offsets = np.zeros(len(nb) + 1, dtype=np.int64)
    np.cumsum(nb, out=byte_offsets[1:])
    byte_lens = byte_offsets[list_offsets[1:]] - byte_offsets[list_offsets[:-1]]
    return buf, byte_lens


def decode_position_blobs(
    blob_lens: np.ndarray, blobs: bytes | memoryview
) -> list[np.ndarray]:
    """Decode concatenated per-list varbyte blobs back into position
    arrays.  Fully vectorized: one pass over the byte stream; per-list
    value counts come from terminator-bit counting at blob boundaries."""
    b = np.frombuffer(blobs, dtype=np.uint8)
    n_lists = len(blob_lens)
    if b.size == 0:
        return [np.empty(0, dtype=np.uint64) for _ in range(n_lists)]
    byte_offsets = np.zeros(n_lists + 1, dtype=np.int64)
    np.cumsum(blob_lens, out=byte_offsets[1:])
    is_last = (b & 0x80) == 0
    # values per list = terminators inside its byte range
    cum_last = np.zeros(b.size + 1, dtype=np.int64)
    np.cumsum(is_last, out=cum_last[1:])
    counts = cum_last[byte_offsets[1:]] - cum_last[byte_offsets[:-1]]
    deltas = varbyte_decode(b)
    vals = np.cumsum(deltas, dtype=np.uint64)
    ends = np.cumsum(counts)
    starts = ends - counts
    out: list[np.ndarray] = []
    base = np.uint64(0)
    for s, e in zip(starts, ends):
        if s == e:
            out.append(np.empty(0, dtype=np.uint64))
            continue
        chunk = vals[s:e] - base
        base = vals[e - 1]
        out.append(chunk)
    return out


def pack_f64(values: np.ndarray) -> bytes:
    return np.ascontiguousarray(values, dtype="<f8").tobytes()


def unpack_f64(buf: bytes | memoryview) -> np.ndarray:
    return np.frombuffer(buf, dtype="<f8")
