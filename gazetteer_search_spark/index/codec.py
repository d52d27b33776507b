"""Posting-list block codec — vectorized numpy kernels, no per-row Python.

The reference delegates the posting format to Lucene (ES text fields,
/root/reference/src/main/resources/es_mappings/addr_row.json:41-52); this is
our native replacement: docID delta encoding + 7-bit varbyte (VByte)
compression in blocks of ``BLOCK_SIZE`` docs with per-block max-score
metadata for block-max WAND pruning.

Encoding convention: little-endian 7-bit groups, continuation bit (0x80) set
on every byte except the last of each value. Within a block the first docID
is stored as a delta against the block's ``min_doc_id`` metadata (so each
block is independently decodable), subsequent docIDs as gaps.

All kernels operate on whole numpy arrays (used inside applyInPandas /
mapInPandas over Arrow batches).
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128

_U7 = np.uint64(7)
_MASK7 = np.uint64(0x7F)


def varbyte_encode(values: np.ndarray) -> bytes:
    """Encode a non-negative int array as VByte. Vectorized."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    nb = np.ones(v.size, dtype=np.int64)
    rest = v >> _U7
    while rest.any():
        nb += (rest > 0).astype(np.int64)
        rest >>= _U7
    ends = np.cumsum(nb)
    starts = ends - nb
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for k in range(int(nb.max())):
        mask = nb > k
        pos = starts[mask] + k
        byte = ((v[mask] >> np.uint64(7 * k)) & _MASK7).astype(np.uint8)
        cont = np.where(k < nb[mask] - 1, np.uint8(0x80), np.uint8(0))
        out[pos] = byte | cont
    return out.tobytes()


def varbyte_decode(buf: bytes, n: int) -> np.ndarray:
    """Decode ``n`` values from a VByte buffer. Vectorized."""
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    b = np.frombuffer(buf, dtype=np.uint8)
    is_last = (b & 0x80) == 0
    group = np.zeros(b.size, dtype=np.int64)
    group[1:] = np.cumsum(is_last)[:-1]
    idx = np.arange(b.size, dtype=np.int64)
    changes = np.flatnonzero(np.diff(group)) + 1
    firsts = np.concatenate(([0], changes))
    pos = idx - firsts[group]
    vals = np.zeros(n, dtype=np.uint64)
    contrib = (b & np.uint8(0x7F)).astype(np.uint64) << (pos.astype(np.uint64) * _U7)
    np.bitwise_or.at(vals, group, contrib)
    return vals.astype(np.int64)


def delta_varbyte_encode(sorted_ids: np.ndarray, base: int) -> bytes:
    """Delta-encode a sorted id array against ``base`` (block min_doc_id),
    then VByte."""
    ids = np.asarray(sorted_ids, dtype=np.int64)
    deltas = np.empty(ids.size, dtype=np.int64)
    if ids.size:
        deltas[0] = ids[0] - base
        np.subtract(ids[1:], ids[:-1], out=deltas[1:])
    return varbyte_encode(deltas)


def delta_varbyte_decode(buf: bytes, n: int, base: int) -> np.ndarray:
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    deltas = varbyte_decode(buf, n)
    deltas[0] += base
    return np.cumsum(deltas)


def f64_encode(values: np.ndarray) -> bytes:
    return np.asarray(values, dtype=np.float64).tobytes()


def f64_decode(buf: bytes, n: int) -> np.ndarray:
    return np.frombuffer(buf, dtype=np.float64, count=n)
