"""K1/K2 kernels: delta coding + vectorized LEB128 varint (SURVEY §2.8).

Both directions are fully vectorized numpy (no per-int Python loop), per the
BASELINE.json input_hint "no per-row Python". Encoding layout is standard
LEB128: little-endian 7-bit groups, MSB = continuation.
"""

from __future__ import annotations

import numpy as np

# value >= _THRESH[k-1]  ⇒  needs more than k bytes
_THRESH = np.array([np.uint64(1) << np.uint64(7 * k) for k in range(1, 10)],
                   dtype=np.uint64)


def varint_lengths(a: np.ndarray) -> np.ndarray:
    """Encoded byte count per value (uint64 array in) — one C-level
    binary search over the 9 thresholds instead of 9 full passes."""
    return np.searchsorted(_THRESH, a, side="right") + 1


def varint_encode(values, nbytes: np.ndarray | None = None) -> bytes:
    """LEB128-encode a 1-D array of non-negative ints (any int dtype).

    Scatter-based: writes each byte position k with one vectorized pass
    over the values that have a k-th byte (k ≤ 3 for doc deltas / tfs),
    instead of materializing an (n × max_width) matrix + boolean select —
    ~3× less memory traffic on posting-sized arrays. Callers that already
    hold varint_lengths(a) pass it via `nbytes` to skip recomputation."""
    a = np.ascontiguousarray(values, dtype=np.uint64)
    if a.size == 0:
        return b""
    if nbytes is None:
        nbytes = varint_lengths(a)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.empty(int(ends[-1]), dtype=np.uint8)
    width = int(nbytes.max())
    for k in range(width):
        m = nbytes > k                       # values owning a k-th byte
        ak = a[m] if k else a
        sk = starts[m] if k else starts
        byte = ((ak >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        cont = ((nbytes[m] if k else nbytes) - 1) > k
        out[sk + k] = byte | (cont.astype(np.uint8) << 7)
    return out.tobytes()


def varint_decode(buf: bytes | bytearray | memoryview) -> np.ndarray:
    """Decode a LEB128 stream to uint64. Vectorized via bitwise_or.reduceat."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = (b & 0x80) == 0
    starts = np.flatnonzero(np.concatenate(([True], ends[:-1])))
    gid = np.cumsum(np.concatenate(([False], ends[:-1])))
    pos = np.arange(b.size, dtype=np.int64) - starts[gid]
    contrib = (b.astype(np.uint64) & np.uint64(0x7F)) << (
        pos.astype(np.uint64) * np.uint64(7))
    return np.bitwise_or.reduceat(contrib, starts)


def delta_encode(sorted_ids) -> np.ndarray:
    """d[0]=x[0], d[i]=x[i]-x[i-1] over an ascending int array (K1)."""
    a = np.ascontiguousarray(sorted_ids, dtype=np.uint64)
    if a.size == 0:
        return a
    out = np.empty_like(a)
    out[0] = a[0]
    np.subtract(a[1:], a[:-1], out=out[1:])
    return out


def delta_decode(deltas) -> np.ndarray:
    a = np.ascontiguousarray(deltas, dtype=np.uint64)
    return np.cumsum(a, dtype=np.uint64)
