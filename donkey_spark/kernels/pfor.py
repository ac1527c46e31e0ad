"""K3 kernel: PForDelta-style block compression (SURVEY §2.8 K3).

NewPFD flavour: for a block of ints, pick bit width ``b`` covering the 90th
percentile, bit-pack the low ``b`` bits of every value (vectorized via
np.packbits little-endian), and patch exceptions (values needing more than
``b`` bits) as two varint streams: delta-coded positions + high bits.

Layout:  [b:u8][n:u16le][n_exc:u16le][packed low bits][exc pos varint][exc hi varint]
"""

from __future__ import annotations

import numpy as np

from .varint import varint_decode, varint_encode

_HDR = np.dtype([("b", "u1"), ("n", "<u2"), ("n_exc", "<u2")])


def _bit_width(v: np.ndarray) -> np.ndarray:
    """bits needed per value (0 for value 0)."""
    w = np.zeros(v.shape, dtype=np.int64)
    x = v.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = x >= (np.uint64(1) << np.uint64(shift))
        w[m] += shift
        x[m] >>= np.uint64(shift)
    w[v > 0] += 1
    return w


def pfor_encode(values, pct: float = 90.0) -> bytes:
    a = np.ascontiguousarray(values, dtype=np.uint64)
    n = a.size
    if n > 0xFFFF:
        raise ValueError(
            f"pfor block of {n} values exceeds the u16 header limit (65535); "
            f"use block_size <= 65535 with codec='pfor'")
    if n == 0:
        return np.zeros(1, dtype=_HDR).tobytes()
    widths = _bit_width(a)
    b = int(np.percentile(widths, pct, method="lower"))
    b = max(b, 1)
    exc_mask = widths > b
    exc_pos = np.flatnonzero(exc_mask)
    mask = (np.uint64(0xFFFFFFFFFFFFFFFF) if b >= 64
            else (np.uint64(1) << np.uint64(b)) - np.uint64(1))
    low = a & mask
    # bit-pack low b bits, little-endian within each value
    shifts = np.arange(b, dtype=np.uint64)
    bits = ((low[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
    packed = np.packbits(bits.ravel(), bitorder="little")
    hdr = np.zeros(1, dtype=_HDR)
    hdr["b"], hdr["n"], hdr["n_exc"] = b, n, exc_pos.size
    pos_blob = varint_encode(np.diff(exc_pos, prepend=0)) if exc_pos.size else b""
    hi_blob = (varint_encode(a[exc_pos] >> np.uint64(b)) if exc_pos.size else b"")
    return hdr.tobytes() + packed.tobytes() + _frame(pos_blob) + _frame(hi_blob)


def _frame(blob: bytes) -> bytes:
    return np.uint32(len(blob)).tobytes() + blob


def pfor_decode(buf: bytes) -> np.ndarray:
    raw = memoryview(buf)
    hdr = np.frombuffer(raw[: _HDR.itemsize], dtype=_HDR)[0]
    b, n, n_exc = int(hdr["b"]), int(hdr["n"]), int(hdr["n_exc"])
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    nbits = n * b
    npacked = (nbits + 7) // 8
    off = _HDR.itemsize
    packed = np.frombuffer(raw[off : off + npacked], dtype=np.uint8)
    off += npacked
    bits = np.unpackbits(packed, bitorder="little")[:nbits].reshape(n, b)
    shifts = np.arange(b, dtype=np.uint64)
    vals = np.bitwise_or.reduce(
        bits.astype(np.uint64) << shifts[None, :], axis=1)
    if n_exc:
        ln = int(np.frombuffer(raw[off : off + 4], dtype=np.uint32)[0]); off += 4
        pos = np.cumsum(varint_decode(raw[off : off + ln])).astype(np.int64)
        off += ln
        ln = int(np.frombuffer(raw[off : off + 4], dtype=np.uint32)[0]); off += 4
        hi = varint_decode(raw[off : off + ln])
        vals[pos] |= hi << np.uint64(b)
    return vals
