"""Vectorized extractor kernel: Arrow string batch -> (terms, tfs, dl).

The build's largest phase is the extractor (tokenize + per-doc tf). The
reference semantics are `tokenize_py` + `Counter` (functions/tokenize.py,
FIXTURES.md §T: NFC -> lower -> [a-z0-9_]{2,64} runs -> cap). This kernel
computes the identical result with zero per-token Python on the hot path:

* the batch's UTF-8 data buffer is scanned as ONE numpy uint8 array: a
  256-byte LUT marks token bytes (A–Z included — they lower to token
  bytes, so boundaries are case-blind), token runs fall out of ONE
  adjacent-compare toggle sweep, and document boundaries split runs via
  O(docs) vectorized inserts (r5 — previously two full shifted masks);
* every run is packed with ONE boolean compress, lowering is applied to
  those token bytes ONLY (r5 — the full-buffer lower gather is gone),
  and invalid runs (len < 2, len > 64, beyond the per-doc cap) are
  dropped at the TOKEN level by a single Arrow C++ `filter` (r5 — the
  byte-level delta+cumsum keep-mask erase is gone). Net traffic ~12×
  input bytes, was ~20×;
* the packed bytes + offsets become a pyarrow StringArray zero-copy;
  `pc.dictionary_encode` (C++ hash) replaces per-doc Counter, and tf
  falls out of a run-length pass over ONE sorted (doc << 32 | code) key;
* per-doc term/tf lists are assembled as Arrow ListArrays from offsets —
  no per-doc Python objects anywhere; non-escaping work arrays come
  from a grow-only per-thread scratch pool (page-fault churn, not
  compute, dominated rep variance on the measurement host).

Byte-level run scanning is EXACT for ASCII documents (NFC is the identity
and `str.lower` == byte-lower there). Documents containing any non-ASCII
byte take the reference Python path (`tokenize_py` + Counter) and are
spliced back in — NFC composition can move token boundaries, so only the
reference tokenizer may touch them. Source-code corpora are overwhelmingly
ASCII, so the splice is rare by construction.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import MAX_TOKENS_PER_DOC

_LOWER = np.arange(256, dtype=np.uint8)
_LOWER[ord("A"):ord("Z") + 1] += 32
# token-byte class on the RAW (pre-lower) buffer: A-Z lower to a-z, both
# token bytes, so run boundaries are identical — lowering can then be
# DEFERRED to the kept bytes only (r5 pass fusion: the full-buffer lower
# gather was ~2N of pure traffic for bytes mostly thrown away)
_TOKBYTE = np.zeros(256, dtype=bool)
for _ch in b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_":
    _TOKBYTE[_ch] = True

_EMPTY_I32 = np.zeros(1, dtype=np.int32)


class _Scratch:
    """Grow-only PER-THREAD buffer pool for the kernel's NON-ESCAPING
    work arrays. Fresh ~100s-of-MB allocations per batch cost this host
    far more in page faults / THP churn than the compute (measured: the
    same batch swings 3.1s → 16.7s rep to rep); a long-lived Spark python
    worker reuses the same pages instead. Buffers are thread-local so
    concurrent extract calls in one process (driver-side harnesses)
    cannot alias each other's views (r5 review); Spark python workers
    are single-threaded, so they still see exactly one pool. Only
    buffers that provably do not outlive the call may come from here —
    anything wrapped zero-copy into a RETURNED Arrow array (loff, tfs,
    dl) must stay fresh."""

    def __init__(self):
        import threading
        self._tls = threading.local()

    def get(self, name: str, size: int, dtype) -> np.ndarray:
        bufs = getattr(self._tls, "bufs", None)
        if bufs is None:
            bufs = self._tls.bufs = {}
        key = (name, np.dtype(dtype))
        b = bufs.get(key)
        if b is None or b.size < size:
            b = np.empty(int(size * 1.25) + 16, dtype=dtype)
            bufs[key] = b
        return b[:size]


_SCRATCH = _Scratch()


def _ascii_doc_features(content: pa.Array, cap: int):
    """(terms ListArray, tfs ListArray, dl int32 ndarray) for a batch whose
    every document is ASCII (caller guarantees; nulls already filled)."""
    n = len(content)
    obuf = np.frombuffer(content.buffers()[1], dtype=np.int32)
    off = obuf[content.offset:content.offset + n + 1].astype(np.int64)
    data = np.frombuffer(content.buffers()[2], dtype=np.uint8)
    if off[-1] == off[0] or data.size == 0:
        loff = pa.array(np.zeros(n + 1, dtype=np.int32))
        return (pa.ListArray.from_arrays(loff, pa.array([], pa.utf8())),
                pa.ListArray.from_arrays(loff, pa.array([], pa.int32())),
                np.zeros(n, dtype=np.int32))
    # a sliced array's data buffer may extend beyond this batch; scan only
    # [off[0], off[-1]) and rebase offsets
    base_off = int(off[0])
    buf = data[base_off:int(off[-1])]        # view, no copy
    off = off - base_off
    N = buf.size
    al = _SCRATCH.get("al", N, bool)
    np.take(_TOKBYTE, buf, out=al)
    # token runs from ONE adjacent-compare sweep (r5: replaces the two
    # full-size shifted prev/nxt masks, ~4N of traffic): toggle positions
    # of the al mask alternate run starts/ends
    cmp = _SCRATCH.get("cmp", max(N - 1, 1), bool)[:N - 1]
    np.not_equal(al[1:], al[:-1], out=cmp)
    bnd = np.flatnonzero(cmp) + 1
    if al[0]:
        starts = np.concatenate((np.zeros(1, dtype=np.int64), bnd[1::2]))
        ends = bnd[0::2]
    else:
        starts = bnd[0::2]
        ends = bnd[1::2]
    if starts.size > ends.size:              # final run extends to N
        ends = np.concatenate((ends, np.array([N], dtype=np.int64)))
    # force run breaks at document boundaries: an internal doc start
    # falling strictly inside a run splits it there (both the end of the
    # previous doc's run and the start of the next doc's) — O(docs)
    # work instead of two more full-buffer scatter masks
    ds_in = off[1:-1]
    if ds_in.size and starts.size:
        j = np.searchsorted(starts, ds_in, side="right") - 1
        inside = (j >= 0) & (ds_in > starts[np.maximum(j, 0)]) \
            & (ds_in < ends[np.maximum(j, 0)])
        if inside.any():
            splits = np.unique(ds_in[inside])
            starts = np.insert(starts, np.searchsorted(starts, splits),
                               splits)
            ends = np.insert(ends, np.searchsorted(ends, splits), splits)
    lens = ends - starts
    doc = np.searchsorted(off, starts, side="right") - 1
    valid = (lens >= 2) & (lens <= 64)
    dl = np.bincount(doc[valid], minlength=n)
    if dl.max(initial=0) > cap:              # §T.3 cap — rare path
        cs = np.cumsum(valid)                # runs are in doc order
        first = np.searchsorted(doc, np.arange(n), side="left")
        seg0 = np.zeros(n, dtype=np.int64)
        m = first < doc.size
        seg0[m] = cs[first[m]] - valid[first[m]]
        rank = cs - seg0[doc]                # 1-based valid-rank within doc
        valid &= rank <= cap
        dl = np.bincount(doc[valid], minlength=n)
    # pack EVERY token run (boolean compress of the buffer + deferred
    # lower on the ~token-sized result), then drop invalid runs at the
    # TOKEN level with one Arrow C++ filter — r5 fusion: the r4 byte-keep
    # erase (int32 delta + cumsum + and over the full buffer, ~6-8N of
    # traffic) is replaced by a pass over token bytes only
    toff = _SCRATCH.get("toff", lens.size + 1, np.int32)
    toff[0] = 0
    np.cumsum(lens, out=toff[1:])
    K = int(toff[-1])
    raw = _SCRATCH.get("rawtok", K, np.uint8)
    np.compress(al, buf, out=raw)
    packed = _SCRATCH.get("packed", K, np.uint8)
    np.take(_LOWER, raw, out=packed)
    # py_buffer over the ndarrays is ZERO-copy (buffer protocol; Arrow
    # holds a reference to the numpy base) — .tobytes() here would add
    # two gratuitous full-buffer passes to a bandwidth-bound kernel.
    # tok_arr aliases scratch but is CONSUMED in-call (filter /
    # dictionary_encode copy into fresh buffers), so reuse is safe —
    # tests/test_exttok.py asserts cross-batch non-aliasing.
    tok_arr = pa.Array.from_buffers(
        pa.utf8(), lens.size,
        [None, pa.py_buffer(toff), pa.py_buffer(packed)])
    if not valid.all():
        tok_arr = tok_arr.filter(pa.array(valid))
    enc = pc.dictionary_encode(tok_arr)
    codes = enc.indices.to_numpy()
    uniq = enc.dictionary
    tot = len(tok_arr)
    kd = _SCRATCH.get("kd", tot, np.int64)
    np.compress(valid, doc, out=kd)
    key = _SCRATCH.get("key", tot, np.int64)
    np.left_shift(kd, 32, out=key)
    np.bitwise_or(key, codes, out=key)
    key.sort()
    if tot:
        new = _SCRATCH.get("new", tot, bool)
        new[0] = True
        np.not_equal(key[1:], key[:-1], out=new[1:])
        rs = np.flatnonzero(new)
        tfs = np.diff(np.append(rs, tot)).astype(np.int32)
        kk = key[rs]
        udoc = (kk >> np.int64(32))
        term_vals = uniq.take(pa.array(kk & np.int64(0xFFFFFFFF)))
    else:
        tfs = np.empty(0, dtype=np.int32)
        udoc = np.empty(0, dtype=np.int64)
        term_vals = pa.array([], pa.utf8())
    loff = np.empty(n + 1, dtype=np.int32)
    loff[0] = 0
    np.cumsum(np.bincount(udoc, minlength=n), out=loff[1:])
    return (pa.ListArray.from_arrays(pa.array(loff), term_vals),
            pa.ListArray.from_arrays(pa.array(loff), pa.array(tfs)),
            dl.astype(np.int32))


def _py_doc_features(text: str | None, cap: int):
    """Reference path for one (non-ASCII) document. The caller's cap must
    bind EXACTLY here (smaller or larger than the module default) or the
    splice path diverges from the ASCII path's semantics — so tokenize
    inline rather than through tokenize_py, whose internal cap would
    clamp a larger caller cap."""
    import unicodedata
    from ..functions.tokenize import _RE_LEN
    toks = (_RE_LEN.findall(unicodedata.normalize("NFC", text).lower())[:cap]
            if text else [])
    c = Counter(toks)
    return list(c.keys()), list(c.values()), sum(c.values())


def _splice_rows(bulk: pa.Array, patches: dict[int, list]) -> pa.Array:
    """Replace the rows at ``patches``' indices in a ListArray: Arrow
    slice + concat around each patched row — O(#patches) Python, one
    buffer copy, never a to_pylist() round-trip of the whole batch."""
    parts = []
    prev = 0
    for i in sorted(patches):
        if i > prev:
            parts.append(bulk.slice(prev, i - prev))
        parts.append(pa.array([patches[i]], bulk.type))
        prev = i + 1
    if prev < len(bulk):
        parts.append(bulk.slice(prev, len(bulk) - prev))
    return pa.concat_arrays(parts)


def extract_doc_features(content: pa.Array, cap: int = MAX_TOKENS_PER_DOC):
    """(terms ListArray, tfs ListArray, dl int32 ndarray) for an Arrow
    string batch — exact §T semantics (tokenize_py + Counter per doc)."""
    content = content.combine_chunks() if isinstance(
        content, pa.ChunkedArray) else content
    if pa.types.is_large_string(content.type):
        # the byte kernel reads int32 offsets; large_utf8 (int64 offsets)
        # would be silently misread — downcast (Arrow raises if any batch
        # actually exceeds 2 GiB, which mapInArrow batches never do)
        content = content.cast(pa.utf8())
    elif not pa.types.is_string(content.type):
        raise TypeError(f"expected a utf8 array, got {content.type}")
    if content.null_count:
        content = pc.fill_null(content, "")
    is_ascii = pc.string_is_ascii(content)
    exotic = (np.flatnonzero(~is_ascii.to_numpy(zero_copy_only=False))
              if not pc.all(is_ascii).as_py() else np.empty(0, np.int64))
    bulk = content
    if exotic.size:
        # blank the exotic docs for the bulk pass; splice reference results
        bulk = pc.if_else(is_ascii, content, "")
    terms, tfs, dl = _ascii_doc_features(bulk, cap)
    if not exotic.size:
        return terms, tfs, dl
    # splice per exotic doc (rare by construction): Arrow slice+concat
    # around the patched rows — cost O(exotic), not O(batch)
    t_patch: dict[int, list] = {}
    f_patch: dict[int, list] = {}
    for i in exotic.tolist():
        tl, fl, d = _py_doc_features(content[i].as_py(), cap)
        t_patch[i], f_patch[i] = tl, fl
        dl[i] = d
    return (_splice_rows(terms, t_patch), _splice_rows(tfs, f_patch), dl)
