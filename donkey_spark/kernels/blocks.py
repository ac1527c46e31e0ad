"""K4/K5 kernels: posting-block build/decode with skip + block-max metadata.

A posting list for one ``(term, salt)`` doc-range group is cut into blocks of
``BLOCK_SIZE`` docs. Per block we persist (SURVEY §1.2 `segments` schema):

  first_doc_id / max_doc_id   — the skip pointer (binary-searchable, and
                                doubling as parquet min/max pruning stats)
  n_docs, max_tf, sum_tf      — dictionary inputs (df/cf aggregate from these)
  block_max_tfpart            — exact per-block max of the BM25 tf-part
                                (dl-aware); block_max_score = idf * this,
                                applied at query time once global df is known
  docids_blob                 — delta(K1) + varint(K2) or PForDelta(K3)
  tfs_blob / dls_blob         — varint / PForDelta

Doc lengths are stored per posting (dls_blob) so query-time BM25 needs ONLY
the pruned segment blocks — no doc-length side table is shuffled or cogrouped
per query (at 10^12 docs that table alone would be TB-scale per query batch).
Cost: ~1 varint byte per posting, shared-dictionary-compressed by parquet.

Storing the *tf-part* max instead of a score max means the build kernel never
needs global df — no dictionary join inside the big shuffle (SURVEY §3.2
stage B stays a single exchange).

``encode_groups`` is the hot path: it encodes EVERY (term, salt) group inside
a sorted partition slice in one vectorized pass (group/block boundaries via
flatnonzero, per-block metadata via ufunc.reduceat, one varint pass for the
whole slice with per-block byte offsets by cumsum). Per-block Python work is
three byte-slices — this is what lets the build avoid per-group
applyInPandas overhead (~2 ms/group, fatal at 10^9 groups).
"""

from __future__ import annotations

import numpy as np

from ..config import BLOCK_SIZE
from .pfor import pfor_decode, pfor_encode
from .varint import varint_decode, varint_encode, varint_lengths
from .bm25 import tf_part

CODECS = ("varint", "pfor")


def _decode(blob: bytes, codec: str) -> np.ndarray:
    if codec == "varint":
        return varint_decode(blob)
    if codec == "pfor":
        return pfor_decode(blob)
    raise ValueError(f"unknown codec {codec!r}")


def _encode_column(vals: np.ndarray, bstart: np.ndarray, bend: np.ndarray,
                   codec: str) -> list[bytes]:
    """Encode one uint64 column into per-block blobs (one pass for varint)."""
    if codec == "varint":
        lens = varint_lengths(vals)
        body = memoryview(varint_encode(vals, nbytes=lens))
        ends = np.cumsum(lens)
        starts = ends - lens
        return [bytes(body[starts[s]:ends[e - 1]])
                for s, e in zip(bstart.tolist(), bend.tolist())]
    if codec == "pfor":
        return [pfor_encode(vals[s:e])
                for s, e in zip(bstart.tolist(), bend.tolist())]
    raise ValueError(f"unknown codec {codec!r}")


def encode_column_pa(vals: np.ndarray, bstart: np.ndarray,
                     bend: np.ndarray, codec: str = "varint"):
    """Arrow-native twin of _encode_column: the per-block blob column is
    built ZERO-COPY from the single encoded stream + a block-offset
    vector (pa.BinaryArray.from_buffers) — no per-block Python bytes
    objects. Requires contiguous tiling blocks (bstart/bend cover the
    array in order), which every build-kernel caller satisfies."""
    import pyarrow as pa
    if codec != "varint" or bstart.size == 0:
        return pa.array(_encode_column(vals, bstart, bend, codec),
                        pa.binary())
    lens = varint_lengths(vals)
    body = varint_encode(vals, nbytes=lens)
    ends = np.cumsum(lens)
    if bstart[0] != 0 or int(ends[-1]) > 0x7FFFFFF0:
        return pa.array(_encode_column(vals, bstart, bend, codec),
                        pa.binary())
    offsets = np.empty(bstart.size + 1, dtype=np.int32)
    offsets[0] = 0
    offsets[1:] = ends[bend - 1]
    return pa.Array.from_buffers(
        pa.binary(), bstart.size,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(body)])


def encode_groups_core(new_group: np.ndarray, ids: np.ndarray,
                       tfs: np.ndarray, dls: np.ndarray, avgdl: float,
                       block_size: int = BLOCK_SIZE,
                       codec: str = "varint",
                       pa_blobs: bool = False) -> tuple[np.ndarray, dict]:
    """Vectorized block build over a slice sorted by (group, doc_id).

    new_group[i] marks the first row of each (term, salt) group. Returns
    (bstart row indices — callers gather their own group-key columns with
    them, e.g. an Arrow take — and the block metadata/blob columns).
    pa_blobs=True emits the three blob columns as zero-copy
    pa.BinaryArrays (Arrow callers skip per-block bytes objects).
    """
    n = ids.size
    ids = np.ascontiguousarray(ids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    dls = np.ascontiguousarray(dls, dtype=np.int64)
    bad = (~new_group[1:]) & (ids[1:] <= ids[:-1])
    if bad.any():
        raise ValueError("doc_ids must be strictly ascending within a group")
    gstart = np.flatnonzero(new_group)
    gid = np.cumsum(new_group) - 1
    rank = np.arange(n, dtype=np.int64) - gstart[gid]
    new_block = (rank % block_size) == 0
    bstart = np.flatnonzero(new_block)
    bend = np.append(bstart[1:], n)

    ids_u = ids.astype(np.uint64)
    delta = ids_u.copy()
    delta[1:] = ids_u[1:] - ids_u[:-1]
    delta[bstart] = ids_u[bstart]          # per-block restart, absolute first

    parts = tf_part(tfs, dls, avgdl)
    enc = encode_column_pa if pa_blobs else _encode_column
    return bstart, {
        "block_id": (rank[bstart] // block_size).astype(np.int32),
        "first_doc_id": ids[bstart],
        "max_doc_id": ids[bend - 1],
        "n_docs": (bend - bstart).astype(np.int32),
        "max_tf": np.maximum.reduceat(tfs, bstart).astype(np.int32),
        "sum_tf": np.add.reduceat(tfs, bstart).astype(np.int64),
        "block_max_tfpart": np.maximum.reduceat(parts, bstart),
        "docids_blob": enc(delta, bstart, bend, codec),
        "tfs_blob": enc(tfs.astype(np.uint64), bstart, bend, codec),
        "dls_blob": enc(dls.astype(np.uint64), bstart, bend, codec),
    }


def encode_groups(terms: np.ndarray, salts: np.ndarray, ids: np.ndarray,
                  tfs: np.ndarray, dls: np.ndarray, avgdl: float,
                  block_size: int = BLOCK_SIZE, codec: str = "varint") -> dict:
    """encode_groups_core with numpy group keys (tests / pandas callers)."""
    n = ids.size
    if n == 0:
        return {}
    new_group = np.empty(n, dtype=bool)
    new_group[0] = True
    new_group[1:] = (terms[1:] != terms[:-1]) | (salts[1:] != salts[:-1])
    bstart, cols = encode_groups_core(new_group, ids, tfs, dls, avgdl,
                                      block_size, codec)
    cols["term"] = terms[bstart]
    cols["salt"] = salts[bstart]
    return cols


def build_blocks(doc_ids, tfs, dls, avgdl: float,
                 block_size: int = BLOCK_SIZE, codec: str = "varint"):
    """Single-group convenience wrapper over encode_groups (kernel tests,
    oracle paths). Yields dict rows."""
    ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    n = ids.size
    if n == 0:
        return
    cols = encode_groups(np.zeros(n, dtype=np.int8), np.zeros(n, dtype=np.int8),
                         ids, np.asarray(tfs), np.asarray(dls), avgdl,
                         block_size, codec)
    names = ["block_id", "first_doc_id", "max_doc_id", "n_docs", "max_tf",
             "sum_tf", "block_max_tfpart", "docids_blob", "tfs_blob",
             "dls_blob"]
    for i in range(len(cols["block_id"])):
        yield {k: (cols[k][i].item() if hasattr(cols[k][i], "item")
                   else cols[k][i]) for k in names}


def decode_doc_ids(blob: bytes, codec: str = "varint") -> np.ndarray:
    """blob -> absolute ascending doc_ids (int64)."""
    return np.cumsum(_decode(blob, codec), dtype=np.uint64).astype(np.int64)


def decode_term_blocks(blocks: list[dict], codec: str = "varint"):
    """Batch-decode SAME-TERM blocks (disjoint ascending doc ranges).

    varint: ONE decode pass over each concatenated blob stream — varint is
    self-delimiting, so concatenation decodes in order and per-block
    Python overhead amortizes ~block_size×; the per-block delta restarts
    (first value absolute) are undone with a segmented cumsum. pfor blobs
    are framed per block, so they fall back to per-block decode.
    Returns (ids_abs int64, tfs int64, dls int64)."""
    if len(blocks) == 1:
        b = blocks[0]
        return (decode_doc_ids(b["docids_blob"], codec),
                decode_tfs(b["tfs_blob"], codec),
                decode_tfs(b["dls_blob"], codec))
    if codec != "varint":
        return (np.concatenate([decode_doc_ids(b["docids_blob"], codec)
                                for b in blocks]),
                np.concatenate([decode_tfs(b["tfs_blob"], codec)
                                for b in blocks]),
                np.concatenate([decode_tfs(b["dls_blob"], codec)
                                for b in blocks]))
    n = np.array([int(b["n_docs"]) for b in blocks], dtype=np.int64)
    deltas = varint_decode(b"".join(bytes(b["docids_blob"])
                                    for b in blocks))
    c = np.cumsum(deltas, dtype=np.uint64)
    bstart = np.concatenate(([0], np.cumsum(n)[:-1]))
    corr = c[bstart] - deltas[bstart]
    ids = (c - np.repeat(corr, n)).astype(np.int64)
    tfs = varint_decode(b"".join(bytes(b["tfs_blob"])
                                 for b in blocks)).astype(np.int64)
    dls = varint_decode(b"".join(bytes(b["dls_blob"])
                                 for b in blocks)).astype(np.int64)
    return ids, tfs, dls


def decode_tfs(blob: bytes, codec: str = "varint") -> np.ndarray:
    """Decode a tf / dl varint-or-pfor payload to int64."""
    return _decode(blob, codec).astype(np.int64)


def decode_blocks_arrays(blocks: list[dict], codec: str = "varint"):
    """Whole-set vectorized decode of an ARBITRARY block list (terms may
    mix — every block restarts its delta with an absolute first value, so
    the segmented-cumsum correction makes each segment independent).

    Returns (ids int64, tfs int64, dls int64, bounds int64) where
    ``bounds[i]:bounds[i+1]`` slices block i's postings. This is the batch
    query path's decode: ONE varint pass per column for a salt group's
    (or a whole local scan's) blocks, instead of one per (query, term)."""
    n = np.array([int(b["n_docs"]) for b in blocks], dtype=np.int64)
    bounds = np.concatenate(([0], np.cumsum(n)))
    if codec != "varint":
        return (np.concatenate([decode_doc_ids(b["docids_blob"], codec)
                                for b in blocks]),
                np.concatenate([decode_tfs(b["tfs_blob"], codec)
                                for b in blocks]),
                np.concatenate([decode_tfs(b["dls_blob"], codec)
                                for b in blocks]),
                bounds)
    deltas = varint_decode(b"".join(bytes(b["docids_blob"])
                                    for b in blocks))
    c = np.cumsum(deltas, dtype=np.uint64)
    bstart = bounds[:-1]
    corr = c[bstart] - deltas[bstart]
    ids = (c - np.repeat(corr, n)).astype(np.int64)
    tfs = varint_decode(b"".join(bytes(b["tfs_blob"])
                                 for b in blocks)).astype(np.int64)
    dls = varint_decode(b"".join(bytes(b["dls_blob"])
                                 for b in blocks)).astype(np.int64)
    return ids, tfs, dls, bounds
