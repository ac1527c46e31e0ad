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
  tfs_blob                    — varint / PForDelta

Storing the *tf-part* max instead of a score max means the build kernel never
needs global df — no dictionary join inside the big shuffle (SURVEY §3.2
stage B stays a single exchange).
"""

from __future__ import annotations

import numpy as np

from ..config import BLOCK_SIZE
from .pfor import pfor_decode, pfor_encode
from .varint import delta_encode, varint_decode, varint_encode
from .bm25 import tf_part

CODECS = ("varint", "pfor")


def _encode(vals: np.ndarray, codec: str) -> bytes:
    if codec == "varint":
        return varint_encode(vals)
    if codec == "pfor":
        return pfor_encode(vals)
    raise ValueError(f"unknown codec {codec!r}")


def _decode(blob: bytes, codec: str) -> np.ndarray:
    if codec == "varint":
        return varint_decode(blob)
    if codec == "pfor":
        return pfor_decode(blob)
    raise ValueError(f"unknown codec {codec!r}")


def build_blocks(doc_ids, tfs, dls, avgdl: float,
                 block_size: int = BLOCK_SIZE, codec: str = "varint"):
    """Cut one sorted posting group into compressed block rows.

    doc_ids must be ascending and unique (one row per (doc, term)); tfs/dls
    are aligned. Yields dict rows ready for the `segments` table.
    """
    ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    tf = np.ascontiguousarray(tfs, dtype=np.int64)
    dl = np.ascontiguousarray(dls, dtype=np.int64)
    n = ids.size
    if n == 0:
        return
    if n > 1 and not bool(np.all(ids[1:] > ids[:-1])):
        raise ValueError("doc_ids must be strictly ascending")
    parts = tf_part(tf, dl, avgdl)
    for b, start in enumerate(range(0, n, block_size)):
        end = min(start + block_size, n)
        bids, btf = ids[start:end], tf[start:end]
        yield {
            "block_id": b,
            "first_doc_id": int(bids[0]),
            "max_doc_id": int(bids[-1]),
            "n_docs": int(end - start),
            "max_tf": int(btf.max()),
            "sum_tf": int(btf.sum()),
            "block_max_tfpart": float(parts[start:end].max()),
            "docids_blob": _encode(delta_encode(bids.astype(np.uint64)), codec),
            "tfs_blob": _encode(btf.astype(np.uint64), codec),
        }


def decode_doc_ids(blob: bytes, codec: str = "varint") -> np.ndarray:
    """blob -> absolute ascending doc_ids (int64)."""
    return np.cumsum(_decode(blob, codec), dtype=np.uint64).astype(np.int64)


def decode_tfs(blob: bytes, codec: str = "varint") -> np.ndarray:
    return _decode(blob, codec).astype(np.int64)
