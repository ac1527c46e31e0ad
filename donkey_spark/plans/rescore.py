"""Rescore window — re-rank the top-``window`` primary candidates by
a combined relevance + field-factor score (the ES ``rescore`` clause
crossed with ``function_score.field_value_factor``): "fetch the 100
most relevant docs, then order the page by 0.8·relevance +
0.2·recency". Every production search stack ends up with this shape —
BM25 proposes, a cheap document prior (stars, freshness, quality
score) disposes — and the window keeps the expensive part bounded.

Semantics (exact BY DEFINITION of the window):

* primary pass = the ordinary ranked search (modes, filters,
  min_match, tombstones — the full search_rows surface) truncated at
  ``window`` docs per query (score desc, doc_id asc ties);
* every windowed doc's final score =
  ``query_weight · bm25 + field_weight · column`` (NULL column → the
  doc keeps only its weighted bm25 term, never NaN);
* top-k of the window by (final desc, doc_id asc). Docs outside the
  window never rank — that is the contract, not an approximation
  (ES documents the same: rescore only sees the window).

Scale shape: the primary pass is the ordinary pruned top-k machinery
with k=window (so its cost is the serving path's, bounded by window,
NOT match-set-sized like collapse); the field fetch is one
pushed-down read of ≤ Σ window ids (pyarrow locally, an id-filtered
docs join distributed); the combine and re-rank are O(Σ window)
driver arithmetic. Nothing scales with the corpus beyond the primary
search itself.
"""

from __future__ import annotations

import numpy as np


def _doc_values(index, ids: list[int], by: str, use_local: bool) -> dict:
    """doc_id -> column value for a BOUNDED id set (≤ Σ window)."""
    if use_local:
        import pyarrow.dataset as ds
        t = index._pa_dataset("docs").to_table(
            columns=["doc_id", by],
            filter=ds.field("doc_id").isin(ids))
        return dict(zip(t["doc_id"].to_pylist(), t[by].to_pylist()))
    from pyspark.sql import functions as F
    return {r["doc_id"]: r[by] for r in
            index._docs.where(F.col("doc_id").isin(ids))
            .select("doc_id", by).collect()}


def rescore_rows(index, queries: list[tuple[int, str, int]],
                 window: int = 100, by: str = "dl",
                 query_weight: float = 1.0, field_weight: float = 1.0,
                 mode: str = "or", filters: dict | None = None,
                 min_match: int | dict | None = None) -> list[tuple]:
    """queries: [(query_id, text, k)] -> [(query_id, rank, doc_id,
    score, base_score, repo, path)] sorted by (query_id, rank) —
    ``score`` the combined rescored value, ``base_score`` the primary
    BM25 the window was cut on. ``by`` must be a NUMERIC docs
    metadata column; k must not exceed ``window``."""
    from .facet_counts import _require_numeric_column
    _require_numeric_column(index, by, "rescore_rows")
    if window < 1:
        raise ValueError("rescore_rows: window must be >= 1")
    bad = [(qid, k) for qid, _, k in queries if k > window]
    if bad:
        raise ValueError(f"rescore_rows: k exceeds the rescore window "
                         f"{window} for queries {bad} — docs outside "
                         f"the window can never rank")
    primary = index.search_rows(
        [(qid, text, window) for qid, text, _ in queries],
        mode=mode, filters=filters, min_match=min_match)
    if not primary:
        return []
    ids = sorted({r[2] for r in primary})
    vals = _doc_values(index, ids, by,
                       use_local=index.local_bytes > 0)
    ks = {qid: k for qid, _, k in queries}
    by_q: dict[int, list] = {}
    for qid, _rk, did, sc, repo, path in primary:
        v = vals.get(did)
        final = query_weight * sc + (field_weight * float(v)
                                     if v is not None else 0.0)
        by_q.setdefault(qid, []).append((final, sc, did, repo, path))
    out = []
    for qid in sorted(by_q):
        rows = sorted(by_q[qid], key=lambda r: (-r[0], r[2]))[:ks[qid]]
        out.extend((qid, rk, did, final, sc, repo, path)
                   for rk, (final, sc, did, repo, path)
                   in enumerate(rows, start=1))
    return out
