"""K6 kernel: BM25 scoring (Robertson & Zaragoza 2009; SURVEY §2.8 K6).

One formula, one dtype (float64), shared constants from config — the same
expression is re-stated in Spark SQL / DuckDB SQL for the ◇ oracle queries,
which is what makes rank-identity checkable end-to-end.

    idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
    tfpart   = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    score(d) = Σ_t idf(t) * tfpart(tf_td, dl_d)
"""

from __future__ import annotations

import numpy as np

from ..config import BM25_B, BM25_K1


def idf(n_docs: float, df) -> np.ndarray:
    df = np.asarray(df, dtype=np.float64)
    return np.log1p((n_docs - df + 0.5) / (df + 0.5))


def tf_part(tfs, dls, avgdl: float,
            k1: float = BM25_K1, b: float = BM25_B) -> np.ndarray:
    tfs = np.asarray(tfs, dtype=np.float64)
    dls = np.asarray(dls, dtype=np.float64)
    return tfs * (k1 + 1.0) / (tfs + k1 * (1.0 - b + b * dls / avgdl))


def brute_force_topk(query_terms, postings, dls, n_docs, avgdl, k):
    """Transparent reference scorer for kernel tests.

    postings: dict term -> (doc_ids ndarray, tfs ndarray). Returns
    (doc_ids, scores) sorted by (score desc, doc_id asc), length ≤ k.
    """
    acc: dict[int, float] = {}
    for t in query_terms:
        if t not in postings:
            continue
        ids, tfs = postings[t]
        w = idf(n_docs, len(ids))
        parts = tf_part(tfs, dls[ids], avgdl)
        for d, s in zip(ids.tolist(), (w * parts).tolist()):
            acc[d] = acc.get(d, 0.0) + s
    ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    out_ids = np.array([d for d, _ in ranked], dtype=np.int64)
    out_sc = np.array([s for _, s in ranked], dtype=np.float64)
    return out_ids, out_sc
