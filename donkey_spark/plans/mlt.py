"""More-like-this queries — document-seeded retrieval.

The Lucene ``MoreLikeThis`` shape every fulltext engine grows: given a
seed document's text, pick its most *discriminative* terms and run them
as an OR query. Term selection is tf·idf over the REAL index statistics:

    sel(t) = tf_seed(t) · ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))

(the engine's own BM25 idf — ``kernels/bm25.idf``), top ``max_terms``
by (score desc, term asc). df comes from the index dictionary via the
same partition-pruned probe queries use (``Index._lookup_terms``:
bucket-dir + term row-group pruning, memoized), so seeding costs one
bounded dictionary probe — never a corpus scan — and the retrieval
itself is the ordinary block-max scorer. Terms absent from the index
(df = 0) can match nothing and are dropped before selection.

The selection score is rounded to 9 decimals before ranking: python
``log1p`` and a SQL ``ln(1+x)`` can differ in the last ulp, and an
unrounded comparison could flip the order of two nearly-tied terms —
the same determinism trick the IVF centroids use.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.tokenize import tokenize_py
from ..kernels.bm25 import idf

SELECT_ROUND = 9             # decimals kept on the term-selection score


def mlt_terms(index, text: str, max_terms: int = 8) -> list[str]:
    """The seed's ``max_terms`` highest-tf·idf terms (df > 0), in
    selection order."""
    tf = Counter(tokenize_py(text))
    if not tf:
        return []
    dfs = index._lookup_terms(sorted(tf))
    scored = []
    for t, c in tf.items():
        df = dfs.get(t)
        if not df:
            continue
        # THE scorer's idf (kernels/bm25.idf) — not a re-spelled formula
        # that could drift from it (r5 review)
        sel = round(c * float(idf(index.n_docs, df)), SELECT_ROUND)
        scored.append((-sel, t))
    scored.sort()
    return [t for _, t in scored[:max_terms]]


def more_like_this(index, text: str, k: int = 10, max_terms: int = 8,
                   exclude_doc_id: int | None = None, mode: str = "or",
                   filters: dict | None = None) -> DataFrame:
    """Top-k documents most similar to the seed ``text``:
    ``(rank, doc_id, score)``, score = the BM25 of the selected term
    set, ranked on the rounded score (doc_id asc ties). Pass the seed's
    own (dense) doc id as ``exclude_doc_id`` to drop it from the
    results (it is otherwise its own best match); ``mode``/``filters``
    pass through to the scorer."""
    terms = mlt_terms(index, text, max_terms)
    spark = index.spark
    if not terms:
        return spark.createDataFrame(
            [], "rank int, doc_id long, score double")
    extra = 1 if exclude_doc_id is not None else 0
    res = index.search(" ".join(terms), k=k + extra, mode=mode,
                       filters=filters)
    if exclude_doc_id is not None:
        res = res.where(F.col("doc_id") != exclude_doc_id)
    w = Window.orderBy(F.desc(F.round(F.col("score"), 6)),
                       F.asc("doc_id"))
    return (res.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("rank", "doc_id",
                    F.round(F.col("score"), 6).alias("score")))
