"""Percolation — match STORED QUERIES against a stream of documents
(the ES percolator, run as a batch/ingest job): "which of my saved
alerts / routing rules / slice definitions does each incoming doc
trigger?". The inverse of search: queries are the data, documents are
the probes. In a training-data pipeline this is the tag-at-ingest
shape — every document classified against a standing query library
(PII screens, topic routes, quality slices) in one pass over the
corpus, no index required.

Semantics (the engine's own match semantics, re-used verbatim):

* a query = its §T-tokenized distinct term set; a doc matches under
  mode="or" when it contains ANY query term, mode="and" when it
  contains EVERY one, and ``min_match`` (the T37 dial) when it
  contains at least m distinct ones — the same rules search_rows
  ranks by, so percolating a corpus and searching its index agree
  doc-for-doc (pytest-asserted).
* queries with zero §T tokens match nothing (a no-term alert is
  meaningless, not universal).

Plan shape at 10^12 files: ONE Catalyst-only pass over the corpus —
tokenize_expr (JVM regexp, no Python) → explode distinct tokens →
broadcast-join the query-term table (queries are human-curated:
thousands at most, always broadcastable) → partial-aggregated
countDistinct per (doc, query) → threshold by mode. No shuffle
carries more than (matching doc, query) pairs; no UDF anywhere; the
whole job is whole-stage-codegen eligible except the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokenize_expr, tokenize_py

KEY_COLS = ("repo", "path", "commit")


def percolate(corpus: DataFrame,
              queries: list[tuple[int, str]],
              mode: str = "or",
              min_match: int | dict | None = None,
              content_col: str = "content") -> DataFrame:
    """corpus (the input_hint table shape) × stored queries ->
    DataFrame (repo, path, commit, query_id, n_terms_matched), one row
    per (document, query) MATCH, distributed end to end.

    ``queries``: [(query_id, text)] — ids must be unique.
    ``min_match``: int or {query_id: m} (mode="or" only), the T37
    threshold; m <= 1 is plain OR. ``mode="and"`` requires every
    term."""
    if mode not in ("or", "and"):
        raise ValueError(mode)
    ids = [qid for qid, _ in queries]
    if len(set(ids)) != len(ids):
        raise ValueError("percolate: duplicate query_ids")
    if min_match is not None and mode != "or":
        raise ValueError("min_match applies to mode='or' only")
    if isinstance(min_match, int):
        min_match = {qid: min_match for qid, _ in queries}
    elif min_match is not None:
        bad = {q: m for q, m in min_match.items()
               if q not in set(ids) or not isinstance(m, int) or m < 1}
        if bad:
            raise ValueError(f"percolate: invalid min_match entries "
                             f"{bad}")
    spark = corpus.sparkSession
    qrows = []
    for qid, text in queries:
        terms = sorted(set(tokenize_py(text)))
        need = (len(terms) if mode == "and"
                else max(1, (min_match or {}).get(qid, 1)))
        for t in terms:
            qrows.append((qid, t, need))
    if not qrows:
        return (corpus.select(*KEY_COLS)
                .withColumn("query_id", F.lit(None).cast("int"))
                .withColumn("n_terms_matched", F.lit(None).cast("long"))
                .where(F.lit(False)))
    qdf = spark.createDataFrame(qrows,
                                "query_id int, term string, need int")
    doc_terms = (corpus
                 .select(*KEY_COLS,
                         F.explode(F.array_distinct(
                             tokenize_expr(F.col(content_col))))
                         .alias("term")))
    return (doc_terms
            .join(F.broadcast(qdf), "term")
            .groupBy(*KEY_COLS, "query_id")
            .agg(F.countDistinct("term").alias("n_terms_matched"),
                 F.max("need").alias("_need"))
            .where(F.col("n_terms_matched") >= F.col("_need"))
            .drop("_need"))
