"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in donkey_spark/contract.py (SURVEY §3.4);
this file is the thin stable surface the driver imports.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on sf0.001: build the compressed inverted index over the
    documents corpus and run the block-max BM25 batch; rows > 0."""
    from donkey_spark.contract import q_bm25_topk
    return q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented ◇ operator from SURVEY.md §2 (103 since
    r5-final — the late-r5 additions: synonym queries (the Lucene
    SynonymQuery blend: summed member tf under the max-member-df idf,
    unified AND federated — the oracle computes the group arithmetic
    from first principles), regexp term patterns (`/body/`
    whole-term atoms under a portable RE2/RLIKE/DuckDB-agreeing
    grammar, unified AND federated — the oracle re-derives the
    expansion with regexp_matches), pattern-mode match surfaces
    (count/stats/export/facets/sort/delete over "everything matching
    a pattern", the grep-then-act shape — `match_counts_pattern`
    re-derives the per-kind expansion AND the distinct-doc counts),
    percolation (stored queries
    matched against the corpus stream, match semantics identical to
    search), minimum_should_match queries
    (unified AND federated, the ES dial between OR and AND via the
    counting kernel, HAVING count >= m twins), field collapsing
    (top-k groups by best doc with exact group_hits, unified AND
    federated), the exact cardinality aggregation, JLH significant
    terms, and the rescore window (bm25 + field-factor re-ranking) —
    plus per-term boosted queries (`term^W` weights scaling the
    kernel idf, unified AND federated — the oracle multiplies the SAME
    weights into its first-principles per-term sum),
    match-set stats and EXACT-percentiles aggregations,
    the bulk match-set export (the training-pipeline feed),
    cursor pagination (search_after: page-1 boundary rows
    continue to the SAME rank-11..20 oracle the offset pair uses),
    sort-by-field search (match set ordered by a docs
    metadata column, unified AND federated — the oracle re-derives
    match + key + order from first principles),
    numeric range facets (trie presence postings; BETWEEN and
    NOT BETWEEN twins, range-filtered facet counts, binned range
    histograms), the metadata-filtered ANN, exact-phrase, embedding- and
    simhash-near-dup pairs, the IVF coarse-quantizer ANN, hybrid
    BM25+ANN reciprocal-rank fusion, near-dup connected-component
    clusters, more-like-this, facet histograms (plain and filtered),
    snippets, upsert, facet backfill, prefix/fuzzy dictionary-expansion
    queries (unified AND federated — the oracle re-derives the
    expansion ranking in SQL), boolean AND/OR/NOT expressions (unified
    AND federated — the oracle renders the SAME parsed tree as SQL
    predicates), and the federated sharded surfaces:
    ranked, phrase, LSH-ANN and shared-quantizer IVF search over shard
    indexes; the ANN pairs certify the production mapInArrow kernels),
    all oracle-backed."""
    from donkey_spark.contract import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins — one per ``queries()`` key (since
    r3 EVERY entry has one, including the engine-internal surfaces:
    manifest lineage, per-salt segment layout, resume chunking and
    streaming convergence are value-checked against from-first-principles
    SQL recomputation; only codec-dependent byte counts stay pytest-only)."""
    from donkey_spark.contract import ORACLE_SQL
    return dict(ORACLE_SQL)
