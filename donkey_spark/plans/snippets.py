"""Result snippets — the context window a search UI renders under each
hit (donkey returns hit ids + metadata and leaves display to the caller
`[donkey:src — unverified, SURVEY §0]`; a usable engine ships the
display fetch too).

The index stores no content (docs/ is metadata-only), so snippets are a
second, bounded fetch AGAINST THE SOURCE CORPUS — the same shape as the
scored→doc-metadata join (SURVEY op 28), applied to content:

1. rank the query with the ordinary block-max scorer (≤ Σk hit rows);
2. read content for exactly those hits: the corpus scan is filtered on
   ``repo IN (...) AND path IN (...)`` — both predicates push down to
   the parquet/Iceberg scan, so at 10^12 files the fetch touches the
   hits' row groups, never the corpus — then broadcast-joined against
   the hit rows (≤ Σk, always the small side);
3. one Arrow-batched pandas pass per joined row tokenizes the content
   (§T tokenizer — identical to indexing) and emits the snippet.

Snippet rule (deterministic, so a SQL twin can replay it exactly):
among the query's in-dictionary terms PRESENT in the doc, pick the one
with the lowest document frequency (ties: lexicographically first) —
the most discriminative term the hit actually matched; the snippet is
the ±``window`` tokens around its first occurrence, space-joined.

``search_snippets_sharded`` runs the same pipeline over a federation:
ranking through plans/sharded.py's global-stats search, term selection
on the GLOBAL document frequencies (= the unified index's, since
shards partition the corpus), commit lookup against each hit's OWNING
shard's docs table — so the annotated rows are identical to a unified
index's, plus the shard column callers need to fetch back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokenize_py
from .sharded import RESULT_SCHEMA as _SHARDED_ROW_SCHEMA

_ANNOTATION_COLS = ", matched_term string, pos int, snippet string"
_OUT_SCHEMA = ("query_id int, rank int, doc_id long, score double, "
               "repo string, path string" + _ANNOTATION_COLS)
#: the federated rows ARE sharded.RESULT_SCHEMA + the annotations —
#: derived, not re-spelled, so the two cannot drift (third review)
_OUT_SCHEMA_SHARDED = _SHARDED_ROW_SCHEMA + _ANNOTATION_COLS


def _sel_order(queries, dfs: dict) -> dict:
    """Per-query matched-term selection order: the query's
    in-dictionary terms by (df asc, term asc) — deterministic, so the
    SQL twin can replay the choice."""
    return {
        qid: [t for t in sorted(set(tokenize_py(text)),
                                key=lambda t: (dfs.get(t) or 0, t))
              if dfs.get(t)]
        for qid, text, _ in queries}


def _fetch_and_annotate(spark, corpus: DataFrame, hits: DataFrame,
                        join_keys: list[str], repos: list, paths: list,
                        sel_order: dict, window: int,
                        id_cols: list[str], out_schema: str) -> DataFrame:
    """The shared tail of every snippets variant: pushdown-filtered
    content fetch, left join (a vanished source file keeps its hit row
    with NULL snippet), one Arrow-batched pandas pass that tokenizes
    (§T) and slices ±window around the matched term."""
    content = (corpus
               .where(F.col("repo").isin(repos)
                      & F.col("path").isin(paths))   # parquet pushdown
               .select(*join_keys, "content"))
    # left join keeps hits whose source file vanished (NULL content);
    # both sides are O(Σk) rows after the pushdown, so the join is
    # trivially broadcastable whichever side the planner picks
    joined = hits.join(content, join_keys, "left")

    w = window

    def add_snippets(batches):
        for pdf in batches:
            terms, poss, snips = [], [], []
            for content_, qid in zip(pdf["content"], pdf["query_id"]):
                toks = tokenize_py(content_)
                hit = next((t for t in sel_order.get(qid, ())
                            if t in toks), None)
                if hit is None:
                    terms.append(None), poss.append(None)
                    snips.append(None)
                    continue
                i = toks.index(hit)
                terms.append(hit)
                poss.append(i + 1)
                snips.append(" ".join(toks[max(0, i - w):i + w + 1]))
            out = pdf[id_cols].copy()
            out["matched_term"], out["pos"], out["snippet"] = \
                terms, poss, snips
            yield out

    return joined.mapInPandas(add_snippets, out_schema)


def search_snippets(index, corpus: DataFrame,
                    queries: list[tuple[int, str, int]],
                    window: int = 3, mode: str = "or",
                    filters: dict | None = None) -> DataFrame:
    """Top-k search with a display snippet per hit.

    Returns (query_id, rank, doc_id, score, repo, path, matched_term,
    pos, snippet): ``pos`` is the 1-based token index of the first
    occurrence of ``matched_term`` (the hit's rarest matched query
    term), ``snippet`` the space-joined tokens pos−window..pos+window.
    A hit whose content is missing from ``corpus`` keeps its row with
    NULL matched_term/pos/snippet (the index outliving a source file is
    a fact worth surfacing, not dropping).
    """
    spark = index.spark
    rows = index.search_rows(queries, mode=mode, filters=filters)
    if not rows:
        return spark.createDataFrame([], _OUT_SCHEMA)

    # per-query selection order: in-dictionary terms by (df asc, term)
    all_terms = sorted({t for _, text, _ in queries
                        for t in tokenize_py(text)})
    sel_order = _sel_order(queries, index._lookup_terms(all_terms))

    hits = spark.createDataFrame(
        rows, "query_id int, rank int, doc_id long, score double, "
              "repo string, path string")
    # the hit's VERSION: search results carry (repo, path) but content
    # identity is the full (repo, path, commit) triple — after an upsert
    # the corpus legitimately holds several versions of a file, and a
    # (repo, path)-only join would duplicate hits and render snippets
    # from superseded content (r5 review). The commit comes from the
    # index's own docs table, filtered on the ≤ Σk hit ids (pushdown).
    # A corpus WITHOUT a commit column (a plain content store that only
    # ever holds current versions) keeps the (repo, path) join.
    join_keys = ["repo", "path"]
    if "commit" in corpus.columns:
        join_keys = ["repo", "path", "commit"]
        ids = sorted({r[2] for r in rows})
        versions = (spark.read.parquet(f"{index.dir}/docs")
                    .where(F.col("doc_id").isin(ids))  # parquet pushdown
                    .select("doc_id", "commit"))
        hits = hits.join(versions, "doc_id", "left")
    return _fetch_and_annotate(
        spark, corpus, hits, join_keys,
        sorted({r[4] for r in rows}), sorted({r[5] for r in rows}),
        sel_order, window,
        ["query_id", "rank", "doc_id", "score", "repo", "path"],
        _OUT_SCHEMA)


def search_snippets_sharded(shards, corpus: DataFrame,
                            queries: list[tuple[int, str, int]],
                            window: int = 3, mode: str = "or",
                            filters: dict | None = None) -> DataFrame:
    """Federated snippets: `search_snippets` over shard indexes.

    Rows are the unified function's plus the owning ``shard`` index
    (after doc_id, like search_rows_sharded). Every stage is the exact
    federation analog: ranking = global-stats sharded search; matched
    TERM selection uses the GLOBAL df per term (summed shard
    dictionaries = the unified index's df, so the chosen term — and
    hence the snippet — is identical to a unified build's); the commit
    lookup resolves each hit against its OWNING shard's docs table
    (shard-local doc ids are meaningless elsewhere); content fetch and
    annotation are shared code."""
    from .sharded import global_stats, search_rows_sharded
    if not shards:
        raise ValueError("no shards")
    spark = shards[0].spark
    rows = search_rows_sharded(shards, queries, mode=mode,
                               filters=filters)
    if not rows:
        return spark.createDataFrame([], _OUT_SCHEMA_SHARDED)

    all_terms = sorted({t for _, text, _ in queries
                        for t in tokenize_py(text)})
    sel_order = _sel_order(queries,
                           global_stats(shards, all_terms)["dfs"])

    hits = spark.createDataFrame(rows, _SHARDED_ROW_SCHEMA)
    join_keys = ["repo", "path"]
    if "commit" in corpus.columns:
        join_keys = ["repo", "path", "commit"]
        parts = []
        for si, idx in enumerate(shards):
            ids = sorted({r[3] for r in rows if r[2] == si})
            if not ids:
                continue
            parts.append(
                spark.read.parquet(f"{idx.dir}/docs")
                .where(F.col("doc_id").isin(ids))      # pushdown
                .select(F.lit(si).alias("shard"), "doc_id", "commit"))
        versions = parts[0]
        for p in parts[1:]:
            versions = versions.unionByName(p)
        hits = hits.join(versions, ["shard", "doc_id"], "left")
    return _fetch_and_annotate(
        spark, corpus, hits, join_keys,
        sorted({r[5] for r in rows}), sorted({r[6] for r in rows}),
        sel_order, window,
        ["query_id", "rank", "shard", "doc_id", "score", "repo", "path"],
        _OUT_SCHEMA_SHARDED)
