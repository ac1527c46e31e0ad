"""Driver-contract implementations (SURVEY §3.4, entry points for
__spark_entry__.py).

Every ◇ operator from SURVEY §2 gets a (Spark callable, DuckDB SQL) pair;
the driver runs both at sf=0.01 and compares row-count + schema +
order-insensitive value hash. Conventions that make the comparison stable:

* every computed column is aliased identically on both sides;
* counts/sums of ints are cast to long; float aggregates are rounded
  (ROUND(x, 6)) on BOTH sides so ~1e-13 summation-order noise can't flip
  the hash;
* the §T tokenizer is expressed with built-ins only (lower +
  regexp_extract_all + filter), which DuckDB mirrors exactly
  (list_filter(regexp_extract_all(lower(text), ...)));
* the flagship bm25_topk runs the REAL engine (index build + block-max
  query) against a from-first-principles SQL BM25 — the strongest
  end-to-end correctness gate.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.tokenize import tokenize_expr
from .operators.doc_ids import assign_doc_ids
from .sources.corpus import documents_as_corpus

# ---------------------------------------------------------------------------
# shared pieces
# ---------------------------------------------------------------------------

#: §T tokenizer in ANSI-ish DuckDB SQL over the raw `documents` view —
#: including the MAX_TOKENS_PER_DOC cap every engine path applies (§T.3),
#: so oversized documents can't diverge between engine and oracle.
from .config import MAX_TOKENS_PER_DOC as _TOK_CAP  # noqa: E402
from .pipeline.textqual import _WINNOW_B as _WINNOW_B_SQL  # noqa: E402

_TOKS_SQL = ("(list_filter(regexp_extract_all(lower(text), '[a-z0-9_]+'), "
             f"t -> len(t) BETWEEN 2 AND 64))[1:{_TOK_CAP}]")

#: BM25 reference query set for the flagship (terms exist in documents.text)
BM25_QUERIES: list[tuple[int, str, int]] = [
    (0, "spark join filter", 10),
    (1, "group sort merge", 10),
    (2, "customer row", 10),
    (3, "window", 10),
    (4, "stream batch value", 10),
    (5, "zz_oov_token", 10),
]

#: conjunctive (AND) query set — op 32 intersection fast path; query 4's
#: OOV conjunct must yield zero rows on both engines
BM25_AND_QUERIES: list[tuple[int, str, int]] = [
    (0, "spark join", 10),
    (1, "group sort merge", 10),
    (2, "customer row", 10),
    (3, "stream batch value", 10),
    (4, "spark zz_oov_token", 10),
]

#: minimum_should_match query set (§2.14 — the ES knob between OR and
#: AND, kernels/wand.score_range_topk_msm). Per-query thresholds in
#: BM25_MSM_M: query 1's m equals its term count (must reproduce
#: mode="and"); query 3's OOV term can never be matched, so its m=2
#: requires BOTH live terms; query 4's m exceeds its live-term count
#: (empty on both engines); query 5's m=1 is the plain OR query.
BM25_MSM_QUERIES: list[tuple[int, str, int]] = [
    (0, "spark join filter", 10),
    (1, "group sort merge", 10),
    (2, "stream batch value window", 10),
    (3, "spark zz_oov_token join", 10),
    (4, "customer row zz_oov_token", 10),
    (5, "window merge", 10),
]
#: covers EVERY query id (the oracle's qm CTE inner-joins on it)
BM25_MSM_M: dict[int, int] = {0: 2, 1: 3, 2: 2, 3: 2, 4: 3, 5: 1}

#: exact-phrase query set (r5, format v3 positions) — phrases chosen to
#: have real adjacent occurrences in the documents fixture at every sf;
#: query 3 reverses a common phrase (sparser matches), query 4's OOV
#: conjunct must yield zero rows on both engines
BM25_PHRASE_QUERIES: list[tuple[int, str, int]] = [
    (0, "sort merge", 10),
    (1, "hash join", 10),
    (2, "table scan", 10),
    (3, "merge sort", 10),
    (4, "spark zz_oov_token", 5),
]

#: prefix-pattern query set (§2.14 T23). The cap of 3 BINDS on `s*`
#: (six dictionary terms start with s), so the pair certifies the
#: (df DESC, term ASC) expansion ranking itself — the winning three
#: differ between scale factors because dfs are data-dependent. `qq*`
#: matches nothing (the query degrades to its literal), `zz*` matches
#: nothing at all (zero rows on both engines).
BM25_PREFIX_QUERIES: list[tuple[int, str, int]] = [
    (0, "s* filter", 10),
    (1, "c* order", 10),
    (2, "gr* merge", 10),
    (3, "qq* window", 10),
    (4, "va* ke* big", 10),
    (5, "zz* the", 5),
]
PREFIX_EXPANSION_CAP = 3

#: wildcard-pattern query set (§2.14 T26): ``?`` single-character,
#: head-bounded infix (``s*t`` — dictionary probe prunes to [s, t)),
#: a LEADING wildcard (``*tion`` — the full term-column scan path), a
#: multi-metachar atom, and ``qq*zz`` matching nothing (the query
#: degrades to its literal). The cap of 3 binds on the broad patterns,
#: certifying the (df DESC, term ASC) ranking through LIKE on both
#: engines.
BM25_WILDCARD_QUERIES: list[tuple[int, str, int]] = [
    (0, "jo?n filter", 10),
    (1, "s*t order", 10),
    (2, "*tion merge", 10),
    (3, "me?ge w*d?w sort", 10),
    (4, "qq*zz the", 5),
]
WILDCARD_EXPANSION_CAP = 3

#: regexp-pattern query set (§2.14 T43): group alternation with a
#: literal head (prunes to [jo, jp)), a class+suffix pattern where the
#: cap of 3 BINDS (s[cmop].* matches scan/small/sort/spark), a
#: leading-metachar pattern (.*e[ry] — the full term-column scan
#: path, cap binds on customer/filter/key/order), optional and bounded
#: quantifiers, a TOP-LEVEL alternation (headless by construction), a
#: negated class, and a nothing-matcher (the query degrades to its
#: literal).
BM25_REGEXP_QUERIES: list[tuple[int, str, int]] = [
    (0, "/jo(in|urnal)/ filter", 10),
    (1, "/s[cmop].*/ order", 10),
    (2, "/.*e[ry]/ merge", 10),
    (3, "/me?rge/ /gr[aeiou]{1,2}p/ sort", 10),
    (4, "/[bd]ig|batch/ the", 10),
    (5, "/qq[x-z]+zz/ window", 5),
    (6, "/k[^q]y/ scan", 10),
]
REGEXP_EXPANSION_CAP = 3

#: synonym query set (§2.14 T44 — the Lucene SynonymQuery construct):
#: a token with a map entry scores as ONE blended clause over
#: {token} ∪ synonyms (summed tf under the max-member-df idf). The map
#: exercises a reordering 2-member group, a 3-member group, an OOV
#: member (drops from its group), an unused head, and a reciprocal
#: pair (join→merge AND merge→join — each query groups under ITS
#: head); `window` / `scan` / `sort` / `filter` stay plain clauses.
BM25_SYN_QUERIES: list[tuple[int, str, int]] = [
    (0, "join filter", 10),
    (1, "table scan", 10),
    (2, "stream window", 10),
    (3, "key vector", 10),
    (4, "merge sort", 10),
]
SYNONYMS_MAP: dict[str, list[str]] = {
    "join": ["merge"],
    "table": ["row", "column"],
    "stream": ["batch", "zz_oov_syn"],
    "zz_oov_head": ["spark"],
    "key": ["value"],
    "merge": ["join"],
}

#: pattern-mode MATCH-SET query set (§2.14 T43×T27 — the grep-then-act
#: shape: count/export/delete "everything matching a pattern"). Mixes
#: every pattern kind; the last query's pattern matches nothing and
#: its literal is OOV, so its count 0 must survive the grid.
BM25_PATTERN_COUNT_QUERIES: list[tuple[int, str, int]] = [
    (0, "/jo(in|urnal)/ filter", 1),
    (1, "s* order", 1),
    (2, "me?ge w*d?w", 1),
    (3, "joun~1 /.*e[ry]/", 1),
    (4, "/qq[x-z]+zz/ zz_oov_token", 1),
]

#: boolean-expression query set (§2.14 T24) — nesting, NOT over a
#: group, NOT of an OOV term (matches everything → equals the plain
#: positive query), an OOV positive inside OR (drops out of scoring),
#: a provably-empty AND with an OOV conjunct, and a double negation.
BM25_BOOL_QUERIES: list[tuple[int, str, int]] = [
    (0, "spark AND (join OR filter)", 10),
    (1, "group AND NOT merge", 10),
    (2, "(customer OR row) AND NOT (window OR stream)", 10),
    (3, "spark AND NOT zz_oov_token", 10),
    (4, "zz_oov_token OR batch", 10),
    (5, "spark AND zz_oov_token", 5),
    (6, "sort AND NOT NOT value", 10),
]

#: boosted query set (§2.14 — the Lucene term^W knob,
#: functions/boosts.py): up- and down-weights that REORDER the flagship
#: rankings, a duplicate atom certifying the largest-wins rule, a
#: fractional weight, and a boost on an OOV term (weight on a term
#: nobody has must change nothing — it drops with the term).
BM25_BOOST_QUERIES: list[tuple[int, str, int]] = [
    (0, "spark^2 join filter", 10),
    (1, "group sort^0.25 merge", 10),
    (2, "customer^3 row^0.5", 10),
    (3, "window^2 window", 10),
    (4, "stream^1.5 batch value^0.5 zz_oov_token^9", 10),
]

#: fuzzy-pattern query set (§2.14 T23) — each ~D atom expands via edit
#: distance over the dictionary (engine: banded DP / Spark levenshtein;
#: oracle: DuckDB levenshtein). `dup~1` hits the rare tail term, and
#: `zzzz~1` matches nothing (the query degrades to its literal).
BM25_FUZZY_QUERIES: list[tuple[int, str, int]] = [
    (0, "joun~1 filter", 10),
    (1, "tabel~2 agg", 10),
    (2, "dup~1 line", 10),
    (3, "zzzz~1 window", 10),
    (4, "vektor~2 strean~1", 10),
    (5, "kei~1 rows~1 fast", 10),
]

_INDEX_CACHE: dict[str, str] = {}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _spread(df: DataFrame, *keys: str) -> DataFrame:
    """Spread a scan across the cores before per-row heavy work (r6 —
    guide §2.5 input-skew fix): a single-row-group parquet file scans as
    ONE task, so everything up to the first exchange would run serially
    on a 32-core box. Deterministic hash repartition on ``keys``; a
    no-op whenever the scan already has >= parallelism splits (the
    cluster-scale case), so no extra exchange appears at scale."""
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= p:
        return df
    return df.repartition(p, *[F.col(k) for k in keys])


def _doc_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, term, tf) via built-ins — the ◇ oracle path for op 11.
    Projected to (doc_id, text) BEFORE the spread so the exchange never
    carries unused metadata columns (guide §2.3)."""
    return (_spread(_docs(spark, sf_dir).select("doc_id", "text"), "doc_id")
            .select("doc_id", F.explode(tokenize_expr(F.col("text")))
                    .alias("term"))
            .groupBy("doc_id", "term")
            .agg(F.count("*").cast("long").alias("tf")))


def contract_index_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per sf_dir per process) the engine index over the
    documents table mapped through the corpus adapter."""
    if sf_dir not in _INDEX_CACHE:
        from .plans.build import build_index
        out = os.path.join(tempfile.gettempdir(),
                           "donkey_idx_" + sf_dir.strip("/").replace("/", "_"))
        # positions=True (format v3): the shared index also serves the
        # phrase pair; every other pair is position-oblivious
        build_index(spark, documents_as_corpus(spark, sf_dir), out,
                    positions=True)
        _INDEX_CACHE[sf_dir] = out
    return _INDEX_CACHE[sf_dir]


_SHARD_CACHE: dict[str, list[str]] = {}


def contract_shard_dirs(spark: SparkSession, sf_dir: str) -> list[str]:
    """Two shard indexes over a deterministic split of the documents
    corpus (raw doc number parity, derived from the path — engine-
    independent), for the federated-search pairs. Positional (format
    v3) so the same shard cache serves both the ranked and the phrase
    federation. The oracle never sees the split: sharding must be
    invisible to results."""
    if sf_dir not in _SHARD_CACHE:
        from .plans.build import build_index
        corpus = documents_as_corpus(spark, sf_dir)
        part = F.substring("path", 5, 18).cast("long") % 2
        dirs = []
        for i in range(2):
            out = os.path.join(
                tempfile.gettempdir(),
                f"donkey_shard{i}_" + sf_dir.strip("/").replace("/", "_"))
            build_index(spark, corpus.where(part == i), out,
                        positions=True)
            dirs.append(out)
        _SHARD_CACHE[sf_dir] = dirs
    return _SHARD_CACHE[sf_dir]


# ---------------------------------------------------------------------------
# ◇ queries — Spark side
# ---------------------------------------------------------------------------

def q_tokenize_tf(spark, sf_dir):
    """ops 10/11/12/14 — tokenizer + explode + tf. r6: the per-doc tfs
    come pre-counted from the fused extractor (the build's 'python'
    extractor — one Arrow pass, C regex + Counter per doc), so the plan
    has NO aggregation at all: spread → extract → explode zip → rows.
    The old explode + groupBy(doc_id, term) shape hashed 1.1M pairs and
    compiled an aggregation stage for a relation the extractor already
    produces per doc (guide §2.3 "aggregate before you shuffle" taken to
    its limit: zero exchanges after the spread). Same (doc_id, term, tf)
    relation, proven hash-equal against the unchanged DuckDB oracle;
    the _arrow twin certifies the kernels/exttok.py extractor the same
    way this pair now certifies the pandas one."""
    from .functions.tokenize import doc_features_udf
    feats = (_spread(_docs(spark, sf_dir).select("doc_id", "text"),
                     "doc_id")
             .select("doc_id", doc_features_udf(F.col("text")).alias("f")))
    return (feats
            .select("doc_id", F.explode(
                F.arrays_zip("f.terms", "f.tfs")).alias("e"))
            .select("doc_id", F.col("e.terms").alias("term"),
                    F.col("e.tfs").cast("long").alias("tf")))


def q_tokenize_tf_arrow(spark, sf_dir):
    """ops 10/11 via the VECTORIZED extractor (kernels/exttok.py —
    mapInArrow, zero per-token Python): same (doc_id, term, tf) relation,
    same DuckDB oracle as tokenize_tf — driver-certifies the alternative
    extractor hash-exactly against an independent engine."""
    from .functions.tokenize import FEATURES_STRUCT_DDL, doc_features_arrow
    feats = (_docs(spark, sf_dir)
             .select("doc_id", F.col("text").alias("content"))
             .mapInArrow(doc_features_arrow,
                         "doc_id long, " + FEATURES_STRUCT_DDL))
    return (feats
            .select("doc_id", F.explode(
                F.arrays_zip("f.terms", "f.tfs")).alias("e"))
            .select("doc_id", F.col("e.terms").alias("term"),
                    F.col("e.tfs").cast("long").alias("tf")))


def q_doc_lengths(spark, sf_dir):
    """op 19 — dl per doc (zero-token docs included)."""
    return (_docs(spark, sf_dir)
            .select("doc_id", F.size(tokenize_expr(F.col("text")))
                    .cast("long").alias("dl")))


def q_corpus_stats(spark, sf_dir):
    """op 19 — global stats (1 row)."""
    return (_docs(spark, sf_dir)
            .select(F.size(tokenize_expr(F.col("text"))).alias("dl"))
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.round(F.avg("dl"), 6).alias("avgdl"),
                 F.sum("dl").cast("long").alias("n_tokens")))


def q_doc_freq(spark, sf_dir):
    """op 20 — df/cf per term. r6: per-doc tfs come pre-aggregated from
    the fused extractor (one Arrow pass, no raw-token explode+groupBy),
    so the ONLY exchange carries ~vocabulary-sized partial aggregates —
    the map-side-aggregation shape (guide §2.3) — instead of the 1.1M
    unique (doc, term) rows the old two-groupBy plan shuffled first.
    Same relation (df = # docs carrying the term, cf = Σ tf), proven
    hash-equal against the unchanged DuckDB oracle."""
    from .functions.tokenize import doc_features_udf
    feats = (_spread(_docs(spark, sf_dir).select("doc_id", "text"),
                     "doc_id")
             .select(doc_features_udf(F.col("text")).alias("f")))
    return (feats
            .select(F.explode(F.arrays_zip("f.terms", "f.tfs")).alias("e"))
            .select(F.col("e.terms").alias("term"),
                    F.col("e.tfs").alias("tf"))
            .groupBy("term")
            .agg(F.count("*").cast("long").alias("df"),
                 F.sum("tf").cast("long").alias("cf")))


def q_filter_lang(spark, sf_dir):
    """op 7 — predicate pushdown slice."""
    return (_docs(spark, sf_dir)
            .where(F.col("lang").isin("en", "de") & (F.col("n_chars") > 200))
            .select("doc_id", "lang", "n_chars"))


def q_distinct_counts(spark, sf_dir):
    """op 21 — exact distinct counts."""
    return (_docs(spark, sf_dir)
            .agg(F.countDistinct("lang").cast("long").alias("n_langs"),
                 F.countDistinct("source").cast("long").alias("n_sources"),
                 F.countDistinct("doc_id").cast("long").alias("n_docs")))


def q_sha256(spark, sf_dir):
    """ops 2/18 — content hash invariant surface."""
    return (_docs(spark, sf_dir)
            .select("doc_id", F.sha2(F.col("text"), 256).alias("sha")))


def q_dup_contents(spark, sf_dir):
    """op 21 — duplicate-content groups (journal re-insert dedupe analog)."""
    return (_docs(spark, sf_dir)
            .groupBy(F.sha2(F.col("text"), 256).alias("sha"))
            .agg(F.count("*").cast("long").alias("n"))
            .where(F.col("n") > 1))


def q_doc_ids_dense(spark, sf_dir):
    """op 9 — deterministic dense ids == row_number oracle."""
    corpus = documents_as_corpus(spark, sf_dir)
    return (assign_doc_ids(corpus)
            .select("repo", "path", F.col("doc_id").alias("dense_id")))


def q_scalar_fns(spark, sf_dir):
    """ops 12/13 — string/math scalar functions."""
    return (_docs(spark, sf_dir)
            .select("doc_id",
                    F.length("text").cast("long").alias("text_len"),
                    F.upper(F.substring("text", 1, 8)).alias("head8"),
                    F.round(F.log1p(F.col("n_chars")), 6).alias("log_chars")))


def q_conjunctive_and(spark, sf_dir):
    """op 32 — docs containing ALL query terms (posting intersection)."""
    dt = _doc_terms(spark, sf_dir)
    return (dt.where(F.col("term").isin("spark", "join"))
            .groupBy("doc_id")
            .agg(F.countDistinct("term").alias("nt"))
            .where(F.col("nt") == 2)
            .select("doc_id"))


def q_semi_join(spark, sf_dir):
    """op 30 — docs with ≥1 hit (left semi)."""
    hits = _doc_terms(spark, sf_dir).where(F.col("term") == "spark")
    return (_docs(spark, sf_dir)
            .join(hits, "doc_id", "left_semi")
            .select("doc_id", "lang"))


def q_union_langs(spark, sf_dir):
    """op 39 — unionByName."""
    d = _docs(spark, sf_dir)
    return (d.where(F.col("lang") == "en").select("doc_id")
            .unionByName(d.where(F.col("lang") == "de").select("doc_id")))


def q_except_docs(spark, sf_dir):
    """op 40 — EXCEPT."""
    d = _docs(spark, sf_dir)
    return (d.where(F.col("lang") == "en").select("doc_id")
            .exceptAll(d.where(F.col("n_chars") < 200).select("doc_id")))


def q_intersect_docs(spark, sf_dir):
    """op 41 — INTERSECT."""
    d = _docs(spark, sf_dir)
    return (d.where(F.col("lang") == "en").select("doc_id")
            .intersect(d.where(F.col("n_chars") > 300).select("doc_id")))


def q_topk_per_lang(spark, sf_dir):
    """ops 42/44 — window rank, top-3 per group, deterministic tie-break."""
    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (_docs(spark, sf_dir)
            .withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= 3)
            .select("lang", "rnk", "doc_id", "n_chars"))


def q_running_sum(spark, sf_dir):
    """op 43 — analytic frame."""
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (_docs(spark, sf_dir)
            .select("source", "doc_id",
                    F.sum("n_chars").over(w).cast("long").alias("running")))


def q_lang_rollup(spark, sf_dir):
    """op 24 — rollup with subtotal rows."""
    return (_docs(spark, sf_dir)
            .rollup("lang", "source")
            .agg(F.count("*").cast("long").alias("n"),
                 F.sum("n_chars").cast("long").alias("chars"))
            .select(F.coalesce(F.col("lang"), F.lit("<all>")).alias("lang"),
                    F.coalesce(F.col("source"), F.lit("<all>")).alias("source"),
                    "n", "chars"))


def q_events_hourly(spark, sf_dir):
    """streaming-shaped batch agg — tumbling hour buckets (§2.10 analog)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (ev.groupBy(F.date_trunc("hour", F.col("ts")).cast("string")
                       .alias("hour"), "event_type")
            .agg(F.count("*").cast("long").alias("n"),
                 F.round(F.sum("value"), 4).alias("v")))


def q_lineitem_pricing(spark, sf_dir):
    """generic OLAP check (TPC-H Q1 shape) — agg correctness at scale."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (li.where(F.col("l_shipdate") <= "1997-09-01")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"),
                 F.count("*").cast("long").alias("n_rows")))


def q_revenue_by_nation(spark, sf_dir):
    """generic join/agg check (broadcast dim joins)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (o.join(c, o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("n_name")
            .agg(F.count("*").cast("long").alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("revenue")))


def q_bm25_topk(spark, sf_dir):
    """FLAGSHIP — the whole engine: tokenize → build compressed index →
    block-max top-k (ops 22/23/26/27/28/35/36, K1–K8) vs a
    from-first-principles SQL BM25."""
    from .plans.query import Index
    idx = Index(spark, contract_index_dir(spark, sf_dir))
    res = idx.search_batch(BM25_QUERIES)
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("score"), 6)), F.asc("doc_id"))
    return (res.withColumn("rank", F.row_number().over(w))
            .select("query_id", "rank", "doc_id",
                    F.round(F.col("score"), 6).alias("score")))


def q_bm25_topk_sharded(spark, sf_dir):
    """§2.14 T21 — federated sharded search: TWO shard indexes over a
    corpus split, queried with global stats (plans/sharded.py), merged
    on (score, repo, path) — compared against the SAME unified-corpus
    DuckDB oracle as the flagship pair. Sharding must be invisible:
    identical ranks, identical scores. No doc_id in the output (a
    federation has no global id; the key columns are the identity)."""
    from .plans.query import Index
    from .plans.sharded import search_rows_sharded
    shards = [Index(spark, d) for d in contract_shard_dirs(spark, sf_dir)]
    rows = search_rows_sharded(shards, BM25_QUERIES)
    return _rank_sharded_rows(spark, rows)


def _rank_rows(spark, rows):
    """Shared tail for rows-returning BM25 pairs: re-rank on the ROUNDED
    score with doc_id tie-break (same contract as the flagship)."""
    df = spark.createDataFrame(
        rows, "query_id int, rank int, doc_id long, score double, "
              "repo string, path string")
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("score"), 6)), F.asc("doc_id"))
    return (df.withColumn("rank", F.row_number().over(w))
            .select("query_id", "rank", "doc_id",
                    F.round(F.col("score"), 6).alias("score")))


def _rank_sharded_rows(spark, rows):
    """Shared tail for FEDERATED rows-returning BM25 pairs: re-rank on
    the ROUNDED score like every bm25 pair, tie-break (repo, path) ==
    the unified index's doc_id order (dense ids are assigned in key
    order). No doc_id in the output — a federation has no global id;
    the key columns are the identity."""
    from .plans.sharded import RESULT_SCHEMA
    df = spark.createDataFrame(rows, RESULT_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("score"), 6)), F.asc("repo"), F.asc("path"))
    return (df.withColumn("rank", F.row_number().over(w))
            .select("query_id", "rank",
                    F.round(F.col("score"), 6).alias("score"),
                    "repo", "path"))


def q_bm25_topk_prefix(spark, sf_dir):
    """§2.14 T23 — prefix patterns (Lucene PrefixQuery analog): each
    `foo*` atom expands against the index DICTIONARY to the matching
    terms ranked (df DESC, term ASC), capped at 3 so the ranking binds,
    then scores as a plain OR multi-term query (per-term idf). The
    DuckDB twin re-derives the expansion from its own dfreq CTE —
    ranking, cap, scoring and all (_pattern_qset_sql)."""
    from .plans.query import Index
    idx = Index(spark, contract_index_dir(spark, sf_dir))
    return _rank_rows(spark, idx.search_rows_pattern(
        BM25_PREFIX_QUERIES, max_expansions=PREFIX_EXPANSION_CAP))


def q_bm25_topk_fuzzy(spark, sf_dir):
    """§2.14 T23 — fuzzy patterns (Lucene FuzzyQuery analog): `term~D`
    expands to dictionary terms within edit distance D (≤2), via the
    banded DP (driver-local path) or Spark's codegen levenshtein
    (distributed path); the DuckDB twin uses ITS levenshtein over the
    recomputed dfreq. Same rewrite-to-OR scoring as the prefix pair."""
    from .plans.query import Index
    idx = Index(spark, contract_index_dir(spark, sf_dir))
    return _rank_rows(spark, idx.search_rows_pattern(BM25_FUZZY_QUERIES))


def q_bm25_topk_wildcard(spark, sf_dir):
    """§2.14 T26 — wildcard patterns (Lucene WildcardQuery analog):
    ``*``/``?`` globs expand against the dictionary with SQL LIKE
    semantics — pyarrow ``match_like`` on the driver-local path,
    Spark ``LIKE`` distributed, and the DuckDB twin's ``LIKE ...
    ESCAPE '\\'`` over its recomputed dfreq, all three evaluating the
    SAME translated pattern. Head-bounded infix patterns prune the
    dictionary probe like prefixes; ``*tion`` exercises the leading-
    wildcard full term-column scan. Same rewrite-to-OR scoring and
    capped (df DESC, term ASC) ranking as the prefix pair."""
    from .plans.query import Index
    idx = Index(spark, contract_index_dir(spark, sf_dir))
    return _rank_rows(spark, idx.search_rows_pattern(
        BM25_WILDCARD_QUERIES, max_expansions=WILDCARD_EXPANSION_CAP))


def q_bm25_topk_regexp(spark, sf_dir):
    """§2.14 T43 — regexp term queries (Lucene RegexpQuery analog; the
    grep-over-the-index shape of source-code engines à la Zoekt /
    livegrep): each ``/body/`` atom whole-term-matches the dictionary
    under the portable grammar — ONE ``^(?:body)$`` rendering
    evaluated by pyarrow RE2 (driver-local), Spark RLIKE
    (distributed) and the DuckDB twin's ``regexp_matches`` over its
    recomputed dfreq. A mandatory literal head bounds the dictionary
    probe like an infix wildcard; top-level alternation and leading
    metacharacters pay the full term-column scan. Same rewrite-to-OR
    scoring and capped (df DESC, term ASC) ranking as the prefix
    pair; cap 3 binds on the broad patterns."""
    from .plans.query import Index
    idx = Index(spark, contract_index_dir(spark, sf_dir))
    return _rank_rows(spark, idx.search_rows_pattern(
        BM25_REGEXP_QUERIES, max_expansions=REGEXP_EXPANSION_CAP))


def q_bm25_topk_prefix_sharded(spark, sf_dir):
    """§2.14 T23+T21 — prefix patterns over the FEDERATION: expansion
    is computed over the UNION of the shards' dictionaries (uncapped
    per-shard candidates, dfs summed across shards, ranked and capped
    ONCE globally), so the federated rewrite — and therefore the
    ranking — is identical to one index over the union; compared
    against the SAME unified DuckDB prefix oracle, key-identified."""
    from .plans.query import Index
    from .plans.sharded import search_pattern_sharded
    shards = [Index(spark, d) for d in contract_shard_dirs(spark, sf_dir)]
    rows = search_pattern_sharded(shards, BM25_PREFIX_QUERIES,
                                  max_expansions=PREFIX_EXPANSION_CAP)
    return _rank_sharded_rows(spark, rows)


def q_bm25_topk_regexp_sharded(spark, sf_dir):
    """§2.14 T43+T21 — regexp term queries over the FEDERATION: the
    global-expansion rule of the prefix pair (uncapped per-shard
    candidates, Σ-shard dfs, ranked and capped ONCE) applied to the
    portable-grammar regexp kind, so the federated rewrite is
    identical to one index over the union; compared against the SAME
    unified DuckDB regexp oracle, key-identified."""
    from .plans.query import Index
    from .plans.sharded import search_pattern_sharded
    shards = [Index(spark, d) for d in contract_shard_dirs(spark, sf_dir)]
    rows = search_pattern_sharded(shards, BM25_REGEXP_QUERIES,
                                  max_expansions=REGEXP_EXPANSION_CAP)
    return _rank_sharded_rows(spark, rows)


def q_bm25_topk_bool(spark, sf_dir):
    """§2.14 T24 — boolean expressions (Lucene BooleanQuery analog):
    nested AND/OR/NOT over terms; match set = the tree's presence
    evaluation, score = the BM25 sum over the POSITIVE terms a matching
    doc contains (MUST_NOT never scores). The DuckDB twin renders the
    SAME parsed tree as a per-query SQL predicate over its own dt CTE
    (tree_to_sql) and scores only the positive terms (_bool_qset_sql),
    so the boolean semantics themselves are certified, not a hand-fed
    doc list."""
    from .plans.query import Index
    idx = Index(spark, contract_index_dir(spark, sf_dir))
    return _rank_rows(spark, idx.search_rows_bool(BM25_BOOL_QUERIES))


def q_bm25_topk_bool_sharded(spark, sf_dir):
    """§2.14 T24+T21 — boolean expressions over the FEDERATION: trees
    parse once, global stats span every tree term (NOT branches too),
    matching stays shard-local, merge exact — compared against the SAME
    unified DuckDB boolean oracle, key-identified."""
    from .plans.query import Index
    from .plans.sharded import search_bool_sharded
    shards = [Index(spark, d) for d in contract_shard_dirs(spark, sf_dir)]
    rows = search_bool_sharded(shards, BM25_BOOL_QUERIES)
    return _rank_sharded_rows(spark, rows)


def q_bm25_topk_deleted(spark, sf_dir):
    """Tombstone deletion (plans/delete.py) end to end: a dedicated index
    copy tombstones every doc_id % 7 == 0, then runs the flagship query
    set — deleted docs must vanish from every result while live docs rank
    with the FROZEN index stats (Lucene-between-merges semantics). The
    DuckDB twin computes BM25 over the full corpus and filters the
    deleted ids only at ranking, mirroring exactly that contract."""
    from .plans.build import build_index
    from .plans.delete import delete_docs
    from .plans.query import Index
    out = tempfile.mkdtemp(prefix="donkey_del_")
    corpus = documents_as_corpus(spark, sf_dir)
    build_index(spark, corpus, out)
    dead = (spark.read.parquet(f"{out}/docs")
            .where(F.col("doc_id") % 7 == 0).select("doc_id"))
    delete_docs(spark, out, dead)
    res = Index(spark, out).search_batch(BM25_QUERIES)
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("score"), 6)), F.asc("doc_id"))
    return (res.withColumn("rank", F.row_number().over(w))
            .select("query_id", "rank", "doc_id",
                    F.round(F.col("score"), 6).alias("score")))


def q_bm25_topk_page2(spark, sf_dir):
    """r5 §2.14 — offset pagination (Index.search_rows_page, the ES
    from+size shape): the SECOND page (offset=10, k=10) of the flagship
    set on the shared contract index, re-ranked 1..10. The DuckDB twin
    slices rank 11..20 of its own ranking — so the page boundary, the
    re-rank arithmetic, and short-ranking queries (the OOV query has no
    page 2; sparse queries may underfill) are all certified."""
    from .plans.query import Index
    idx = Index(spark, contract_index_dir(spark, sf_dir))
    rows = idx.search_rows_page(BM25_QUERIES, offset=10)
    return _rank_rows(spark, rows)


def q_bm25_topk_after(spark, sf_dir):
    """r5 §2.14 T32 — cursor pagination (Index.search_rows_after, the
    ES search_after shape): page 1 (k=10) of the flagship set runs
    first, each query's LAST row becomes its (score, doc_id) cursor,
    and the continuation must reproduce page 2 EXACTLY — the same rows
    the offset twin (and the DuckDB rank-11..20 oracle) produce. This
    certifies the kernel-level cursor filter (score < cs, or == with
    doc_id after), the exact float boundary re-scoring, and the
    re-rank arithmetic; queries whose rankings end inside page 1 (the
    OOV query) contribute a no-cursor first page that must come back
    empty-beyond-end through the same path."""
    from .plans.query import Index
    idx = Index(spark, contract_index_dir(spark, sf_dir))
    p1 = idx.search_rows(BM25_QUERIES)
    after = {}
    for qid, _, _ in BM25_QUERIES:
        rows = [r for r in p1 if r[0] == qid]
        if rows:
            after[qid] = (rows[-1][3], rows[-1][2])
    rows = idx.search_rows_after(BM25_QUERIES, after)
    # drop queries with NO cursor (their "page 2" via cursors is their
    # first page): the oracle slices rank 11..20, which for an OOV
    # query is empty — matching semantics
    rows = [r for r in rows if r[0] in after]
    return _rank_rows(spark, rows)


def q_bm25_topk_boosted(spark, sf_dir):
    """r5 §2.14 — per-term boosted queries (Index.search_rows_boosted,
    the Lucene ``term^W`` knob): each term's BM25 contribution scales
    by its weight, applied inside the kernel by scaling the term's idf
    so block-max pruning potentials scale with it (skips stay safe —
    functions/boosts.py). The DuckDB twin multiplies the SAME weights
    into its from-first-principles per-term sum (weighted qset), so
    the pair certifies the whole boosted ranking, reordered rows,
    fractional weights, the largest-wins duplicate rule, and the
    boosted-OOV no-op."""
    from .plans.query import Index
    idx = Index(spark, contract_index_dir(spark, sf_dir))
    return _rank_rows(spark, idx.search_rows_boosted(BM25_BOOST_QUERIES))


def q_bm25_topk_boosted_sharded(spark, sf_dir):
    """r5 §2.14 — boosted queries over the federation
    (plans/sharded.search_boosted_sharded): global-stats idf × the same
    per-term weights in every shard ⇒ scores equal the unified boosted
    index's exactly; compared against the SAME weighted oracle mapped
    to (repo, path) identity like every federated pair."""
    from .plans.query import Index
    from .plans.sharded import search_boosted_sharded
    shards = [Index(spark, d) for d in contract_shard_dirs(spark, sf_dir)]
    rows = search_boosted_sharded(shards, BM25_BOOST_QUERIES)
    return _rank_sharded_rows(spark, rows)


def q_bm25_topk_delete_query(spark, sf_dir):
    """r5 §2.14 — delete-by-query (plans/delete.delete_by_query, the
    takedown/GDPR shape): a dedicated index copy tombstones EVERY doc
    matching "customer row" (OR semantics — either term), then runs
    the flagship set. The match set is computed by the same per-salt
    kernel as total-hits and flows distributed into the key-resolving
    delete; query 2 ("customer row") itself must come back empty, the
    other queries rank survivors with FROZEN stats. The DuckDB twin
    filters docs containing either term at ranking only."""
    from .plans.build import build_index
    from .plans.delete import delete_by_query
    from .plans.query import Index
    out = tempfile.mkdtemp(prefix="donkey_delq_")
    build_index(spark, documents_as_corpus(spark, sf_dir), out)
    delete_by_query(spark, out, "customer row")
    res = Index(spark, out).search_batch(BM25_QUERIES)
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("score"), 6)), F.asc("doc_id"))
    return (res.withColumn("rank", F.row_number().over(w))
            .select("query_id", "rank", "doc_id",
                    F.round(F.col("score"), 6).alias("score")))


def q_bm25_topk_filtered(spark, sf_dir):
    """Field-filtered search end to end: a facet-enabled index copy
    (facets=("lang",) — zero-idf presence postings co-located with
    content postings) runs the flagship query set restricted to
    lang=en. The DuckDB twin scores over the full corpus and keeps only
    lang=en docs at ranking: survivor scores must be IDENTICAL to the
    unfiltered query's (facets never touch BM25 stats)."""
    from .plans.build import build_index
    from .plans.query import Index
    out = tempfile.mkdtemp(prefix="donkey_facet_")
    build_index(spark, documents_as_corpus(spark, sf_dir), out,
                facets=("lang",))
    res = Index(spark, out).search_batch(BM25_QUERIES,
                                         filters={"lang": _FACET_LANG})
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("score"), 6)), F.asc("doc_id"))
    return (res.withColumn("rank", F.row_number().over(w))
            .select("query_id", "rank", "doc_id",
                    F.round(F.col("score"), 6).alias("score")))


def q_bm25_topk_filtered_or(spark, sf_dir):
    """Multi-value field filter (r4): `lang IN (de, fr)` as a per-column
    UNION of presence postings — OR within the column's values, AND
    across columns; the presence mask is still built once per salt and
    survivor scores stay identical to the unfiltered query's. The DuckDB
    twin keeps `lang IN (...)` docs at ranking only."""
    from .plans.build import build_index
    from .plans.query import Index
    out = tempfile.mkdtemp(prefix="donkey_facet_or_")
    build_index(spark, documents_as_corpus(spark, sf_dir), out,
                facets=("lang",))
    res = Index(spark, out).search_batch(
        BM25_QUERIES, filters={"lang": list(_FACET_OR_LANGS)})
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("score"), 6)), F.asc("doc_id"))
    return (res.withColumn("rank", F.row_number().over(w))
            .select("query_id", "rank", "doc_id",
                    F.round(F.col("score"), 6).alias("score")))


def q_bm25_topk_filtered_not(spark, sf_dir):
    """Negated field filter (r4): `lang NOT IN (de, fr)` — the mask is
    the complement of the column's value-presence union (docs without
    the column pass, hence the IS NULL arm in the twin); survivor
    scores identical to the unfiltered query's."""
    from .plans.build import build_index
    from .plans.query import Index
    out = tempfile.mkdtemp(prefix="donkey_facet_not_")
    build_index(spark, documents_as_corpus(spark, sf_dir), out,
                facets=("lang",))
    res = Index(spark, out).search_batch(
        BM25_QUERIES, filters={"lang": {"not": list(_FACET_OR_LANGS)}})
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("score"), 6)), F.asc("doc_id"))
    return (res.withColumn("rank", F.row_number().over(w))
            .select("query_id", "rank", "doc_id",
                    F.round(F.col("score"), 6).alias("score")))


def q_bm25_topk_range(spark, sf_dir):
    """§2.14 T25 — numeric range filter (the Lucene NumericRangeQuery /
    points analog): a range-facet index copy (range_facets=("n_chars",)
    with n_chars = length(content) — trie presence postings,
    operators/ranges.py) runs the flagship set restricted to
    n_chars ∈ [200, 400]. The DuckDB twin keeps docs by a plain
    length(text) BETWEEN predicate at ranking, so the whole trie
    pipeline — sortable mapping, per-level tags, range decomposition,
    presence-mask OR — is certified against first-principles BETWEEN
    semantics; survivor scores identical to the unfiltered query's.
    Runs on the shared facet index (facets + range_facets coexist)."""
    from .plans.query import Index
    res = Index(spark, _facet_index_dir(spark, sf_dir)).search_batch(
        BM25_QUERIES,
        filters={"n_chars": {"range": [_RANGE_LO, _RANGE_HI]}})
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("score"), 6)), F.asc("doc_id"))
    return (res.withColumn("rank", F.row_number().over(w))
            .select("query_id", "rank", "doc_id",
                    F.round(F.col("score"), 6).alias("score")))


def q_bm25_topk_range_not(spark, sf_dir):
    """§2.14 T25 — negated range (`{'not': {'range': [lo, hi]}}`): the
    complement mask over the same trie nodes, open-ended twin predicate
    NOT BETWEEN; shares the range pair's index."""
    from .plans.query import Index
    res = Index(spark, _facet_index_dir(spark, sf_dir)).search_batch(
        BM25_QUERIES,
        filters={"n_chars": {"not": {"range": [_RANGE_LO, _RANGE_HI]}}})
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("score"), 6)), F.asc("doc_id"))
    return (res.withColumn("rank", F.row_number().over(w))
            .select("query_id", "rank", "doc_id",
                    F.round(F.col("score"), 6).alias("score")))


def q_map_fns(spark, sf_dir):
    """op 15 — map functions: per-doc term→tf map via map_from_arrays,
    probed with element_at and sized with size (order-insensitive outputs,
    so the nondeterministic collect_list order cannot leak)."""
    dt = _doc_terms(spark, sf_dir)
    m = (dt.groupBy("doc_id")
         .agg(F.map_from_arrays(F.collect_list("term"),
                                F.collect_list("tf")).alias("tfmap")))
    return m.select(
        "doc_id",
        F.coalesce(F.element_at("tfmap", "spark"), F.lit(0))
        .cast("long").alias("tf_spark"),
        F.size("tfmap").cast("long").alias("n_terms"))


def q_json_fns(spark, sf_dir):
    """op 16 — JSON functions: a metadata JSON string (constructed with the
    identical concat on both engines) parsed back with get_json_object."""
    js = F.concat(F.lit('{"lang":"'), F.col("lang"), F.lit('","n":'),
                  F.col("n_chars").cast("string"), F.lit("}"))
    return (_docs(spark, sf_dir)
            .select("doc_id",
                    F.get_json_object(js, "$.lang").alias("j_lang"),
                    F.get_json_object(js, "$.n").cast("long").alias("j_n")))


def q_udaf_rms(spark, sf_dir):
    """op 25 — UDAF surface: a pandas GROUPED_AGG UDF (root-mean-square of
    doc sizes per lang) — Spark's Python UDAF mechanism, Arrow-batched."""

    @F.pandas_udf("double")
    def rms(v: pd.Series) -> float:
        return float(np.sqrt((v.astype("float64") ** 2).mean()))

    @F.pandas_udf("long")
    def n_rows(v: pd.Series) -> int:       # Spark disallows mixing pandas
        return int(len(v))                 # and JVM aggs in one agg() call

    return (_docs(spark, sf_dir)
            .groupBy("lang")
            .agg(F.round(rms(F.col("n_chars")), 4).alias("rms_chars"),
                 n_rows(F.col("n_chars")).alias("n")))


def q_range_join(spark, sf_dir):
    """op 33 — range (theta) join, BANDED for scale: same-lang doc pairs
    with |n_chars delta| ≤ 4. The engine never runs the O(n²) theta join —
    it equi-joins on ⌊n_chars/8⌋ band buckets (left side exploded to its
    3 adjacent bands), then filters exactly; the oracle is the plain theta
    join. This is the scale-safe banded pattern for any bounded-distance
    predicate."""
    W = 8
    d = _docs(spark, sf_dir).select("doc_id", "lang", "n_chars")
    band = (F.col("n_chars") / W).cast("long")
    left = (d.select(F.col("doc_id").alias("id_a"), "lang",
                     F.col("n_chars").alias("ca"))
            .withColumn("band", F.explode(F.array(
                *[(F.col("ca") / W).cast("long") + i for i in (-1, 0, 1)]))))
    right = d.select(F.col("doc_id").alias("id_b"), F.col("lang").alias("lg"),
                     F.col("n_chars").alias("cb"), band.alias("band"))
    return (left.join(right, ["band"])
            .where((F.col("lang") == F.col("lg"))
                   & (F.col("id_a") < F.col("id_b"))
                   & (F.abs(F.col("ca") - F.col("cb")) <= 4))
            .select("id_a", "id_b").distinct())


def q_cross_stats(spark, sf_dir):
    """op 34 — nested-loop cross join, used the only way that is sane at
    scale: the Cartesian product of two O(1)-row aggregate summaries."""
    d = _docs(spark, sf_dir)
    langs = d.groupBy("lang").agg(F.count("*").cast("long").alias("n_l"))
    srcs = d.groupBy("source").agg(F.count("*").cast("long").alias("n_s"))
    return langs.crossJoin(srcs).select("lang", "source", "n_l", "n_s")


def q_bm25_topk_and(spark, sf_dir):
    """op 32 engine fast path — conjunctive top-k: block-skip posting
    intersection inside the range scorer (kernels/wand.py
    score_range_topk_and) vs a HAVING-count SQL BM25."""
    from .plans.query import Index
    idx = Index(spark, contract_index_dir(spark, sf_dir))
    res = idx.search_batch(BM25_AND_QUERIES, mode="and")
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("score"), 6)), F.asc("doc_id"))
    return (res.withColumn("rank", F.row_number().over(w))
            .select("query_id", "rank", "doc_id",
                    F.round(F.col("score"), 6).alias("score")))


def q_bm25_topk_msm(spark, sf_dir):
    """§2.14 minimum_should_match — the ES dial between OR and AND
    (kernels/wand.score_range_topk_msm): only docs containing at least
    m distinct query terms rank, scores unchanged for survivors, vs a
    HAVING count >= m SQL BM25 (per-query m via the qm CTE)."""
    from .plans.query import Index
    idx = Index(spark, contract_index_dir(spark, sf_dir))
    res = idx.search_batch(BM25_MSM_QUERIES, min_match=BM25_MSM_M)
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("score"), 6)), F.asc("doc_id"))
    return (res.withColumn("rank", F.row_number().over(w))
            .select("query_id", "rank", "doc_id",
                    F.round(F.col("score"), 6).alias("score")))


def q_bm25_topk_msm_sharded(spark, sf_dir):
    """§2.14 T21 × minimum_should_match — the msm batch over the two
    shard indexes under federation-global stats. A doc lives in one
    shard and can only contain terms that shard's dictionary has, so
    matched-term counts are shard-local by construction and the same
    unified HAVING-count oracle must reproduce the merge exactly."""
    from .plans.query import Index
    from .plans.sharded import search_rows_sharded
    shards = [Index(spark, d) for d in contract_shard_dirs(spark, sf_dir)]
    rows = search_rows_sharded(shards, BM25_MSM_QUERIES,
                               min_match=BM25_MSM_M)
    return _rank_sharded_rows(spark, rows)


def q_bm25_topk_collapse(spark, sf_dir):
    """§2.14 T38 field collapsing — the flagship query set collapsed on
    repo (= documents.source through the corpus adapter): the k best
    GROUPS per query, each represented by its best-scoring doc, with
    the group's exact match count, vs a DuckDB twin that picks per-
    group representatives with a window rn=1 over the same scored
    CTE (plans/collapse.collapse_rows)."""
    from .plans.collapse import collapse_rows
    from .plans.query import Index
    idx = Index(spark, contract_index_dir(spark, sf_dir))
    rows = collapse_rows(idx, BM25_QUERIES, by="repo")
    df = spark.createDataFrame(
        [(qid, g, d, s, n) for qid, _, g, hr, d, s, n, _, _ in rows
         if hr == 1],
        "query_id int, grp string, doc_id long, score double, "
        "group_hits long")
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("score"), 6)), F.asc("doc_id"))
    return (df.withColumn("rank", F.row_number().over(w))
            .select("query_id", "rank", "grp", "doc_id",
                    F.round(F.col("score"), 6).alias("score"),
                    "group_hits"))


def q_bm25_topk_collapse_sharded(spark, sf_dir):
    """§2.14 T21 × T38 — field collapsing over the two-shard
    federation. The doc-parity split puts every source's docs in BOTH
    shards, so the merge genuinely re-picks each group's
    representative across shards; the same unified collapse oracle
    (sans group_hits — a shard only counts its own top-k groups) must
    reproduce it exactly."""
    from .plans.query import Index
    from .plans.sharded import collapse_rows_sharded
    shards = [Index(spark, d) for d in contract_shard_dirs(spark, sf_dir)]
    rows = collapse_rows_sharded(shards, BM25_QUERIES, by="repo")
    df = spark.createDataFrame(
        [(qid, g, s, repo, path)
         for qid, rk, si, g, did, s, repo, path in rows],
        "query_id int, grp string, score double, repo string, path string")
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("score"), 6)), F.asc("repo"), F.asc("path"))
    return (df.withColumn("rank", F.row_number().over(w))
            .select("query_id", "rank", "grp",
                    F.round(F.col("score"), 6).alias("score"),
                    "repo", "path"))


def q_bm25_phrase_sharded(spark, sf_dir):
    """r5 §2.14 T21 — federated PHRASE search: the same two positional
    shard indexes, each running candidate-rank + position-verify with
    the federation's global stats injected
    (plans/sharded.search_phrase_sharded), merged on (score, repo,
    path) — compared against the SAME unified-corpus DuckDB phrase
    oracle as bm25_phrase_topk, with doc_id mapped to its (repo, path)
    key. Sharding must be invisible to phrase results too."""
    from .plans.query import Index
    from .plans.sharded import search_phrase_sharded
    shards = [Index(spark, d) for d in contract_shard_dirs(spark, sf_dir)]
    rows = []
    for qid, text, k in BM25_PHRASE_QUERIES:
        hits = search_phrase_sharded(shards, text, k=k, query_id=qid)
        # rank on the ROUNDED score like every BM25 pair; tie-break
        # (repo, path) == the unified doc_id order by construction
        hits.sort(key=lambda r: (-round(r[4], 6), r[5], r[6]))
        rows.extend((qid, rank, round(r[4], 6), r[5], r[6])
                    for rank, r in enumerate(hits, start=1))
    return spark.createDataFrame(
        rows, "query_id int, rank int, score double, "
              "repo string, path string")


def q_bm25_phrase_topk(spark, sf_dir):
    """r5 §2.14 — exact-phrase top-k over the positional index (format
    v3): conjunctive BM25 candidates position-verified against the
    positions side table, re-ranked 1..k. The DuckDB twin recomputes
    the phrase containment as a delimited-substring test over the
    space-joined §T token stream (tokens contain no spaces, so
    `' w1 w2 ' ⊆ ' '||join(toks)||' '` ⟺ consecutive occurrence) and
    the same AND-mode BM25 ranking."""
    from .plans.query import Index
    idx = Index(spark, contract_index_dir(spark, sf_dir))
    rows = []
    for qid, text, k in BM25_PHRASE_QUERIES:
        hits = idx.search_phrase(text, k=k, query_id=qid)
        # rank on the ROUNDED score like the other BM25 pairs (the
        # oracle's row_number orders by ROUND(score, 6)) so a sub-1e-6
        # tie cannot flip rank between engine and twin
        hits.sort(key=lambda r: (-round(r[3], 6), r[2]))
        rows.extend((qid, rank, r[2], round(r[3], 6))
                    for rank, r in enumerate(hits, start=1))
    return spark.createDataFrame(
        rows, "query_id int, rank int, doc_id long, score double")


# ---------------------------------------------------------------------------
# training-data pipeline ◇ ops (dedup / similarity / text analysis)
# ---------------------------------------------------------------------------

def q_dictionary_stats(spark, sf_dir):
    """ops 20/23 cross-check — the built INDEX's dictionary (df/cf
    aggregated from posting-block metadata, operators/postings.py
    dictionary_from_segments) must equal the df/cf relation recomputed
    from raw text: a lost or duplicated posting anywhere in
    extract → encode → merge shifts df or cf, so this certifies the
    index's aggregate integrity value-exactly."""
    d = spark.read.parquet(
        f"{contract_index_dir(spark, sf_dir)}/dictionary")
    # the dictionary is a union of per-chunk partials (batch + stream
    # epochs); the canonical relation sums df/cf per term
    return (d.groupBy("term")
            .agg(F.sum("df").cast("long").alias("df"),
                 F.sum("cf").cast("long").alias("cf")))


def q_scan_queries(spark, sf_dir):
    """op 6 — query-set scan + parse: the §Q table round-trips through the
    frozen-schema scan (sources/corpus.scan_queries) and the JVM tokenizer
    explodes each query to (query_id, k, term) — the planning front of
    every search."""
    from .sources.corpus import scan_queries
    qset = (BM25_QUERIES
            + [(100 + qid, text, k) for qid, text, k in BM25_AND_QUERIES])
    # fresh dir per run (mkdtemp, like the neighboring contract queries):
    # a fixed shared path would race concurrent contract runs on one host
    out = os.path.join(tempfile.mkdtemp(prefix="donkey_queries_"), "q")
    (spark.createDataFrame(qset, "query_id int, query string, k int")
     .coalesce(1).write.mode("overwrite").parquet(out))
    q = scan_queries(spark, out)
    return q.select(
        "query_id", "k",
        F.explode(F.array_distinct(tokenize_expr(F.col("query"))))
        .alias("term"))


def q_minhash_bands(spark, sf_dir):
    """MinHash+LSH band signatures (portable sha-derived hash)."""
    from .pipeline.dedup import minhash_bands
    return minhash_bands(_docs(spark, sf_dir))


def q_neardup_pairs(spark, sf_dir):
    """LSH candidate near-duplicate pairs (bucket join, no all-pairs)."""
    from .pipeline.dedup import neardup_pairs
    return neardup_pairs(_docs(spark, sf_dir))


def q_jaccard_pairs(spark, sf_dir):
    """Exact token-set Jaccard over LSH candidates, thresholded."""
    from .pipeline.dedup import jaccard_pairs
    return jaccard_pairs(_docs(spark, sf_dir), threshold=0.7)


def _probe_vec(spark, sf_dir) -> list[float]:
    row = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .where(F.col("vec_id") == 0).select("embedding").collect())
    return [float(x) for x in row[0]["embedding"]]


def q_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-10 vs the vec_id=0 probe (codegen, no UDF)."""
    from .pipeline.similarity import cosine_topk
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return cosine_topk(emb, _probe_vec(spark, sf_dir), k=10)


def q_lang_id(spark, sf_dir):
    """Stopword-overlap language id heuristic."""
    from .pipeline.textqual import lang_id
    return lang_id(_docs(spark, sf_dir))


def q_quality_score(spark, sf_dir):
    """Length/punctuation/stopword quality heuristics."""
    from .pipeline.textqual import quality_score
    return quality_score(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# engine-internal surfaces (resume journal, streaming convergence, index
# layout) — since r3 each has a from-first-principles SQL twin too
# ---------------------------------------------------------------------------

def q_simhash(spark, sf_dir):
    """64-bit SimHash fingerprints (batch-vectorized numpy; value-exact
    DuckDB twin reconstructs the sha-derived bit accumulation)."""
    from .pipeline.dedup import simhash64
    return simhash64(_docs(spark, sf_dir))


def q_winnow_fingerprints(spark, sf_dir):
    """Winnowing document fingerprints (Schleimer et al. 2003); value-exact
    DuckDB twin recomputes the Horner k-gram hashes in HUGEINT."""
    from .pipeline.textqual import winnow_fingerprints
    return winnow_fingerprints(_docs(spark, sf_dir))


#: ANN contract parameters (dim is fixed at 64 in TESTDATA embeddings)
ANN_DIM, ANN_TABLES, ANN_PLANES = 64, 4, 4
_ANN_CACHE: dict[str, str] = {}


def q_lsh_ann_topk(spark, sf_dir):
    """Random-hyperplane LSH ANN via the MATERIALIZED bucket table
    (partition-pruned probe — the 10^9-vector path), checked value-exact
    against a DuckDB twin that recomputes the sha-seeded planes. Since
    r5 the build runs the mapInArrow matmul kernel (kernels/annproj.py)
    with label denormalized (meta_cols), so this pair certifies the
    PRODUCTION bucket assignment — not the expression oracle — against
    DuckDB."""
    from .pipeline.similarity import ann_topk, build_ann_index
    if sf_dir not in _ANN_CACHE:
        out = os.path.join(tempfile.gettempdir(),
                           "donkey_ann_" + sf_dir.strip("/").replace("/", "_"))
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        build_ann_index(emb, out, n_tables=ANN_TABLES, n_planes=ANN_PLANES,
                        meta_cols=("label",))
        _ANN_CACHE[sf_dir] = out
    return ann_topk(spark, _ANN_CACHE[sf_dir], _probe_vec(spark, sf_dir),
                    k=10, n_tables=ANN_TABLES, n_planes=ANN_PLANES)


def q_lsh_ann_topk_deleted(spark, sf_dir):
    """ANN probe with tombstone visibility (r4): every vec_id % 5 == 0 is
    deleted, so those vectors must vanish from the top-k while the
    survivors keep their exact cosines — the bucket table stays frozen
    (no rebuild), exclusion applies at rescoring. The DuckDB twin drops
    the same ids from the candidate set only."""
    from .pipeline.similarity import ann_topk, build_ann_index
    q_lsh_ann_topk(spark, sf_dir)          # ensure the cached bucket table
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dead = emb.where(F.col("vec_id") % 5 == 0).select("vec_id")
    return ann_topk(spark, _ANN_CACHE[sf_dir], _probe_vec(spark, sf_dir),
                    k=10, n_tables=ANN_TABLES, n_planes=ANN_PLANES,
                    exclude=dead)


def q_lsh_ann_topk_filtered(spark, sf_dir):
    """ANN probe with a METADATA filter (r5): nearest neighbors among
    label ∈ {1,2,3} vectors only — the compound query a training-data
    pipeline runs first. The label column is denormalized into the
    bucket rows (build_ann_index meta_cols), so the predicate pushes
    into the partition-pruned scan: no join, no extra shuffle. The
    DuckDB twin applies the same predicate to the candidate set."""
    from .pipeline.similarity import ann_topk
    q_lsh_ann_topk(spark, sf_dir)          # ensure the cached bucket table
    return ann_topk(spark, _ANN_CACHE[sf_dir], _probe_vec(spark, sf_dir),
                    k=10, n_tables=ANN_TABLES, n_planes=ANN_PLANES,
                    filters={"label": [1, 2, 3]})


_ANN_SHARD_CACHE: dict[str, list[str]] = {}


def q_lsh_ann_topk_sharded(spark, sf_dir):
    """r5 §2.14 T21 — federated ANN: the embeddings table split by
    vec_id parity into TWO bucket-table shards, probed through
    plans/sharded.ann_topk_sharded. The twin is the SAME unified
    DuckDB oracle as lsh_ann_topk, because the sha-seeded planes are
    deterministic: every shard hashes into the same bucket space, so
    the federated candidate union IS the unified index's candidate set
    and the results are bit-equal — not merely statistically close."""
    from .pipeline.similarity import build_ann_index
    from .plans.sharded import ann_topk_sharded
    if sf_dir not in _ANN_SHARD_CACHE:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        dirs = []
        for i in range(2):
            out = os.path.join(
                tempfile.gettempdir(),
                f"donkey_annsh{i}_" + sf_dir.strip("/").replace("/", "_"))
            build_ann_index(emb.where(F.col("vec_id") % 2 == i), out,
                            n_tables=ANN_TABLES, n_planes=ANN_PLANES,
                            meta_cols=("label",))
            dirs.append(out)
        _ANN_SHARD_CACHE[sf_dir] = dirs
    return ann_topk_sharded(spark, _ANN_SHARD_CACHE[sf_dir],
                            _probe_vec(spark, sf_dir), k=10,
                            n_tables=ANN_TABLES, n_planes=ANN_PLANES)


IVF_LISTS, IVF_ITERS, IVF_NPROBE = 8, 1, 3
_IVF_CACHE: dict[str, str] = {}


def q_ivf_ann_topk(spark, sf_dir):
    """r5 §2.14 — IVF (inverted-file) ANN via the materialized
    coarse-quantizer index (pipeline/ivf.py): spherical-k-means
    centroids seeded from the 8 lowest-id vectors + 1 distributed Lloyd
    iteration, assignment via the mapInArrow matmul kernel, probe =
    partition-pruned scan of the nprobe=3 nearest lists + exact cosine
    rescore. The DuckDB twin replays seeding, the Lloyd update,
    assignment, list selection and the rescore from first principles
    (same 9-decimal centroid rounding both sides)."""
    from .pipeline.ivf import build_ivf_index, ivf_topk
    if sf_dir not in _IVF_CACHE:
        out = os.path.join(tempfile.gettempdir(),
                           "donkey_ivf_" + sf_dir.strip("/").replace("/", "_"))
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        build_ivf_index(emb, out, n_lists=IVF_LISTS, n_iters=IVF_ITERS,
                        meta_cols=("label",))
        _IVF_CACHE[sf_dir] = out
    return ivf_topk(spark, _IVF_CACHE[sf_dir], _probe_vec(spark, sf_dir),
                    k=10, nprobe=IVF_NPROBE)


_IVF_SHARD_CACHE: dict[str, list[str]] = {}


def q_ivf_ann_topk_sharded(spark, sf_dir):
    """r5 §2.14 T21 — federated IVF ANN: the embeddings split by vec_id
    parity into TWO inverted-list shards built with the SAME frozen
    quantizer (the unified index's trained centroids — the operational
    shared-quantizer regime), probed through
    plans/sharded.ivf_topk_sharded. The twin is the SAME unified DuckDB
    IVF oracle: with one quantizer every shard partitions the same
    centroid space, so the federated candidate union IS the unified
    candidate set and results are bit-equal."""
    from .pipeline.ivf import build_ivf_index, read_centroids
    from .plans.sharded import ivf_topk_sharded
    q_ivf_ann_topk(spark, sf_dir)          # ensure the unified cache
    if sf_dir not in _IVF_SHARD_CACHE:
        cents = read_centroids(spark, _IVF_CACHE[sf_dir])
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        dirs = []
        for i in range(2):
            out = os.path.join(
                tempfile.gettempdir(),
                f"donkey_ivfsh{i}_" + sf_dir.strip("/").replace("/", "_"))
            build_ivf_index(emb.where(F.col("vec_id") % 2 == i), out,
                            n_lists=IVF_LISTS, meta_cols=("label",),
                            centroids=cents)
            dirs.append(out)
        _IVF_SHARD_CACHE[sf_dir] = dirs
    return ivf_topk_sharded(spark, _IVF_SHARD_CACHE[sf_dir],
                            _probe_vec(spark, sf_dir), k=10,
                            nprobe=IVF_NPROBE)


def _ivf_oracle_sql(n_lists: int = IVF_LISTS, n_iters: int = IVF_ITERS,
                    nprobe: int = IVF_NPROBE, k: int = 10) -> str:
    """DuckDB twin of the IVF probe, from first principles: seeds = the
    n_lists lowest-id vectors normalized and ROUND(·,9); each Lloyd
    iteration assigns every vector to its max-dot centroid (ties →
    lowest list), re-means per (list, position), renormalizes and
    re-rounds (empty lists keep the previous centroid); the probe takes
    the nprobe best lists by centroid dot and exact-rescores their
    members. Mirrors pipeline/ivf.py's arithmetic: assignment compares
    raw-vector·normalized-centroid dots (the vector's own norm never
    reorders its scores), centroid components round to 9 decimals after
    every update."""
    dot_ec = _DOT.format(a="e.embedding", b="c.cvec")
    norm_sq = _DOT.format(a="embedding", b="embedding")
    ctes = [f"""cents0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS list_id,
         list_transform(range(1, len(embedding) + 1),
             i -> ROUND(embedding[i]::DOUBLE / sqrt({norm_sq}), 9)) AS cvec
  FROM (SELECT vec_id, embedding FROM embeddings
        ORDER BY vec_id LIMIT {n_lists})
)"""]
    assign = """a{j} AS (
  SELECT vec_id, list_id FROM (
    SELECT e.vec_id, c.list_id,
           row_number() OVER (PARTITION BY e.vec_id
               ORDER BY {dot} DESC, c.list_id ASC) AS rn
    FROM embeddings e CROSS JOIN cents{j} c)
  WHERE rn = 1
)"""
    for j in range(n_iters):
        ctes.append(assign.format(j=j, dot=dot_ec))
        ctes.append(f"""cm{j} AS (
  SELECT a.list_id, t.i, avg(e.embedding[t.i]::DOUBLE) AS m
  FROM a{j} a JOIN embeddings e ON e.vec_id = a.vec_id
  CROSS JOIN range(1, {ANN_DIM} + 1) t(i)
  GROUP BY 1, 2
), cv{j} AS (
  SELECT list_id, list(m ORDER BY i) AS mv FROM cm{j} GROUP BY 1
), cents{j + 1} AS (
  SELECT s.list_id,
         CASE WHEN c.list_id IS NULL THEN s.cvec
              ELSE list_transform(range(1, {ANN_DIM} + 1),
                  i -> ROUND(c.mv[i]
                       / sqrt(list_sum(list_transform(c.mv, x -> x * x))),
                       9))
         END AS cvec
  FROM cents{j} s LEFT JOIN cv{j} c USING (list_id)
)""")
    ctes.append(assign.format(j=n_iters, dot=dot_ec)
                .replace(f"a{n_iters} AS", "af AS", 1))
    cos = (f"{_DOT.format(a='e.embedding', b='v')}"
           f" / (sqrt({_DOT.format(a='e.embedding', b='e.embedding')})"
           f" * sqrt({_DOT.format(a='v', b='v')}))")
    ctes.append("pv AS (SELECT embedding AS v FROM embeddings"
                " WHERE vec_id = 0)")
    ctes.append(f"""pl AS (
  SELECT c.list_id FROM cents{n_iters} c, pv
  ORDER BY {_DOT.format(a='v', b='c.cvec')} DESC, c.list_id ASC
  LIMIT {nprobe}
)""")
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT vec_id, cosine FROM (
  SELECT e.vec_id, ROUND({cos}, 6) AS cosine
  FROM embeddings e
  JOIN af ON af.vec_id = e.vec_id
  JOIN pl ON pl.list_id = af.list_id, pv)
ORDER BY cosine DESC, vec_id ASC LIMIT {k}
"""


_FACET_IDX_CACHE: dict[str, str] = {}


def _facet_index_dir(spark, sf_dir) -> str:
    """Shared facet-enabled index (facets=("lang", "repo")) — built once
    per process, separate from the main contract index because presence
    postings would shift the layout-twin pairs' n_postings/n_blocks."""
    if sf_dir not in _FACET_IDX_CACHE:
        from .plans.build import build_index
        out = os.path.join(tempfile.gettempdir(),
                           "donkey_fidx_" + sf_dir.strip("/").replace("/", "_"))
        build_index(spark, documents_as_corpus(spark, sf_dir)
                    .withColumn("n_chars", F.length("content")), out,
                    facets=("lang", "repo"), range_facets=("n_chars",))
        _FACET_IDX_CACHE[sf_dir] = out
    return _FACET_IDX_CACHE[sf_dir]


def q_facet_counts(spark, sf_dir):
    """r5 §2.14 — facet histogram over the match set
    (plans/facet_counts.py): for the flagship query, count matching
    docs per lang — the counts a search UI shows beside its filters.
    Values enumerate from the dictionary's presence tags; postings come
    from the same pruned segment scan queries use; the per-salt Arrow
    kernel unions the query terms' doc-id blocks and counts each
    presence posting's overlap, emitting O(salts × values) rows. The
    DuckDB twin counts distinct matching docs per lang from raw text."""
    from .plans.facet_counts import facet_counts
    from .plans.query import Index
    return facet_counts(Index(spark, _facet_index_dir(spark, sf_dir)),
                        "spark join filter", "lang")


def _facet_counts_oracle_sql(text: str = "spark join filter",
                             count_col: str = "lang",
                             extra_pred: str = "TRUE") -> str:
    from .functions.tokenize import tokenize_py
    vals = ", ".join(f"('{t}')" for t in sorted(set(tokenize_py(text))))
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
), q(term) AS (VALUES {vals}),
m AS (SELECT DISTINCT doc_id FROM toks JOIN q USING (term))
SELECT d.{count_col} AS value, count(*)::BIGINT AS n_docs
FROM m JOIN documents d USING (doc_id)
WHERE d.{count_col} IS NOT NULL AND ({extra_pred})
GROUP BY 1
"""


def _range_counts_oracle_sql(text: str = "spark join filter",
                             shift: int = 8) -> str:
    """Binned-histogram twin: integer-division binning is exact against
    the engine's biased trie tags because 2^shift divides 2^63 (so the
    XOR-2^63 bias shifts every bin boundary by a whole number of bins)
    and the tested column is non-negative."""
    from .functions.tokenize import tokenize_py
    vals = ", ".join(f"('{t}')" for t in sorted(set(tokenize_py(text))))
    w = 1 << shift
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
), q(term) AS (VALUES {vals}),
m AS (SELECT DISTINCT doc_id FROM toks JOIN q USING (term))
SELECT (length(d.text) // {w}) * {w} AS bin_lo,
       (length(d.text) // {w}) * {w} + {w - 1} AS bin_hi,
       count(*)::BIGINT AS n_docs
FROM m JOIN documents d USING (doc_id)
GROUP BY 1, 2
"""


def q_facet_counts_filtered(spark, sf_dir):
    """r5 §2.14 — faceted-navigation counts: the repo histogram of the
    flagship query's match set WITH lang='en' selected — the counts a
    UI shows for one filter group while another group's selection is
    active. The filter mask intersects inside the same per-salt kernel
    (id-array set ops over presence postings); the twin just adds the
    lang predicate."""
    from .plans.facet_counts import facet_counts
    from .plans.query import Index
    return facet_counts(Index(spark, _facet_index_dir(spark, sf_dir)),
                        "spark join filter", "repo",
                        filters={"lang": "en"})


def q_facet_counts_range_filtered(spark, sf_dir):
    """§2.14 T25 — faceted navigation with a RANGE selection active:
    the lang histogram of the flagship query's match set restricted to
    n_chars ∈ [lo, hi]. The range spec compiles through the SAME
    operators/facets.resolve_filter_groups the scorer uses (trie node
    tags → 'any' presence mask inside the counting kernel), so filtered
    counts and filtered rankings can never disagree; the twin adds a
    plain length(text) BETWEEN predicate."""
    from .plans.facet_counts import facet_counts
    from .plans.query import Index
    return facet_counts(Index(spark, _facet_index_dir(spark, sf_dir)),
                        "spark join filter", "lang",
                        filters={"n_chars": {"range": [_RANGE_LO,
                                                       _RANGE_HI]}})


def q_range_counts(spark, sf_dir):
    """§2.14 T25 — binned numeric histogram over the match set (the
    search-UI size/date slider): counts per 256-wide n_chars bin for
    the flagship query, read STRAIGHT from the trie's level-8 presence
    tags (plans/facet_counts.range_counts) — every doc carries exactly
    one tag per level, so the level's tags are disjoint complete bins
    and no value enumeration happens. The twin bins with integer
    division (valid against the biased encoding because 2^shift divides
    2^63), certifying tag→bin arithmetic end to end."""
    from .plans.facet_counts import range_counts
    from .plans.query import Index
    return range_counts(Index(spark, _facet_index_dir(spark, sf_dir)),
                        "spark join filter", "n_chars", shift=8)


#: upsert pair: every doc_id % 10 == 0 gets a new version whose content
#: grows a marker term + one in-vocab term; query 2 proves only the new
#: versions carry the marker
UPSERT_SUFFIX = " upserted_marker sort"
UPSERT_QUERIES: list[tuple[int, str, int]] = [
    (0, "spark join filter", 10),
    (1, "group sort merge", 10),
    (2, "upserted_marker sort", 10),
]
_UPSERT_IDX_CACHE: dict[str, str] = {}


def _upsert_patch(spark, sf_dir):
    """The new versions: same (repo, path), NEW commit, patched content."""
    d = (spark.read.parquet(f"{sf_dir}/documents.parquet")
         .where(F.col("doc_id") % 10 == 0))
    return d.select(
        F.col("source").alias("repo"),
        F.concat(F.lit("doc/"), F.col("doc_id").cast("string"))
         .alias("path"),
        F.concat(F.lit("u"), F.sha2(F.col("doc_id").cast("string"), 256)
                 .substr(1, 39)).alias("commit"),
        F.col("lang"),
        F.concat(F.col("text"), F.lit(UPSERT_SUFFIX)).alias("content"))


def _upsert_index_dir(spark, sf_dir) -> str:
    """Build-then-upsert, from a pristine dir each process (upsert
    mutates; a stale dir from an earlier run must not leak state in)."""
    if sf_dir not in _UPSERT_IDX_CACHE:
        import shutil
        from .plans.build import build_index
        from .plans.upsert import upsert_docs
        out = os.path.join(tempfile.gettempdir(),
                           "donkey_upidx_" + sf_dir.strip("/").replace("/", "_"))
        shutil.rmtree(out, ignore_errors=True)
        build_index(spark, documents_as_corpus(spark, sf_dir), out)
        upsert_docs(spark, out, _upsert_patch(spark, sf_dir))
        _UPSERT_IDX_CACHE[sf_dir] = out
    return _UPSERT_IDX_CACHE[sf_dir]


def q_bm25_topk_upsert(spark, sf_dir):
    """r5 §2.14 — document upsert (plans/upsert.py): every tenth doc
    replaced by a new version (same repo/path, new commit, content +
    marker suffix) via epoch-append + key tombstones, then the flagship
    ranking protocol. Old versions must be invisible; stats stay frozen
    over base ∪ new (Lucene-between-merges) — which the twin replays by
    computing df/avgdl over ALL versions and filtering the dead ones
    only at ranking."""
    from .plans.query import Index
    idx = Index(spark, _upsert_index_dir(spark, sf_dir))
    res = idx.search_batch(UPSERT_QUERIES)
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("score"), 6)), F.asc("doc_id"))
    return (res.withColumn("rank", F.row_number().over(w))
            .select("query_id", "rank", "doc_id",
                    F.round(F.col("score"), 6).alias("score")))


def _upsert_oracle_sql() -> str:
    pre = f"""base AS (
  SELECT row_number() OVER (ORDER BY source, 'doc/'||CAST(doc_id AS VARCHAR))
         - 1 AS d, text, (doc_id % 10 = 0) AS dead FROM documents
), newd AS (
  SELECT (SELECT count(*) FROM documents)
         + row_number() OVER (ORDER BY source,
                              'doc/'||CAST(doc_id AS VARCHAR))
         - 1 AS d, text || '{UPSERT_SUFFIX}' AS text
  FROM documents WHERE doc_id % 10 = 0
), """
    return _bm25_oracle_sql(
        UPSERT_QUERIES,
        keep_sql="doc_id NOT IN (SELECT d FROM base WHERE dead)",
        pre_cte=pre,
        ordered_sql="SELECT d, text FROM base "
                    "UNION ALL SELECT d, text FROM newd")


def q_bm25_topk_facet_backfill(spark, sf_dir):
    """r5 §2.14 — facet backfill (plans/add_facet.py): a PLAIN index gets
    lang added as a facet after the fact (no rebuild — one presence-
    posting chunk from docs metadata), then runs the flagship set
    filtered to lang=en. Must equal the built-in-facet pair exactly:
    same oracle as bm25_topk_filtered."""
    from .plans.add_facet import add_facet
    from .plans.build import build_index
    from .plans.query import Index
    out = tempfile.mkdtemp(prefix="donkey_backfill_")
    build_index(spark, documents_as_corpus(spark, sf_dir), out)
    add_facet(spark, out, "lang")
    res = Index(spark, out).search_batch(BM25_QUERIES,
                                         filters={"lang": _FACET_LANG})
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("score"), 6)), F.asc("doc_id"))
    return (res.withColumn("rank", F.row_number().over(w))
            .select("query_id", "rank", "doc_id",
                    F.round(F.col("score"), 6).alias("score")))


def q_match_cardinality(spark, sf_dir):
    """r5 §2.14 T39 — the ES ``cardinality`` aggregation, exact
    (plans/facet_counts.match_cardinality): distinct repos and langs
    containing a match, for the flagship set (incl. the OOV query →
    all-zeros row on both engines), vs count(DISTINCT col) over the
    same match set in DuckDB."""
    from .plans.facet_counts import match_cardinality
    from .plans.query import Index
    idx = Index(spark, contract_index_dir(spark, sf_dir))
    rows = []
    for by in ("repo", "lang"):
        for qid, text, _k in BM25_QUERIES:
            r = match_cardinality(idx, text, by=by)
            rows.append((qid, by, r["n_docs"], r["n_values"],
                         r["cardinality"]))
    return spark.createDataFrame(
        rows, "query_id int, col string, n_docs long, n_values long, "
              "cardinality long")


def _match_cardinality_oracle_sql() -> str:
    """Cardinality twin: the OR match set per query joined to the
    (source AS repo, lang) key table; count(DISTINCT) per column with
    the zero rows of the OOV query preserved through the grid."""
    from .functions.tokenize import tokenize_py
    vals = ",\n  ".join(
        f"({qid}, '{t}')"
        for qid, text, _k in BM25_QUERIES
        for t in sorted(set(tokenize_py(text))))
    qids = ",".join(str(qid) for qid, _, _ in BM25_QUERIES)
    return f"""
WITH ordered AS (
  {_ORDERED_SQL}
), toks AS (
  SELECT d, unnest({_TOKS_SQL}) AS term FROM ordered
), dd AS (
  SELECT DISTINCT d, term FROM toks
), qset(query_id, term) AS (VALUES
  {vals}
), m AS (
  SELECT DISTINCT q.query_id, dd.d
  FROM qset q JOIN dd ON dd.term = q.term
), keys AS (
  SELECT row_number() OVER (ORDER BY source,
           'doc/'||CAST(doc_id AS VARCHAR)) - 1 AS d,
         source AS repo, lang FROM documents
), grid AS (
  SELECT q AS query_id, c AS col
  FROM unnest([{qids}]) AS t1(q), unnest(['repo', 'lang']) AS t2(c)
)
SELECT grid.query_id, grid.col,
       count(m.d)::BIGINT AS n_docs,
       count(CASE WHEN grid.col = 'repo' THEN keys.repo
                  ELSE keys.lang END)::BIGINT AS n_values,
       count(DISTINCT CASE WHEN grid.col = 'repo' THEN keys.repo
                           ELSE keys.lang END)::BIGINT AS cardinality
FROM grid
LEFT JOIN m ON m.query_id = grid.query_id
LEFT JOIN keys ON keys.d = m.d
GROUP BY 1, 2
"""


def q_percolate(spark, sf_dir):
    """r5 §2.14 T42 — percolation (plans/percolate.percolate): the
    flagship query set run as STORED queries against the corpus
    stream, one row per (doc, query) match under both modes, matched
    distinct-term counts included; one Catalyst-only pass (JVM
    tokenizer, broadcast query table, no index, no UDF), vs a DuckDB
    twin counting distinct matched tokens per (doc, query)."""
    from .plans.percolate import percolate
    corpus = documents_as_corpus(spark, sf_dir)
    qs = [(qid, text) for qid, text, _k in BM25_QUERIES]
    parts = [percolate(corpus, qs, mode=m).withColumn("mode", F.lit(m))
             for m in ("or", "and")]
    return (parts[0].unionByName(parts[1])
            .select("query_id", "mode", "repo", "path",
                    "n_terms_matched"))


def _percolate_oracle_sql() -> str:
    """Percolation twin: distinct (doc, token) pairs joined to the
    query-term VALUES, count(DISTINCT term) per (doc, query), kept at
    >= 1 for 'or' and = the query's term count for 'and'."""
    from .functions.tokenize import tokenize_py
    vals = ",\n  ".join(
        f"({qid}, '{t}', {len(set(tokenize_py(text)))})"
        for qid, text, _k in BM25_QUERIES
        for t in sorted(set(tokenize_py(text))))
    return f"""
WITH ordered AS (
  SELECT source AS repo, 'doc/'||CAST(doc_id AS VARCHAR) AS path, text
  FROM documents
), toks AS (
  SELECT repo, path, unnest({_TOKS_SQL}) AS term FROM ordered
), dd AS (
  SELECT DISTINCT repo, path, term FROM toks
), qset(query_id, term, nt) AS (VALUES
  {vals}
), counted AS (
  SELECT q.query_id, dd.repo, dd.path,
         count(DISTINCT dd.term)::BIGINT AS n_terms_matched,
         max(q.nt) AS nt
  FROM qset q JOIN dd ON dd.term = q.term
  GROUP BY 1, 2, 3
)
SELECT query_id, 'or' AS mode, repo, path, n_terms_matched
FROM counted
UNION ALL
SELECT query_id, 'and' AS mode, repo, path, n_terms_matched
FROM counted WHERE n_terms_matched = nt
"""


RESCORE_WINDOW, RESCORE_QW, RESCORE_FW = 50, 1.0, 0.01


def q_bm25_topk_rescored(spark, sf_dir):
    """r5 §2.14 T41 — rescore window (plans/rescore.rescore_rows):
    the flagship set's top-50 primary candidates re-ranked by
    1.0·bm25 + 0.01·dl (the function_score field-value-factor shape),
    top-k of the window, vs a DuckDB twin applying the identical
    combine to its own ranked-CTE window."""
    from .plans.query import Index
    from .plans.rescore import rescore_rows
    idx = Index(spark, contract_index_dir(spark, sf_dir))
    rows = rescore_rows(idx, BM25_QUERIES, window=RESCORE_WINDOW,
                        by="dl", query_weight=RESCORE_QW,
                        field_weight=RESCORE_FW)
    df = spark.createDataFrame(
        [(qid, d, s) for qid, _rk, d, s, _b, _r, _p in rows],
        "query_id int, doc_id long, score double")
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("score"), 6)), F.asc("doc_id"))
    return (df.withColumn("rank", F.row_number().over(w))
            .select("query_id", "rank", "doc_id",
                    F.round(F.col("score"), 6).alias("score")))


def _rescore_oracle_sql() -> str:
    """Rescore twin: the ordinary scored CTE cut at the window on the
    rounded primary rank, combined with dl2's token count (== the
    engine's stored dl) under the same weights, re-ranked rounded."""
    from .functions.tokenize import tokenize_py
    vals = ",\n  ".join(
        f"({qid}, '{t}', {k})"
        for qid, text, k in BM25_QUERIES
        for t in sorted(set(tokenize_py(text))))
    return f"""
WITH ordered AS (
  {_ORDERED_SQL}
), toks AS (
  SELECT d, unnest({_TOKS_SQL}) AS term FROM ordered
), dt AS (
  SELECT d, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2
), dl2 AS (
  SELECT d, count(*)::BIGINT AS dl FROM toks GROUP BY 1
), stats AS (
  SELECT (SELECT count(*) FROM ordered) AS n,
         (SELECT COALESCE(sum(dl), 0)::DOUBLE
                 / (SELECT count(*) FROM ordered) FROM dl2) AS avgdl
), dfreq AS (
  SELECT term, count(*)::BIGINT AS df FROM dt GROUP BY 1
), qset(query_id, term, k) AS (VALUES
  {vals}
), scored AS (
  SELECT q.query_id, q.k, dt.d AS doc_id,
         sum( ln(1 + (s.n - f.df + 0.5) / (f.df + 0.5))
              * dt.tf * 2.2
              / (dt.tf + 1.2 * (1 - 0.75 + 0.75 * dl2.dl / s.avgdl)) )
         AS score
  FROM qset q JOIN dt ON dt.term = q.term
  JOIN dfreq f ON f.term = q.term
  JOIN dl2 ON dl2.d = dt.d, stats s
  GROUP BY 1, 2, 3
), win AS (
  SELECT query_id, k, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY ROUND(score, 6) DESC, doc_id ASC)
           AS rn
  FROM scored
), resc AS (
  SELECT win.query_id, win.k, win.doc_id,
         {RESCORE_QW!r} * win.score + {RESCORE_FW!r} * dl2.dl AS final
  FROM win JOIN dl2 ON dl2.d = win.doc_id
  WHERE win.rn <= {RESCORE_WINDOW}
), ranked AS (
  SELECT query_id, doc_id, ROUND(final, 6) AS score, k,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY ROUND(final, 6) DESC, doc_id ASC)
           AS rank
  FROM resc
)
SELECT query_id, rank::INT AS rank, doc_id, score
FROM ranked WHERE rank <= k
"""


SIG_K = 15


def q_significant_terms(spark, sf_dir):
    """r5 §2.14 T40 — the ES ``significant_terms`` aggregation
    (plans/sigterms.significant_terms): the JLH-scored characteristic
    vocabulary of each flagship query's match set (foreground lift
    over corpus df), top-15 per query, OOV query contributing zero
    rows, vs a from-first-principles DuckDB twin sharing the dd/dfreq
    CTEs."""
    from .plans.query import Index
    from .plans.sigterms import significant_terms
    idx = Index(spark, contract_index_dir(spark, sf_dir))
    rows = [(qid, t, fg, bg, s)
            for qid, text, _k in BM25_QUERIES
            for t, fg, bg, s in significant_terms(idx, text, k=SIG_K)]
    df = spark.createDataFrame(
        rows, "query_id int, term string, fg long, bg long, "
              "score double")
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("score"), 6)), F.asc("term"))
    return (df.withColumn("rank", F.row_number().over(w))
            .select("query_id", "rank", "term", "fg", "bg",
                    F.round(F.col("score"), 6).alias("score")))


def _significant_terms_oracle_sql() -> str:
    """JLH twin: p_fg = fg/n_fg vs p_bg = df/N over the same distinct
    (doc, term) CTE the count pairs use; only overrepresented terms
    (p_fg > p_bg) rank, (score desc, term asc) ordered, top-SIG_K."""
    from .functions.tokenize import tokenize_py
    vals = ",\n  ".join(
        f"({qid}, '{t}')"
        for qid, text, _k in BM25_QUERIES
        for t in sorted(set(tokenize_py(text))))
    return f"""
WITH ordered AS (
  {_ORDERED_SQL}
), toks AS (
  SELECT d, unnest({_TOKS_SQL}) AS term FROM ordered
), dd AS (
  SELECT DISTINCT d, term FROM toks
), qset(query_id, term) AS (VALUES
  {vals}
), m AS (
  SELECT DISTINCT q.query_id, dd.d
  FROM qset q JOIN dd ON dd.term = q.term
), nf AS (
  SELECT query_id, count(*)::BIGINT AS n_fg FROM m GROUP BY 1
), dfreq AS (
  SELECT term, count(*)::BIGINT AS df FROM dd GROUP BY 1
), tot AS (
  SELECT count(*)::BIGINT AS n FROM ordered
), fg AS (
  SELECT m.query_id, dd.term, count(*)::BIGINT AS fg
  FROM dd JOIN m ON dd.d = m.d GROUP BY 1, 2
), scored AS (
  SELECT fg.query_id, fg.term, fg.fg, dfreq.df AS bg,
         (fg.fg / CAST(nf.n_fg AS DOUBLE)
            - dfreq.df / CAST(tot.n AS DOUBLE))
         * ((fg.fg / CAST(nf.n_fg AS DOUBLE))
            / (dfreq.df / CAST(tot.n AS DOUBLE))) AS score
  FROM fg JOIN nf USING (query_id) JOIN dfreq USING (term), tot
  WHERE fg.fg / CAST(nf.n_fg AS DOUBLE)
        > dfreq.df / CAST(tot.n AS DOUBLE)
), ranked AS (
  SELECT query_id, term, fg, bg, ROUND(score, 6) AS score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY ROUND(score, 6) DESC, term ASC)
           AS rank
  FROM scored
)
SELECT query_id, rank::INT AS rank, term, fg, bg, score
FROM ranked WHERE rank <= {SIG_K}
"""


def q_match_counts(spark, sf_dir):
    """r5 §2.14 — total hits (plans/facet_counts.match_count): the
    "About 1,204 results" number, for the flagship set under BOTH
    match modes. Counts run in the facet-histogram kernel with zero
    tags — one pruned segment scan per call, match sets living only as
    per-salt int64 arrays, one (salt)-row aggregate out; never a scored
    materialization. The OOV query counts 0 in both modes; the AND
    count requires EVERY query term live (frozen-stats semantics
    shared with search)."""
    from .plans.facet_counts import match_count
    from .plans.query import Index
    idx = Index(spark, contract_index_dir(spark, sf_dir))
    rows = [(qid, m, match_count(idx, text, mode=m))
            for m in ("or", "and")
            for qid, text, _k in BM25_QUERIES]
    return spark.createDataFrame(
        rows, "query_id int, mode string, n_matches long")


def q_bm25_topk_synonyms(spark, sf_dir):
    """§2.14 T44 — synonym queries (the Lucene SynonymQuery construct):
    a query token with a SYNONYMS_MAP entry scores as ONE blended
    clause over {token} ∪ synonyms — per doc the members' tfs SUM
    before the BM25 saturation (kernels/wand.SynGroup), under one idf
    from the MAX member df (Lucene's docFreq blend) — never as
    independent per-term clauses. The DuckDB twin computes the same
    group arithmetic from first principles: summed tf per (doc,
    group), max df per group, one saturation per group."""
    from .plans.query import Index
    idx = Index(spark, contract_index_dir(spark, sf_dir))
    return _rank_rows(spark, idx.search_rows(BM25_SYN_QUERIES,
                                             synonyms=SYNONYMS_MAP))


def q_bm25_topk_synonyms_sharded(spark, sf_dir):
    """§2.14 T44+T21 — synonym queries over the FEDERATION: members
    join the global stats probe, so every shard's blended group idf
    comes from the SAME Σ-shard max-member df a unified index uses;
    compared against the SAME unified synonyms oracle,
    key-identified."""
    from .plans.query import Index
    from .plans.sharded import search_rows_sharded
    shards = [Index(spark, d) for d in contract_shard_dirs(spark, sf_dir)]
    rows = search_rows_sharded(shards, BM25_SYN_QUERIES,
                               synonyms=SYNONYMS_MAP)
    return _rank_sharded_rows(spark, rows)


def _synonyms_oracle_sql(queries, synonyms) -> str:
    """The SynonymQuery twin: qset carries a GROUP column (plain term →
    its own group; a mapped token → one group row per member), then
    per (doc, query, group) the member tfs SUM, the group df is the
    MAX member df, and ONE BM25 saturation applies per group — the
    uniform arithmetic that reduces to the flagship oracle's when
    every group is a singleton."""
    from .functions.tokenize import tokenize_py
    from .plans.query import _normalize_synonyms
    syn_map = _normalize_synonyms(synonyms, "or", None)
    rows = []
    for qid, text, k in queries:
        for t in sorted(set(tokenize_py(text))):
            for m in syn_map.get(t, [t]):
                rows.append(f"({qid}, '{t}', '{m}', {k})")
    vals = ",\n  ".join(rows)
    return f"""
WITH ordered AS (
  {_ORDERED_SQL}
), toks AS (
  SELECT d, unnest({_TOKS_SQL}) AS term FROM ordered
), dt AS (
  SELECT d, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2
), dl2 AS (
  SELECT d, count(*)::BIGINT AS dl FROM toks GROUP BY 1
), stats AS (
  SELECT (SELECT count(*) FROM ordered) AS n,
         (SELECT COALESCE(sum(dl), 0)::DOUBLE
                 / (SELECT count(*) FROM ordered) FROM dl2) AS avgdl
), dfreq AS (
  SELECT term, count(*)::BIGINT AS df FROM dt GROUP BY 1
), qset(query_id, grp, term, k) AS (VALUES
  {vals}
), gdf AS (
  SELECT q.query_id, q.grp, max(f.df) AS df
  FROM (SELECT DISTINCT query_id, grp, term FROM qset) q
  JOIN dfreq f ON f.term = q.term
  GROUP BY 1, 2
), gtf AS (
  SELECT q.query_id, q.grp, dt.d, sum(dt.tf)::BIGINT AS tf,
         max(q.k) AS k
  FROM (SELECT DISTINCT query_id, grp, term, k FROM qset) q
  JOIN dt ON dt.term = q.term
  GROUP BY 1, 2, 3
), scored AS (
  SELECT gtf.query_id, gtf.k, gtf.d AS doc_id,
         sum( ln(1 + (s.n - g.df + 0.5) / (g.df + 0.5))
              * gtf.tf * 2.2
              / (gtf.tf + 1.2 * (1 - 0.75 + 0.75 * dl2.dl / s.avgdl)) )
         AS score
  FROM gtf JOIN gdf g ON g.query_id = gtf.query_id AND g.grp = gtf.grp
  JOIN dl2 ON dl2.d = gtf.d, stats s
  GROUP BY 1, 2, 3
), ranked AS (
  SELECT scored.query_id, scored.doc_id,
         ROUND(scored.score, 6) AS score,
         row_number() OVER (PARTITION BY scored.query_id
                            ORDER BY ROUND(scored.score, 6) DESC,
                                     scored.doc_id ASC)
         AS rank, scored.k
  FROM scored
)
SELECT query_id, rank::INT AS rank, doc_id, score
FROM ranked
WHERE rank <= k
"""


def q_match_counts_pattern(spark, sf_dir):
    """r5 §2.14 T43×T27 — total hits under ``mode="pattern"``: the
    grep-then-count shape of a source-code pipeline ("how many files
    match /jo(in|urnal)/ …"). Pattern atoms expand against the
    dictionary exactly as search expands them
    (plans/facet_counts._expand_pattern_text, default cap), then the
    count runs the plain OR kernel; the DuckDB twin re-derives the
    expansion per kind (starts_with / levenshtein / LIKE / the SAME
    anchored regexp) over its recomputed dfreq with the same rank and
    cap, and counts distinct docs containing any literal-or-expanded
    term — zero counts preserved through the query grid."""
    from .plans.facet_counts import match_count
    from .plans.query import Index
    idx = Index(spark, contract_index_dir(spark, sf_dir))
    rows = [(qid, match_count(idx, text, mode="pattern"))
            for qid, text, _k in BM25_PATTERN_COUNT_QUERIES]
    return spark.createDataFrame(rows, "query_id int, n_matches long")


def _match_counts_pattern_oracle_sql() -> str:
    """Pattern-count twin: expansion re-derived per kind over the
    from-first-principles dfreq (same rank/cap as the engine's default
    MAX_TERM_EXPANSIONS), docs counted once per query over
    literal ∪ expanded terms."""
    from .config import MAX_TERM_EXPANSIONS
    from .functions.patterns import (parse_pattern_text, regexp_anchor,
                                     wildcard_to_like)
    from .functions.tokenize import tokenize_py
    lit_rows, pat_rows, qids = [], [], []
    for qid, text, _k in BM25_PATTERN_COUNT_QUERIES:
        qids.append(f"({qid})")
        lit_text, pats = parse_pattern_text(text)
        lit_rows.extend(f"({qid}, '{t}')"
                        for t in sorted(set(tokenize_py(lit_text))))
        for kind, base, dist in pats:
            pat = (wildcard_to_like(base) if kind == "wildcard"
                   else regexp_anchor(base) if kind == "regexp"
                   else base)
            pat_rows.append(f"({qid}, '{kind[0]}', '{pat}', {dist})")
    return f"""
WITH ordered AS (
  {_ORDERED_SQL}
), toks AS (
  SELECT d, unnest({_TOKS_SQL}) AS term FROM ordered
), dd AS (
  SELECT DISTINCT d, term FROM toks
), dfreq AS (
  SELECT term, count(*)::BIGINT AS df FROM dd GROUP BY 1
), qlit(query_id, term) AS (VALUES
  {",".join(lit_rows)}
), qpat(query_id, kind, pat, dist) AS (VALUES
  {",".join(pat_rows)}
), qexp AS (
  SELECT p.query_id, f.term,
         row_number() OVER (
           PARTITION BY p.query_id, p.kind, p.pat, p.dist
           ORDER BY f.df DESC, f.term) AS rn
  FROM qpat p JOIN dfreq f ON
       (p.kind = 'p' AND starts_with(f.term, p.pat))
    OR (p.kind = 'f' AND levenshtein(f.term, p.pat) <= p.dist)
    OR (p.kind = 'w' AND f.term LIKE p.pat ESCAPE '\\')
    OR (p.kind = 'r' AND regexp_matches(f.term, p.pat))
), qset AS (
  SELECT query_id, term FROM qlit
  UNION
  SELECT query_id, term FROM qexp WHERE rn <= {MAX_TERM_EXPANSIONS}
), per AS (
  SELECT DISTINCT q.query_id, dd.d
  FROM qset q JOIN dd ON dd.term = q.term
), qids(query_id) AS (VALUES {",".join(qids)})
SELECT qids.query_id, COALESCE(c.n, 0)::BIGINT AS n_matches
FROM qids LEFT JOIN (
  SELECT query_id, count(*)::BIGINT AS n FROM per GROUP BY 1
) c ON c.query_id = qids.query_id
"""


def _match_counts_oracle_sql() -> str:
    """Count twin: docs containing ANY ('or') / EVERY ('and') distinct
    query term, 0 rows preserved through the (query, mode) grid."""
    from .functions.tokenize import tokenize_py
    vals = ",\n  ".join(
        f"({qid}, '{t}')"
        for qid, text, _k in BM25_QUERIES
        for t in sorted(set(tokenize_py(text))))
    return f"""
WITH ordered AS (
  {_ORDERED_SQL}
), toks AS (
  SELECT d, unnest({_TOKS_SQL}) AS term FROM ordered
), dd AS (
  SELECT DISTINCT d, term FROM toks
), qset(query_id, term) AS (VALUES
  {vals}
), qn AS (
  SELECT query_id, count(DISTINCT term) AS nt FROM qset GROUP BY 1
), per AS (
  SELECT q.query_id, dd.d, count(DISTINCT dd.term) AS nm
  FROM qset q JOIN dd ON dd.term = q.term
  GROUP BY 1, 2
), orc AS (
  SELECT query_id, count(*)::BIGINT AS n FROM per GROUP BY 1
), andc AS (
  SELECT per.query_id, count(*)::BIGINT AS n
  FROM per JOIN qn ON qn.query_id = per.query_id
  WHERE per.nm = qn.nt GROUP BY 1
), grid AS (
  SELECT query_id, 'or' AS mode FROM qn
  UNION ALL SELECT query_id, 'and' FROM qn
)
SELECT grid.query_id, grid.mode,
       COALESCE(CASE WHEN grid.mode = 'or' THEN orc.n ELSE andc.n END,
                0)::BIGINT AS n_matches
FROM grid
LEFT JOIN orc ON orc.query_id = grid.query_id
LEFT JOIN andc ON andc.query_id = grid.query_id
"""


def q_match_stats(spark, sf_dir):
    """r5 §2.14 — stats aggregation over the match set
    (plans/facet_counts.match_stats, the ES `stats` agg): min / max /
    sum / count of document length over everything matching each
    flagship query, under BOTH match modes, WITHOUT materializing the
    match set. n_docs is the same number match_count reports (same
    per-salt kernel); the doc-values read is the memoized (doc_id, dl)
    pair sort-by-field shares within the local budget, a column-pruned
    docs join above it. avg is rounded Spark-side (F.round, HALF_UP —
    the same convention every score column uses against DuckDB)."""
    from .plans.facet_counts import match_stats
    from .plans.query import Index
    idx = Index(spark, contract_index_dir(spark, sf_dir))
    rows = [(qid, m, *(lambda s: (
                s["n_docs"], s["n_values"], s["sum"], s["min"],
                s["max"]))(match_stats(idx, text, by="dl", mode=m)))
            for m in ("or", "and")
            for qid, text, _k in BM25_QUERIES]
    df = spark.createDataFrame(
        rows, "query_id int, mode string, n_docs long, n_values long, "
              "sum_dl long, min_dl long, max_dl long")
    return df.withColumn(
        "avg_dl",
        F.when(F.col("n_values") > 0,
               F.round(F.col("sum_dl") / F.col("n_values"), 6)))


#: match-docs export pairs run a subset of the flagship set (incl. the
#: OOV query 5, whose export must be EMPTY on both engines)
_EXPORT_QIDS = (0, 2, 5)


def q_match_docs(spark, sf_dir):
    """r5 §2.14 — bulk match-set export
    (plans/facet_counts.match_docs): EVERY doc matching each query, as
    a distributed metadata frame (doc_id, repo, path, lang, dl), under
    both match modes — the training-pipeline feed. The twin re-derives
    the same per-doc rows from first principles; the OOV query's
    export is empty on both engines."""
    from .plans.facet_counts import match_docs
    from .plans.query import Index
    idx = Index(spark, contract_index_dir(spark, sf_dir))
    out = None
    for m in ("or", "and"):
        for qid, text, _k in BM25_QUERIES:
            if qid not in _EXPORT_QIDS:
                continue
            df = (match_docs(idx, text, mode=m,
                             columns=("doc_id", "repo", "path",
                                      "lang", "dl"))
                  .select(F.lit(qid).alias("query_id"),
                          F.lit(m).alias("mode"), "*"))
            out = df if out is None else out.unionByName(df)
    return out


def _match_docs_oracle_sql() -> str:
    """Export twin: the match sets (same CTE chain as the stats pair)
    joined back to the documents view's identity/metadata columns and
    the recomputed dl — one row per (query, mode, matching doc)."""
    from .functions.tokenize import tokenize_py
    vals = ",\n  ".join(
        f"({qid}, '{t}')"
        for qid, text, _k in BM25_QUERIES if qid in _EXPORT_QIDS
        for t in sorted(set(tokenize_py(text))))
    return f"""
WITH ordered AS (
  SELECT row_number() OVER (ORDER BY source,
                            'doc/'||CAST(doc_id AS VARCHAR)) - 1 AS d,
         text, lang, source AS repo,
         'doc/'||CAST(doc_id AS VARCHAR) AS path
  FROM documents
), base AS (
  SELECT d, repo, path, lang, len({_TOKS_SQL})::BIGINT AS dl
  FROM ordered
), dd AS (
  SELECT DISTINCT d, term FROM (
    SELECT d, unnest({_TOKS_SQL}) AS term FROM ordered)
), qset(query_id, term) AS (VALUES
  {vals}
), qn AS (
  SELECT query_id, count(DISTINCT term) AS nt FROM qset GROUP BY 1
), per AS (
  SELECT q.query_id, dd.d, count(DISTINCT dd.term) AS nm
  FROM qset q JOIN dd ON dd.term = q.term
  GROUP BY 1, 2
), m AS (
  SELECT 'or' AS mode, query_id, d FROM per
  UNION ALL
  SELECT 'and' AS mode, per.query_id, per.d
  FROM per JOIN qn USING (query_id) WHERE per.nm = qn.nt
)
SELECT m.query_id::INT AS query_id, m.mode,
       m.d::BIGINT AS doc_id, base.repo, base.path, base.lang, base.dl
FROM m JOIN base USING (d)
"""


_PCT_QS = (0.25, 0.5, 0.75, 0.95)


def q_match_percentiles(spark, sf_dir):
    """r5 §2.14 — EXACT percentiles over the match set
    (plans/facet_counts.match_percentiles, the ES `percentiles` agg):
    the p25/p50/p75/p95 of document length over everything matching
    each flagship query, under BOTH match modes, without
    materializing the match set — linear interpolation at rank
    q·(n−1), the convention numpy, Spark's exact `percentile` and
    DuckDB's `quantile_cont` share, which is what lets the twin be
    value-exact. Empty/OOV match sets surface as 0-count NULL rows
    through the same grid as the stats pair."""
    from .plans.facet_counts import match_percentiles
    from .plans.query import Index
    idx = Index(spark, contract_index_dir(spark, sf_dir))
    rows = []
    for m in ("or", "and"):
        for qid, text, _k in BM25_QUERIES:
            s = match_percentiles(idx, text, by="dl", qs=_PCT_QS, mode=m)
            rows.append((qid, m, s["n_docs"], s["n_values"],
                         *(s["percentiles"][q] for q in _PCT_QS)))
    df = spark.createDataFrame(
        rows, "query_id int, mode string, n_docs long, n_values long, "
              "p25 double, p50 double, p75 double, p95 double")
    return df.select("query_id", "mode", "n_docs", "n_values",
                     *[F.round(F.col(c), 6).alias(c)
                       for c in ("p25", "p50", "p75", "p95")])


def _match_percentiles_oracle_sql() -> str:
    """Percentiles twin: the match_stats oracle's match sets joined to
    the first-principles dl, aggregated with quantile_cont; the
    (query, mode) grid preserves empty match sets as 0-count/NULL
    rows."""
    from .functions.tokenize import tokenize_py
    vals = ",\n  ".join(
        f"({qid}, '{t}')"
        for qid, text, _k in BM25_QUERIES
        for t in sorted(set(tokenize_py(text))))
    pcols = ",\n         ".join(
        f"round(quantile_cont(dl, {q}), 6)::DOUBLE AS p{int(q * 100)}"
        for q in _PCT_QS)
    return f"""
WITH ordered AS (
  {_ORDERED_SQL}
), base AS (
  SELECT d, len({_TOKS_SQL})::BIGINT AS dl FROM ordered
), dd AS (
  SELECT DISTINCT d, term FROM (
    SELECT d, unnest({_TOKS_SQL}) AS term FROM ordered)
), qset(query_id, term) AS (VALUES
  {vals}
), qn AS (
  SELECT query_id, count(DISTINCT term) AS nt FROM qset GROUP BY 1
), per AS (
  SELECT q.query_id, dd.d, count(DISTINCT dd.term) AS nm
  FROM qset q JOIN dd ON dd.term = q.term
  GROUP BY 1, 2
), m AS (
  SELECT 'or' AS mode, query_id, d FROM per
  UNION ALL
  SELECT 'and' AS mode, per.query_id, per.d
  FROM per JOIN qn USING (query_id) WHERE per.nm = qn.nt
), agg AS (
  SELECT query_id, mode,
         count(*)::BIGINT AS n_docs, count(dl)::BIGINT AS n_values,
         {pcols}
  FROM m JOIN base USING (d) GROUP BY 1, 2
), grid AS (
  SELECT query_id, 'or' AS mode FROM qn
  UNION ALL SELECT query_id, 'and' FROM qn
)
SELECT grid.query_id, grid.mode,
       COALESCE(agg.n_docs, 0)::BIGINT AS n_docs,
       COALESCE(agg.n_values, 0)::BIGINT AS n_values,
       agg.p25, agg.p50, agg.p75, agg.p95
FROM grid LEFT JOIN agg USING (query_id, mode)
"""


def _match_stats_oracle_sql() -> str:
    """Stats twin: the match_counts match sets joined to the
    first-principles dl, aggregated; the (query, mode) grid preserves
    empty match sets as 0-count / NULL-stat rows."""
    from .functions.tokenize import tokenize_py
    vals = ",\n  ".join(
        f"({qid}, '{t}')"
        for qid, text, _k in BM25_QUERIES
        for t in sorted(set(tokenize_py(text))))
    return f"""
WITH ordered AS (
  SELECT row_number() OVER (ORDER BY source,
                            'doc/'||CAST(doc_id AS VARCHAR)) - 1 AS d,
         text
  FROM documents
), base AS (
  SELECT d, len({_TOKS_SQL})::BIGINT AS dl FROM ordered
), dd AS (
  SELECT DISTINCT d, term FROM (
    SELECT d, unnest({_TOKS_SQL}) AS term FROM ordered)
), qset(query_id, term) AS (VALUES
  {vals}
), qn AS (
  SELECT query_id, count(DISTINCT term) AS nt FROM qset GROUP BY 1
), per AS (
  SELECT q.query_id, dd.d, count(DISTINCT dd.term) AS nm
  FROM qset q JOIN dd ON dd.term = q.term
  GROUP BY 1, 2
), m AS (
  SELECT 'or' AS mode, query_id, d FROM per
  UNION ALL
  SELECT 'and' AS mode, per.query_id, per.d
  FROM per JOIN qn USING (query_id) WHERE per.nm = qn.nt
), agg AS (
  SELECT query_id, mode,
         count(*)::BIGINT AS n_docs, count(dl)::BIGINT AS n_values,
         sum(dl)::BIGINT AS sum_dl, min(dl)::BIGINT AS min_dl,
         max(dl)::BIGINT AS max_dl,
         round(sum(dl) / count(dl), 6)::DOUBLE AS avg_dl
  FROM m JOIN base USING (d) GROUP BY 1, 2
), grid AS (
  SELECT query_id, 'or' AS mode FROM qn
  UNION ALL SELECT query_id, 'and' FROM qn
)
SELECT grid.query_id, grid.mode,
       COALESCE(agg.n_docs, 0)::BIGINT AS n_docs,
       COALESCE(agg.n_values, 0)::BIGINT AS n_values,
       agg.sum_dl, agg.min_dl, agg.max_dl, agg.avg_dl
FROM grid LEFT JOIN agg USING (query_id, mode)
"""


def q_sorted_topk(spark, sf_dir):
    """r5 §2.14 — sort-by-field search (plans/sortby.sorted_topk, the
    ES `sort` clause): the flagship query's match set ordered by
    document length instead of BM25 score, under BOTH match modes.
    The match set comes from the same pruned per-salt kernel as
    match_count/match_ids; the order comes from a column-pruned docs
    join + TakeOrderedAndProject — scores never computed. The oracle
    recomputes match + dl + ordering from first principles."""
    from .plans.query import Index
    from .plans.sortby import sorted_topk
    idx = Index(spark, contract_index_dir(spark, sf_dir))
    rows = [(m,) + r for m in ("or", "and")
            for r in sorted_topk(idx, BM25_QUERIES[0][1], by="dl",
                                 k=20, descending=True, mode=m)]
    return spark.createDataFrame(
        rows, "mode string, rank int, doc_id long, dl long, "
              "repo string, path string")


def q_sorted_topk_sharded(spark, sf_dir):
    """r5 §2.14 — the federated twin (plans/sharded.sorted_topk_sharded)
    vs the SAME unified-corpus oracle: sharding must be invisible to a
    field ordering. No doc_id in the output (a federation has no global
    id; (repo, path) is the identity), and no stats phase exists — a
    field order has no corpus-global inputs."""
    from .plans.query import Index
    from .plans.sharded import sorted_topk_sharded
    shards = [Index(spark, d) for d in contract_shard_dirs(spark, sf_dir)]
    rows = [(m, rk, key, repo, path) for m in ("or", "and")
            for rk, _si, _did, key, repo, path in
            sorted_topk_sharded(shards, BM25_QUERIES[0][1], by="dl",
                                k=20, descending=True, mode=m)]
    return spark.createDataFrame(
        rows, "mode string, rank int, dl long, repo string, path string")


def _sorted_oracle_sql(with_doc_id: bool) -> str:
    """Field-sort twin: docs containing ANY ('or') / EVERY ('and')
    flagship-query term, ordered dl DESC with the doc_id (== (repo,
    path) by dense-id construction) tie-break, top 20 per mode."""
    from .functions.tokenize import tokenize_py
    terms = sorted(set(tokenize_py(BM25_QUERIES[0][1])))
    vals = ", ".join(f"('{t}')" for t in terms)
    cols = ("mode, rank, d AS doc_id, dl, repo, path" if with_doc_id
            else "mode, rank, dl, repo, path")
    return f"""
WITH ordered AS (
  SELECT row_number() OVER (ORDER BY source,
                            'doc/'||CAST(doc_id AS VARCHAR)) - 1 AS d,
         source AS repo, 'doc/'||CAST(doc_id AS VARCHAR) AS path, text
  FROM documents
), base AS (
  SELECT d, repo, path, len({_TOKS_SQL})::BIGINT AS dl FROM ordered
), dd AS (
  SELECT DISTINCT d, term FROM (
    SELECT d, unnest({_TOKS_SQL}) AS term FROM ordered)
), qt(term) AS (VALUES {vals}),
m_or AS (SELECT DISTINCT d FROM dd JOIN qt USING (term)),
m_and AS (SELECT d FROM dd JOIN qt USING (term)
          GROUP BY d HAVING count(DISTINCT term) = {len(terms)}),
merged AS (
  SELECT 'or' AS mode, row_number() OVER (
           ORDER BY dl DESC, d ASC)::INT AS rank, d, dl, repo, path
  FROM base JOIN m_or USING (d)
  UNION ALL
  SELECT 'and' AS mode, row_number() OVER (
           ORDER BY dl DESC, d ASC)::INT AS rank, d, dl, repo, path
  FROM base JOIN m_and USING (d)
)
SELECT {cols} FROM merged WHERE rank <= 20
"""


#: did-you-mean probe set — misspellings of common document-prose
#: terms, plus one ("zzqx") with no dictionary term within distance 2
#: (zero rows on both engines)
SUGGEST_PROBES = ["tabel", "joun", "filtr", "windw", "zzqx"]


def q_term_suggest(spark, sf_dir):
    """r5 §2.14 — spell suggestions (Index.suggest, the Lucene
    DirectSpellChecker analog): for each probe, the 5 dictionary terms
    within edit distance 2 ranked (distance ASC, df DESC, term ASC) —
    closer beats more-frequent, frequency breaks distance ties, the
    probe never suggests itself. One length-banded dictionary
    term-column scan per probe (memoized; facet sentinels excluded),
    never touching segments. The DuckDB twin re-derives the ranking
    with its own levenshtein over the recomputed dfreq, so the
    distance function, ordering, and cap are all certified."""
    from .plans.query import Index
    idx = Index(spark, contract_index_dir(spark, sf_dir))
    rows = [(p, r + 1, t, d, df)
            for p in SUGGEST_PROBES
            for r, (t, d, df) in enumerate(idx.suggest(p, k=5))]
    return spark.createDataFrame(
        rows, "probe string, rank int, suggestion string, "
              "dist int, df long")


def _term_suggest_oracle_sql() -> str:
    vals = ",\n  ".join(f"('{p}')" for p in SUGGEST_PROBES)
    return f"""
WITH ordered AS (
  {_ORDERED_SQL}
), toks AS (
  SELECT d, unnest({_TOKS_SQL}) AS term FROM ordered
), dt AS (
  SELECT d, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2
), dfreq AS (
  SELECT term, count(*)::BIGINT AS df FROM dt GROUP BY 1
), probes(probe) AS (VALUES
  {vals}
), cand AS (
  SELECT p.probe, f.term, levenshtein(p.probe, f.term) AS dist, f.df
  FROM probes p JOIN dfreq f
    ON f.term <> p.probe AND levenshtein(p.probe, f.term) <= 2
), ranked AS (
  SELECT probe, term AS suggestion, dist, df,
         row_number() OVER (PARTITION BY probe
                            ORDER BY dist, df DESC, term) AS rnk
  FROM cand
)
SELECT probe, rnk::INT AS rank, suggestion, dist::INT AS dist, df
FROM ranked WHERE rnk <= 5
"""


def q_bm25_topk_range_backfill(spark, sf_dir):
    """r5 §2.14 — range-facet backfill (plans/add_facet.add_range_facet):
    a PLAIN index gets n_chars added as a RANGE facet after the fact
    (one trie-presence-posting chunk from caller values — no rebuild,
    no content pass), then runs the flagship set restricted to
    n_chars ∈ [200, 400]. Must equal the built-in range pair exactly:
    same oracle as bm25_topk_range."""
    from .plans.add_facet import add_range_facet
    from .plans.build import build_index
    from .plans.query import Index
    out = tempfile.mkdtemp(prefix="donkey_rbackfill_")
    corpus = documents_as_corpus(spark, sf_dir)
    build_index(spark, corpus, out)
    docs = spark.read.parquet(f"{out}/docs")
    vals = (docs.select("doc_id", "repo", "path", "commit")
            .join(corpus.select("repo", "path", "commit",
                                F.length("content").alias("value")),
                  ["repo", "path", "commit"])
            .select("doc_id", "value"))
    add_range_facet(spark, out, "n_chars", values=vals)
    res = Index(spark, out).search_batch(
        BM25_QUERIES,
        filters={"n_chars": {"range": [_RANGE_LO, _RANGE_HI]}})
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("score"), 6)), F.asc("doc_id"))
    return (res.withColumn("rank", F.row_number().over(w))
            .select("query_id", "rank", "doc_id",
                    F.round(F.col("score"), 6).alias("score")))


#: snippet window — tokens of context either side of the matched term
SNIPPET_WINDOW = 3


def q_search_snippets(spark, sf_dir):
    """r5 §2.14 — result snippets (plans/snippets.py): the flagship
    query set with, per hit, the ±3-token window around the first
    occurrence of its rarest matched term, fetched from the source
    corpus via a pushed-down repo/path scan (no content in the index).
    Re-ranked by rounded score like the flagship pair; the OOV query
    contributes zero rows on both engines."""
    from .plans.query import Index
    from .plans.snippets import search_snippets
    idx = Index(spark, contract_index_dir(spark, sf_dir))
    res = search_snippets(idx, documents_as_corpus(spark, sf_dir),
                          BM25_QUERIES, window=SNIPPET_WINDOW)
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("score"), 6)), F.asc("doc_id"))
    return (res.withColumn("rank", F.row_number().over(w))
            .select("query_id", "rank", "doc_id",
                    F.round(F.col("score"), 6).alias("score"),
                    "repo", "path", "matched_term", "pos", "snippet"))


def _snippets_oracle_sql(queries=None, window: int = SNIPPET_WINDOW) -> str:
    """SQL twin: replay BM25 ranking, then pick each hit's matched query
    term by (df ASC, term ASC), locate its first occurrence, and slice
    the token array — byte-for-byte the engine's snippet rule."""
    from .functions.tokenize import tokenize_py
    queries = BM25_QUERIES if queries is None else queries
    vals = ",\n  ".join(
        f"({qid}, '{t}', {k})"
        for qid, text, k in queries for t in sorted(set(tokenize_py(text))))
    return f"""
WITH ordered AS (
  SELECT row_number() OVER (ORDER BY source, 'doc/'||CAST(doc_id AS VARCHAR))
         - 1 AS d, source AS repo,
         'doc/'||CAST(doc_id AS VARCHAR) AS path, text FROM documents
), tokarr AS (
  SELECT d, {_TOKS_SQL} AS toks FROM ordered
), toks AS (
  SELECT d, unnest(toks) AS term FROM tokarr
), dt AS (
  SELECT d, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2
), dl2 AS (
  SELECT d, count(*)::BIGINT AS dl FROM toks GROUP BY 1
), stats AS (
  SELECT (SELECT count(*) FROM ordered) AS n,
         (SELECT COALESCE(sum(dl), 0)::DOUBLE
                 / (SELECT count(*) FROM ordered) FROM dl2) AS avgdl
), dfreq AS (
  SELECT term, count(*)::BIGINT AS df FROM dt GROUP BY 1
), qset(query_id, term, k) AS (VALUES
  {vals}
), scored AS (
  SELECT q.query_id, q.k, dt.d AS doc_id,
         sum( ln(1 + (s.n - f.df + 0.5) / (f.df + 0.5))
              * dt.tf * 2.2
              / (dt.tf + 1.2 * (1 - 0.75 + 0.75 * dl2.dl / s.avgdl)) )
         AS score
  FROM qset q JOIN dt ON dt.term = q.term
  JOIN dfreq f ON f.term = q.term
  JOIN dl2 ON dl2.d = dt.d, stats s
  GROUP BY 1, 2, 3
), ranked AS (
  SELECT query_id, doc_id, ROUND(score, 6) AS score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY ROUND(score, 6) DESC, doc_id ASC)
         AS rank, k
  FROM scored
), hitterms AS (
  SELECT r.query_id, r.doc_id, q.term, f.df,
         row_number() OVER (PARTITION BY r.query_id, r.doc_id
                            ORDER BY f.df ASC, q.term ASC) AS rn
  FROM ranked r
  JOIN qset q ON q.query_id = r.query_id
  JOIN dt ON dt.d = r.doc_id AND dt.term = q.term
  JOIN dfreq f ON f.term = q.term
  WHERE r.rank <= r.k
), snip AS (
  SELECT h.query_id, h.doc_id, h.term,
         list_position(ta.toks, h.term) AS pos, ta.toks
  FROM hitterms h JOIN tokarr ta ON ta.d = h.doc_id
  WHERE h.rn = 1
)
SELECT r.query_id, r.rank::INT AS rank, r.doc_id, r.score,
       o.repo, o.path, s.term AS matched_term, s.pos::INT AS pos,
       array_to_string(
         s.toks[GREATEST(1, s.pos - {window}):s.pos + {window}], ' ')
         AS snippet
FROM ranked r
JOIN snip s ON s.query_id = r.query_id AND s.doc_id = r.doc_id
JOIN ordered o ON o.d = r.doc_id
WHERE r.rank <= r.k
"""


#: more-like-this contract parameters: raw document 42 seeds the query,
#: 8 highest-tf·idf terms, top-10 with the seed excluded
MLT_SEED, MLT_TERMS = 42, 8


def q_more_like_this(spark, sf_dir):
    """r5 §2.14 — more-like-this (plans/mlt.py): the seed document's 8
    highest-tf·idf terms (df from the REAL partition-pruned dictionary
    probe, idf = the engine's BM25 idf, selection score rounded to 9
    decimals) run as an OR query through the block-max scorer; the
    seed's own doc excluded, survivors re-ranked on the rounded BM25.
    The DuckDB twin replays term selection and scoring from raw text."""
    from .plans.mlt import more_like_this
    from .plans.query import Index
    idx_dir = contract_index_dir(spark, sf_dir)
    text = (_docs(spark, sf_dir).where(F.col("doc_id") == MLT_SEED)
            .collect()[0]["text"])
    dense = (spark.read.parquet(f"{idx_dir}/docs")
             .where(F.col("path") == f"doc/{MLT_SEED}")
             .collect()[0]["doc_id"])
    return more_like_this(Index(spark, idx_dir), text, k=10,
                          max_terms=MLT_TERMS,
                          exclude_doc_id=int(dense))


def _mlt_oracle_sql(seed: int = MLT_SEED, k: int = 10,
                    max_terms: int = MLT_TERMS) -> str:
    """DuckDB twin of more_like_this: dense ids by the engine's ordering
    rule, seed tf from the seed row's tokens, df corpus-wide, selection
    = ROUND(tf·ln(1+(n−df+.5)/(df+.5)), 9) top-``max_terms`` (term asc
    ties), then the standard BM25 sum over the selected terms with the
    seed's dense id excluded at ranking."""
    return f"""
WITH ordered AS (
  SELECT row_number() OVER (ORDER BY source, 'doc/'||CAST(doc_id AS VARCHAR))
         - 1 AS d, doc_id AS raw_id, text FROM documents
), toks AS (
  SELECT d, unnest({_TOKS_SQL}) AS term FROM ordered
), dt AS (
  SELECT d, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2
), dl2 AS (
  SELECT d, count(*)::BIGINT AS dl FROM toks GROUP BY 1
), stats AS (
  SELECT (SELECT count(*) FROM ordered) AS n,
         (SELECT COALESCE(sum(dl), 0)::DOUBLE
                 / (SELECT count(*) FROM ordered) FROM dl2) AS avgdl
), dfreq AS (
  SELECT term, count(*)::BIGINT AS df FROM dt GROUP BY 1
), seed AS (
  SELECT d FROM ordered WHERE raw_id = {seed}
), qterms AS (
  SELECT term FROM (
    SELECT dt.term,
           ROUND(dt.tf * ln(1 + (s.n - f.df + 0.5) / (f.df + 0.5)), 9)
           AS sel
    FROM dt JOIN seed ON dt.d = seed.d
    JOIN dfreq f ON f.term = dt.term, stats s)
  ORDER BY sel DESC, term ASC LIMIT {max_terms}
), scored AS (
  SELECT dt.d AS doc_id,
         sum( ln(1 + (s.n - f.df + 0.5) / (f.df + 0.5))
              * dt.tf * 2.2
              / (dt.tf + 1.2 * (1 - 0.75 + 0.75 * dl2.dl / s.avgdl)) )
         AS score
  FROM qterms q JOIN dt ON dt.term = q.term
  JOIN dfreq f ON f.term = q.term
  JOIN dl2 ON dl2.d = dt.d, stats s
  GROUP BY 1
), ranked AS (
  SELECT doc_id, ROUND(score, 6) AS score,
         row_number() OVER (ORDER BY ROUND(score, 6) DESC, doc_id ASC)
         AS rank
  FROM scored WHERE doc_id != (SELECT d FROM seed)
)
SELECT rank::INT AS rank, doc_id, score FROM ranked WHERE rank <= {k}
"""


#: hybrid retrieval contract parameters: flagship lexical query 0 fused
#: with the vec_id=0 ANN probe at retrieval depth 50, RRF constant 60
#: (the Cormack/Clarke/Buettcher default)
HYBRID_TEXT, HYBRID_DEPTH, HYBRID_RRF_K = "spark join filter", 50, 60


def q_hybrid_topk(spark, sf_dir):
    """r5 §2.14 — hybrid lexical+vector retrieval (pipeline/hybrid.py):
    BM25 top-50 from the shared block-max index fused with the LSH-ANN
    top-50 for the vec_id=0 probe by reciprocal rank fusion
    (Σ 1/(60+rank), vec_id == doc_id convention). The DuckDB twin
    composes the existing from-first-principles BM25 and plane-literal
    ANN oracles and replays the fusion arithmetic."""
    from .pipeline.hybrid import hybrid_topk
    from .plans.query import Index
    q_lsh_ann_topk(spark, sf_dir)          # ensure the cached bucket table
    idx = Index(spark, contract_index_dir(spark, sf_dir))
    return hybrid_topk(idx, HYBRID_TEXT, _probe_vec(spark, sf_dir),
                       ann_dir=_ANN_CACHE[sf_dir], k=10,
                       depth=HYBRID_DEPTH, rrf_k=HYBRID_RRF_K,
                       ann_opts={"n_tables": ANN_TABLES,
                                 "n_planes": ANN_PLANES})


def _hybrid_oracle_sql(text: str = HYBRID_TEXT, depth: int = HYBRID_DEPTH,
                       k: int = 10, rrf_k: int = HYBRID_RRF_K) -> str:
    """DuckDB twin of the RRF fusion: the BM25 oracle (single query at
    depth) and the ANN oracle (k=depth) become CTEs; fused score =
    Σ w/(rrf_k+rank) in DOUBLE (CAST — bare 1.0 is DECIMAL in DuckDB),
    rounded to 6; absent ranks report 0; ties break doc_id asc."""
    bm = _bm25_oracle_sql([(0, text, depth)])
    an = _ann_oracle_sql(k=depth)
    return f"""
WITH bm AS ({bm}), an AS (
  SELECT vec_id,
         row_number() OVER (ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM ({an})
), ids AS (
  SELECT doc_id FROM bm UNION SELECT vec_id AS doc_id FROM an
), fused AS (
  SELECT ids.doc_id,
         ROUND(COALESCE(CAST(1.0 AS DOUBLE) / ({rrf_k} + bm.rank), 0)
               + COALESCE(CAST(1.0 AS DOUBLE) / ({rrf_k} + an.rank), 0),
               6) AS rrf,
         COALESCE(bm.rank, 0) AS bm25_rank,
         COALESCE(an.rank, 0) AS ann_rank
  FROM ids LEFT JOIN bm ON bm.doc_id = ids.doc_id
           LEFT JOIN an ON an.vec_id = ids.doc_id
)
SELECT row_number() OVER (ORDER BY rrf DESC, doc_id ASC)::INT AS rank,
       doc_id, rrf, bm25_rank::INT AS bm25_rank, ann_rank::INT AS ann_rank
FROM fused ORDER BY rrf DESC, doc_id ASC LIMIT {k}
"""


#: embedding near-dup contract threshold — ~p99 of the fixture's pair
#: cosine distribution, so the pair set is non-trivial but bounded
EMB_NEARDUP_THRESHOLD = 0.28


def q_simhash_neardup_pairs(spark, sf_dir):
    """r5 §2.14 — SimHash near-dup pairs (Manku et al. 2007): 4-band
    pigeonhole candidates + bit_count(xor) <= 3, COMPLETE recall at
    that radius. The DuckDB twin recomputes the fingerprints (the
    existing simhash twin's CTEs), the band equi-join and the hamming
    filter."""
    from .pipeline.dedup import simhash_neardup_pairs
    return simhash_neardup_pairs(_docs(spark, sf_dir))


def q_neardup_components(spark, sf_dir):
    """r5 §2.14 — near-dup CLUSTERS: connected components
    (large-star/small-star, Kiveris et al. SoCC 2014) over the SimHash
    banded-hamming pair graph; every document gets a cluster_id = the
    smallest doc_id reachable through near-dup pairs (singletons map to
    themselves). The DuckDB twin recomputes the pairs with the shared
    fingerprint CTEs and resolves components by a recursive
    label-reachability CTE (component = min reachable label)."""
    from .pipeline.dedup import neardup_clusters
    return neardup_clusters(_docs(spark, sf_dir), method="simhash")


def q_emb_neardup_pairs(spark, sf_dir):
    """r5 §2.14 — embedding-cosine near-duplicate pairs: LSH-bucketed
    candidate generation (never all-pairs) + exact cosine threshold,
    the vector twin of minhash neardup_pairs. The DuckDB twin
    recomputes the sha-seeded planes, per-table buckets, the SAME
    bucket-collision candidate pairs, and the rounded-cosine filter."""
    from .pipeline.similarity import embedding_neardup_pairs
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_neardup_pairs(emb, threshold=EMB_NEARDUP_THRESHOLD,
                                   n_tables=ANN_TABLES,
                                   n_planes=ANN_PLANES)


def q_media_features(spark, sf_dir):
    """Multimodal plumbing: binary payloads -> feature vectors via
    mapInPandas (decode stubbed deterministically — no codecs in image).

    The media table derives from `documents` (payload = UTF-8 text bytes)
    so the sha256-expanded fake features have an exact DuckDB twin; the
    vector is exploded to (media_id, kind, dim, value) rows — a
    driver-canonicalizable shape (scalar columns only)."""
    from .pipeline.multimodal import extract_media_features
    media = (_docs(spark, sf_dir)
             .select(F.col("doc_id").alias("media_id"),
                     F.element_at(F.array(F.lit("image"), F.lit("audio"),
                                          F.lit("video")),
                                  (F.col("doc_id") % 3 + 1).cast("int"))
                     .alias("kind"),
                     F.encode(F.col("text"), "UTF-8").alias("payload")))
    feats = extract_media_features(media, decode="fake")
    return (feats.select("media_id", "kind",
                         F.posexplode("feature").alias("dim", "v"))
            .select("media_id", "kind", F.col("dim").cast("int").alias("dim"),
                    F.round(F.col("v").cast("double"), 6).alias("value")))

def q_build_resume(spark, sf_dir):
    """op 29 — chunked build + resumed run, VALUE-EXACT since r3: the
    DuckDB twin re-derives the engine's chunking arithmetic (chunk_docs =
    max(rsize, ceil(n/chunks/rsize)·rsize) at rsize=64, n_chunks=3) and
    the corpus's true posting count from raw text, so the resume must
    skip exactly every committed chunk AND the resumed index must carry
    the exact recomputed posting total (not merely 'same as before')."""
    from .plans.build import build_index
    out = tempfile.mkdtemp(prefix="donkey_resume_")
    corpus = documents_as_corpus(spark, sf_dir)
    info1 = build_index(spark, corpus, out, range_size=64, n_chunks=3)
    info2 = build_index(spark, corpus, out, range_size=64, n_chunks=3,
                        resume=True)
    rows = [(int(info1["n_chunks"]), int(info1["chunks_built"]),
             int(info2["chunks_built"]), int(info2["chunks_skipped"]),
             int(info2["n_postings"]))]
    return spark.createDataFrame(
        rows, "n_chunks int, built_first int, built_resume int, "
              "skipped_resume int, n_postings long")


def q_stream_ingest(spark, sf_dir):
    """§2.10 — availableNow ingest over a 10-file corpus, VALUE-EXACT
    since r3: epochs = ceil(10 files / maxFilesPerTrigger 8) = 2, doc ids
    dense, and the converged meta posting count must equal the corpus's
    true distinct (doc, term) pair count recomputed by DuckDB from raw
    text — certifying the O(epoch) journal arithmetic end to end
    (idempotency/replay remain pytest-covered in tests/test_streaming.py)."""
    from .streaming.ingest import stream_ingest
    base = tempfile.mkdtemp(prefix="donkey_stream_")
    src = os.path.join(base, "src")
    (documents_as_corpus(spark, sf_dir).repartition(10)
     .write.mode("overwrite").parquet(src))
    q = stream_ingest(spark, src, os.path.join(base, "idx"),
                      os.path.join(base, "ckpt"), trigger_once=True)
    q.awaitTermination(300)
    meta = spark.read.parquet(os.path.join(base, "idx", "meta")).collect()[0]
    n_epochs = (spark.read.parquet(os.path.join(base, "idx",
                                                "manifest_stream")).count())
    ids = sorted(r["doc_id"] for r in
                 spark.read.parquet(os.path.join(base, "idx", "docs"))
                 .select("doc_id").collect())
    rows = [(int(n_epochs), int(meta["n_docs"]),
             int(ids == list(range(len(ids)))),
             int(meta["n_postings"]))]
    return spark.createDataFrame(
        rows, "n_epochs int, n_docs int, ids_dense int, n_postings long")


def q_index_manifest(spark, sf_dir):
    """op 4/29 surface — per-chunk lineage + metrics journal, now
    VALUE-EXACT against a from-first-principles DuckDB twin (was
    rows-only through r2): the oracle recomputes per-chunk n_docs,
    n_postings (distinct (doc, term) pairs) and n_blocks (Σ over
    (term, salt) groups of ceil(cnt/BLOCK_SIZE), with salt = doc_id //
    range_size and range_size re-derived by the same doubling rule the
    engine uses) from raw text — a lost posting, a mis-salted group or
    a mis-cut block anywhere in the build shifts one of these.
    bytes_out/wall/job_id stay pytest-only (codec- and run-dependent)."""
    return (spark.read.parquet(f"{contract_index_dir(spark, sf_dir)}/manifest")
            .select("chunk", "status", "n_docs", "n_postings", "n_blocks",
                    "attempt"))


def q_segment_stats(spark, sf_dir):
    """compressed-block layout surface (K1–K5), VALUE-EXACT since r3:
    per-SALT block and posting counts (salt = doc_id // range_size is
    SQL-derivable; the former per-bucket grouping used crc32, which
    DuckDB lacks, and blob byte totals are codec-dependent — both remain
    covered by the pytest digest/determinism suite)."""
    seg = spark.read.option(
        "basePath", f"{contract_index_dir(spark, sf_dir)}/segments").parquet(
        f"{contract_index_dir(spark, sf_dir)}/segments")
    return (seg.groupBy("salt")
            .agg(F.count("*").alias("n_blocks"),
                 F.sum("n_docs").alias("n_postings")))


# ---------------------------------------------------------------------------
# DuckDB oracle SQL (views documents/events/lineitem/... pre-registered)
# ---------------------------------------------------------------------------

#: the standard corpus CTE body — dense doc ids over the documents view
_ORDERED_SQL = ("SELECT row_number() OVER (ORDER BY source, "
                "'doc/'||CAST(doc_id AS VARCHAR)) - 1 AS d, text "
                "FROM documents")


def _bm25_oracle_sql(queries: list[tuple[int, str, int]],
                     conjunctive: bool = False,
                     deleted_pred: str | None = None,
                     keep_sql: str | None = None,
                     phrase: bool = False,
                     pre_cte: str = "",
                     ordered_sql: str = _ORDERED_SQL,
                     qset_sql: str | None = None,
                     page_offset: int = 0,
                     weighted: bool = False,
                     min_match: dict[int, int] | None = None,
                     collapse: bool = False) -> str:
    """From-first-principles DuckDB BM25 over the documents view for the
    given query set; conjunctive=True keeps only docs matched by EVERY
    query term (HAVING count = per-query term count); deleted_pred (a
    predicate over the dense ``doc_id``) filters tombstoned docs at
    RANKING time only — df/avgdl stay computed over the full corpus,
    mirroring the engine's frozen-stats deletion semantics; keep_sql is
    the positive twin (facet filters): only docs satisfying it may rank,
    scores unchanged — mirroring zero-idf presence intersection.

    phrase=True (implies conjunctive): each query text is an exact
    phrase — only docs whose §T token stream contains the sequence
    consecutively may rank (re-ranked after the filter, like the
    engine's position verification). Containment is a delimited
    substring test over the space-joined token stream: §T tokens
    contain no spaces, so `' w1 w2 ' ⊆ ' '||join(toks,' ')||' '` holds
    iff the tokens occur consecutively.

    weighted=True (boosted pairs): ``qset_sql`` must supply a fourth
    ``w`` column (see _boost_qset_sql) and each term's contribution is
    multiplied by it — the oracle's arithmetic twin of the engine's
    idf-scaling boost.

    min_match ({query_id: m} — the minimum_should_match pairs): only
    docs matching at least m DISTINCT query terms rank, scores
    unchanged (HAVING count >= m over the same per-term join the
    conjunctive twin counts; an out-of-dictionary term joins nothing,
    so a query whose live terms number < m is empty on both engines).

    collapse=True (T38 field collapsing, group = ``source``): k counts
    GROUPS — each group's representative is its best-scoring matching
    doc picked on EXACT score (ties: ascending doc_id, the engine's
    determinism rule), groups rank by the representative's 6-dp score
    with the same tie-break, and group_hits counts the group's full
    match set. Emits (query_id, rank, grp, doc_id, score,
    group_hits)."""
    assert not (deleted_pred and keep_sql)
    assert not (weighted and qset_sql is None)
    assert not (min_match and (conjunctive or phrase))
    assert not (collapse and (phrase or page_offset))
    if deleted_pred:
        keep_sql = f"NOT ({deleted_pred})"
    from .functions.tokenize import tokenize_py
    conjunctive = conjunctive or phrase
    vals = ",\n  ".join(
        f"({qid}, '{t}', {k})"
        for qid, text, k in queries for t in sorted(set(tokenize_py(text))))
    # pattern pairs derive qset IN SQL (expansion ranked over dfreq)
    # instead of the literal VALUES — see _pattern_qset_sql
    qset_block = qset_sql or f"""qset(query_id, term, k) AS (VALUES
  {vals}
)"""
    qn_cte = (", qn AS (SELECT query_id, count(*) AS nt FROM qset "
              "GROUP BY 1)" if conjunctive else "")
    qn_join = " JOIN qn ON qn.query_id = q.query_id" if conjunctive else ""
    having = "\n  HAVING count(*) = max(qn.nt)" if conjunctive else ""
    if min_match:
        mvals = ",\n  ".join(f"({qid}, {int(m)})"
                             for qid, m in sorted(min_match.items()))
        qn_cte = f""", qm(query_id, m) AS (VALUES
  {mvals}
)"""
        qn_join = " JOIN qm ON qm.query_id = q.query_id"
        having = "\n  HAVING count(*) >= max(qm.m)"
    phrase_cte, phrase_join, phrase_where = "", "", ""
    if phrase:
        pats = ",\n  ".join(
            f"({qid}, ' {' '.join(tokenize_py(text))} ')"
            for qid, text, k in queries)
        phrase_cte = f""", pats(query_id, pat) AS (VALUES
  {pats}
), tokstr AS (
  SELECT d, ' ' || array_to_string({_TOKS_SQL}, ' ') || ' ' AS s
  FROM ordered
)"""
        phrase_join = (" JOIN pats ON pats.query_id = scored.query_id"
                       " JOIN tokstr ON tokstr.d = scored.doc_id")
        phrase_where = "\n  WHERE contains(tokstr.s, pats.pat)"
    if collapse:
        tail = _collapse_tail(keep_sql)
    else:
        keep = (f"\n  WHERE ({keep_sql})"
                if keep_sql and not phrase else "")
        tail = f""", ranked AS (
  SELECT scored.query_id, scored.doc_id,
         ROUND(scored.score, 6) AS score,
         row_number() OVER (PARTITION BY scored.query_id
                            ORDER BY ROUND(scored.score, 6) DESC,
                                     scored.doc_id ASC)
         AS rank, scored.k
  FROM scored{phrase_join}{phrase_where}{keep}
)
SELECT query_id, (rank - {int(page_offset)})::INT AS rank, doc_id, score
FROM ranked
WHERE rank > {int(page_offset)} AND rank <= {int(page_offset)} + k
"""
    return f"""
WITH {pre_cte}ordered AS (
  {ordered_sql}
), toks AS (
  SELECT d, unnest({_TOKS_SQL}) AS term FROM ordered
), dt AS (
  SELECT d, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2
), dl2 AS (
  SELECT d, count(*)::BIGINT AS dl FROM toks GROUP BY 1
), stats AS (
  SELECT (SELECT count(*) FROM ordered) AS n,
         (SELECT COALESCE(sum(dl), 0)::DOUBLE
                 / (SELECT count(*) FROM ordered) FROM dl2) AS avgdl
), dfreq AS (
  SELECT term, count(*)::BIGINT AS df FROM dt GROUP BY 1
), {qset_block}{qn_cte}{phrase_cte}, scored AS (
  SELECT q.query_id, q.k, dt.d AS doc_id,
         sum( {"q.w * " if weighted else ""}ln(1 + (s.n - f.df + 0.5) / (f.df + 0.5))
              * dt.tf * 2.2
              / (dt.tf + 1.2 * (1 - 0.75 + 0.75 * dl2.dl / s.avgdl)) )
         AS score
  FROM qset q JOIN dt ON dt.term = q.term
  JOIN dfreq f ON f.term = q.term
  JOIN dl2 ON dl2.d = dt.d{qn_join}, stats s
  GROUP BY 1, 2, 3{having}
){tail}"""


def _collapse_tail(keep_sql: str | None) -> str:
    """The collapse (T38) oracle tail appended after the ``scored``
    CTE: group = documents ``source`` (the corpus adapter's repo),
    representative picked on EXACT score so the pick rule matches the
    engine's internal determinism, final group ranking on the 6-dp
    rounded score exactly like every other pair's ranked CTE."""
    keep = (f"\n  WHERE ({keep_sql})" if keep_sql else "")
    return f""", gkeys AS (
  SELECT row_number() OVER (ORDER BY source,
           'doc/'||CAST(doc_id AS VARCHAR)) - 1 AS d,
         source AS g
  FROM documents
), gbest AS (
  SELECT scored.query_id, scored.k, gkeys.g, scored.doc_id, scored.score,
         row_number() OVER (PARTITION BY scored.query_id, gkeys.g
                            ORDER BY scored.score DESC,
                                     scored.doc_id ASC) AS rn,
         count(*) OVER (PARTITION BY scored.query_id, gkeys.g)
           AS group_hits
  FROM scored JOIN gkeys ON gkeys.d = scored.doc_id{keep}
), granked AS (
  SELECT query_id, g, doc_id, ROUND(score, 6) AS score, group_hits, k,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY ROUND(score, 6) DESC, doc_id ASC)
           AS rank
  FROM gbest WHERE rn = 1
)
SELECT query_id, rank::INT AS rank, g AS grp, doc_id, score, group_hits
FROM granked WHERE rank <= k
"""


def _pattern_qset_sql(queries: list[tuple[int, str, int]],
                      cap: int) -> str:
    """The qset override for pattern pairs (§2.14 T23): the oracle
    derives each pattern's expansion IN SQL — matching terms from the
    from-first-principles ``dfreq`` CTE, ranked (df DESC, term ASC),
    capped at ``cap`` — and unions them with the literal tokens, so the
    expansion RANKING itself (not just the scoring of a hand-fed term
    list) is certified against DuckDB. ``levenshtein`` here is DuckDB's
    built-in; the engine uses Spark's JVM ``levenshtein`` (distributed
    path) or the banded DP in functions/patterns.py (local path) — all
    three compute the same classic unit-cost edit distance."""
    from .functions.patterns import (parse_pattern_text, regexp_anchor,
                                     wildcard_to_like)
    from .functions.tokenize import tokenize_py

    def _pat(kind: str, base: str) -> str:
        # wildcards ship as their LIKE translation (kind 'w') so the
        # oracle's LIKE ... ESCAPE '\' evaluates the SAME string the
        # engine's pyarrow/Spark paths match (standard SQL strings in
        # DuckDB keep the backslash literal); regexps (kind 'r') ship
        # as the SAME anchored ^(?:body)$ rendering the engine's RE2 /
        # RLIKE paths run (the grammar excludes quotes and backslash,
        # so inlining is safe)
        if kind == "wildcard":
            return wildcard_to_like(base)
        if kind == "regexp":
            return regexp_anchor(base)
        return base

    lit_rows, pat_rows = [], []
    for qid, text, k in queries:
        lit_text, pats = parse_pattern_text(text)
        lit_rows.extend(f"({qid}, '{t}', {k})"
                        for t in sorted(set(tokenize_py(lit_text))))
        pat_rows.extend(
            f"({qid}, '{kind[0]}', '{_pat(kind, base)}', {dist}, {k})"
            for kind, base, dist in pats)
    assert lit_rows and pat_rows, "pattern pairs mix literals + patterns"
    return f"""qlit(query_id, term, k) AS (VALUES
  {",".join(lit_rows)}
), qpat(query_id, kind, pat, dist, k) AS (VALUES
  {",".join(pat_rows)}
), qexp AS (
  SELECT p.query_id, f.term, p.k,
         row_number() OVER (
           PARTITION BY p.query_id, p.kind, p.pat, p.dist
           ORDER BY f.df DESC, f.term) AS rn
  FROM qpat p JOIN dfreq f ON
       (p.kind = 'p' AND starts_with(f.term, p.pat))
    OR (p.kind = 'f' AND levenshtein(f.term, p.pat) <= p.dist)
    OR (p.kind = 'w' AND f.term LIKE p.pat ESCAPE '\\')
    OR (p.kind = 'r' AND regexp_matches(f.term, p.pat))
), qset AS (
  SELECT query_id, term, k FROM qlit
  UNION
  SELECT query_id, term, k FROM qexp WHERE rn <= {cap}
)"""


def _bool_qset_sql(queries: list[tuple[int, str, int]]) -> str:
    """The qset override for the boolean pair (§2.14 T24): only the
    POSITIVE terms of each parsed tree score (the default full-text
    tokenization would score the operator words and negated terms)."""
    from .functions.boolquery import parse_bool_text, positive_terms
    vals = ",\n  ".join(
        f"({qid}, '{t}', {k})"
        for qid, text, k in queries
        for t in sorted(positive_terms(parse_bool_text(text))))
    return f"""qset(query_id, term, k) AS (VALUES
  {vals}
)"""


def _boost_qset_sql(queries: list[tuple[int, str, int]]) -> str:
    """The weighted qset for boosted pairs: the SAME ``term^W`` parse
    the engine runs (functions/boosts.parse_boost_text — largest-wins
    duplicates, implicit 1.0) rendered as a fourth VALUES column; the
    oracle's scoring arithmetic then applies the weights independently
    (``weighted=True`` multiplies them into the per-term sum)."""
    from .functions.boosts import parse_boost_text
    rows = []
    for qid, text, k in queries:
        terms, bw = parse_boost_text(text)
        rows.extend(f"({qid}, '{t}', {k}, {float(bw.get(t, 1.0))!r})"
                    for t in terms)
    vals = ",\n  ".join(rows)
    return f"""qset(query_id, term, k, w) AS (VALUES
  {vals}
)"""


def _bool_keep_sql(queries: list[tuple[int, str, int]]) -> str:
    """Per-query boolean match predicate over the scored candidates:
    tree_to_sql renders THE SAME parsed tree the engine masks with,
    presence = membership in the from-first-principles dt CTE. Applied
    before ranking (ranked's WHERE), exactly like the facet pairs."""
    from .functions.boolquery import parse_bool_text, tree_to_sql

    def presence(t: str) -> str:
        return f"scored.doc_id IN (SELECT d FROM dt WHERE term = '{t}')"

    return "(" + "\n    OR ".join(
        f"(scored.query_id = {qid} AND "
        f"{tree_to_sql(parse_bool_text(text), presence)})"
        for qid, text, _ in queries) + ")"


_BM25_ORACLE = _bm25_oracle_sql(BM25_QUERIES)

def _sharded_wrap(base_oracle: str) -> str:
    """A federated pair's twin IS the corresponding unified oracle —
    sharding is invisible — with the dense doc_id mapped back to its
    (repo, path) key (the only document identity a federation has)."""
    return f"""
WITH base AS (
{base_oracle}
), keys AS (
  SELECT row_number() OVER (ORDER BY source,
           'doc/'||CAST(doc_id AS VARCHAR)) - 1 AS d,
         source AS repo,
         'doc/'||CAST(doc_id AS VARCHAR) AS path
  FROM documents
)
SELECT base.query_id, base.rank, base.score, keys.repo, keys.path
FROM base JOIN keys ON keys.d = base.doc_id
"""


_BM25_SHARDED_ORACLE = _sharded_wrap(_BM25_ORACLE)
_BM25_AND_ORACLE = _bm25_oracle_sql(BM25_AND_QUERIES, conjunctive=True)
_BM25_MSM_ORACLE = _bm25_oracle_sql(BM25_MSM_QUERIES,
                                    min_match=BM25_MSM_M)
_BM25_MSM_SHARDED_ORACLE = _sharded_wrap(_BM25_MSM_ORACLE)
_BM25_COLLAPSE_ORACLE = _bm25_oracle_sql(BM25_QUERIES, collapse=True)
#: the federated collapse twin: the unified collapse oracle with the
#: representative's doc_id mapped to its (repo, path) key and
#: group_hits dropped (a federation shard counts only its own top-k
#: groups, so the engine surface omits the column)
_BM25_COLLAPSE_SHARDED_ORACLE = f"""
WITH base AS (
{_BM25_COLLAPSE_ORACLE}
), keys AS (
  SELECT row_number() OVER (ORDER BY source,
           'doc/'||CAST(doc_id AS VARCHAR)) - 1 AS d,
         source AS repo,
         'doc/'||CAST(doc_id AS VARCHAR) AS path
  FROM documents
)
SELECT base.query_id, base.rank, base.grp, base.score,
       keys.repo, keys.path
FROM base JOIN keys ON keys.d = base.doc_id
"""
_BM25_PHRASE_ORACLE = _bm25_oracle_sql(BM25_PHRASE_QUERIES, phrase=True)
_BM25_PHRASE_SHARDED_ORACLE = _sharded_wrap(_BM25_PHRASE_ORACLE)
_BM25_PREFIX_ORACLE = _bm25_oracle_sql(
    BM25_PREFIX_QUERIES,
    qset_sql=_pattern_qset_sql(BM25_PREFIX_QUERIES, PREFIX_EXPANSION_CAP))
from .config import MAX_TERM_EXPANSIONS as _EXP_CAP  # noqa: E402

_BM25_FUZZY_ORACLE = _bm25_oracle_sql(
    BM25_FUZZY_QUERIES,
    qset_sql=_pattern_qset_sql(BM25_FUZZY_QUERIES, _EXP_CAP))
_BM25_WILDCARD_ORACLE = _bm25_oracle_sql(
    BM25_WILDCARD_QUERIES,
    qset_sql=_pattern_qset_sql(BM25_WILDCARD_QUERIES,
                               WILDCARD_EXPANSION_CAP))
_BM25_REGEXP_ORACLE = _bm25_oracle_sql(
    BM25_REGEXP_QUERIES,
    qset_sql=_pattern_qset_sql(BM25_REGEXP_QUERIES, REGEXP_EXPANSION_CAP))
_BM25_PREFIX_SHARDED_ORACLE = _sharded_wrap(_BM25_PREFIX_ORACLE)
_BM25_REGEXP_SHARDED_ORACLE = _sharded_wrap(_BM25_REGEXP_ORACLE)
_BM25_BOOL_ORACLE = _bm25_oracle_sql(
    BM25_BOOL_QUERIES,
    keep_sql=_bool_keep_sql(BM25_BOOL_QUERIES),
    qset_sql=_bool_qset_sql(BM25_BOOL_QUERIES))
_BM25_BOOL_SHARDED_ORACLE = _sharded_wrap(_BM25_BOOL_ORACLE)
_BM25_BOOST_ORACLE = _bm25_oracle_sql(
    BM25_BOOST_QUERIES,
    qset_sql=_boost_qset_sql(BM25_BOOST_QUERIES), weighted=True)
_BM25_BOOST_SHARDED_ORACLE = _sharded_wrap(_BM25_BOOST_ORACLE)
_BM25_DELETED_ORACLE = _bm25_oracle_sql(BM25_QUERIES,
                                        deleted_pred="doc_id % 7 = 0")
#: page-2 twin: rank 11..20 of the same ranking, re-numbered 1..10
_BM25_PAGE2_ORACLE = _bm25_oracle_sql(BM25_QUERIES, page_offset=10)
#: delete-by-query twin: docs containing EITHER term are dead (OR
#: match semantics), filtered at ranking only (frozen stats)
_BM25_DELETE_QUERY_ORACLE = _bm25_oracle_sql(
    BM25_QUERIES,
    deleted_pred="doc_id IN (SELECT d FROM dt "
                 "WHERE term IN ('customer', 'row'))")
#: facet value the filtered-search pair pins (present at every sf)
_FACET_LANG = "en"
_BM25_FILTERED_ORACLE = _bm25_oracle_sql(
    BM25_QUERIES,
    keep_sql=f"""doc_id IN (
    SELECT did FROM (
      SELECT row_number() OVER (ORDER BY source,
                                'doc/'||CAST(doc_id AS VARCHAR)) - 1 AS did,
             lang FROM documents)
    WHERE lang = '{_FACET_LANG}')""")
#: numeric range the T25 pairs pin — ~40% of docs at every sf, so both
#: the keep and the complement bind
_RANGE_LO, _RANGE_HI = 200, 400
_RANGE_KEEP = f"""doc_id IN (
    SELECT did FROM (
      SELECT row_number() OVER (ORDER BY source,
                                'doc/'||CAST(doc_id AS VARCHAR)) - 1 AS did,
             length(text) AS nc FROM documents)
    WHERE nc BETWEEN {_RANGE_LO} AND {_RANGE_HI})"""
_BM25_RANGE_ORACLE = _bm25_oracle_sql(BM25_QUERIES, keep_sql=_RANGE_KEEP)
_BM25_RANGE_NOT_ORACLE = _bm25_oracle_sql(
    BM25_QUERIES, keep_sql=f"NOT {_RANGE_KEEP}")
#: OR-filter values for the multi-value pair (both present at every sf)
_FACET_OR_LANGS = ("de", "fr")
_BM25_FILTERED_OR_ORACLE = _bm25_oracle_sql(
    BM25_QUERIES,
    keep_sql=f"""doc_id IN (
    SELECT did FROM (
      SELECT row_number() OVER (ORDER BY source,
                                'doc/'||CAST(doc_id AS VARCHAR)) - 1 AS did,
             lang FROM documents)
    WHERE lang IN {_FACET_OR_LANGS!r})""")
_BM25_FILTERED_NOT_ORACLE = _bm25_oracle_sql(
    BM25_QUERIES,
    keep_sql=f"""doc_id IN (
    SELECT did FROM (
      SELECT row_number() OVER (ORDER BY source,
                                'doc/'||CAST(doc_id AS VARCHAR)) - 1 AS did,
             lang FROM documents)
    WHERE lang IS NULL OR lang NOT IN {_FACET_OR_LANGS!r})""")


_H60 = ("CAST(CAST('0x'||substr(sha256(t||'#{i}'),1,15) AS UBIGINT) "
        "AS BIGINT)")
_SIGS_CTE = f"""
dtoks AS (
  SELECT doc_id, unnest(list_distinct({_TOKS_SQL})) AS t FROM documents
), sigs AS (
  SELECT doc_id,
         {', '.join(f'min({_H60.format(i=i)}) AS h{i}' for i in range(8))}
  FROM dtoks GROUP BY doc_id
), bands AS (
  SELECT doc_id, 0 AS band, h0::VARCHAR||'_'||h1::VARCHAR AS band_key FROM sigs
  UNION ALL SELECT doc_id, 1, h2::VARCHAR||'_'||h3::VARCHAR FROM sigs
  UNION ALL SELECT doc_id, 2, h4::VARCHAR||'_'||h5::VARCHAR FROM sigs
  UNION ALL SELECT doc_id, 3, h6::VARCHAR||'_'||h7::VARCHAR FROM sigs
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id
)"""

_DOT = ("list_sum(list_transform(range(1, len({a})+1), "
        "i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))")

def _ann_oracle_sql(dim: int = ANN_DIM, n_tables: int = ANN_TABLES,
                    n_planes: int = ANN_PLANES, k: int = 10,
                    keep_pred: str | None = None,
                    meta_pred: str | None = None) -> str:
    """DuckDB twin of the materialized-LSH probe: recompute every
    sha-seeded hyperplane as a literal, derive each vector's per-table
    bucket, take vectors sharing ANY table bucket with vec_id=0, exact
    cosine rescore. Engine and oracle agree bit-for-bit because the planes
    are deterministic (pipeline/similarity._planes) and both sides project
    in float64."""
    from .pipeline.similarity import _planes
    rows = []
    for t in range(n_tables):
        planes = _planes(dim, n_planes, seed=f"t{t}")
        for p in range(n_planes):
            vals = ", ".join(repr(float(v)) for v in planes[p])
            rows.append(f"({t}, {p}, [{vals}])")
    values = ",\n  ".join(rows)
    cos = (f"{_DOT.format(a='e.embedding', b='v')}"
           f" / (sqrt({_DOT.format(a='e.embedding', b='e.embedding')})"
           f" * sqrt({_DOT.format(a='v', b='v')}))")
    return f"""
WITH planes(tbl, pidx, vals) AS (VALUES
  {values}
), proj AS (
  SELECT e.vec_id, pl.tbl, pl.pidx,
         CASE WHEN list_sum(list_transform(range(1, {dim} + 1),
              i -> e.embedding[i]::DOUBLE * pl.vals[i])) >= 0
              THEN 1 ELSE 0 END AS bit
  FROM embeddings e, planes pl
), buck AS (
  SELECT vec_id, tbl,
         sum(bit * (1 << ({n_planes} - 1 - pidx)))::BIGINT AS bucket
  FROM proj GROUP BY 1, 2
), cand AS (
  SELECT DISTINCT b.vec_id FROM buck b
  JOIN buck p ON p.vec_id = 0 AND p.tbl = b.tbl AND p.bucket = b.bucket
  {"JOIN embeddings em ON em.vec_id = b.vec_id" if meta_pred else ""}
  {"WHERE " + " AND ".join(
      ([keep_pred.replace('vec_id', 'b.vec_id')] if keep_pred else [])
      + ([meta_pred] if meta_pred else []))
   if keep_pred or meta_pred else ""}
), pv AS (SELECT embedding AS v FROM embeddings WHERE vec_id = 0)
SELECT vec_id, cosine FROM (
  SELECT e.vec_id, ROUND({cos}, 6) AS cosine
  FROM embeddings e JOIN cand c ON c.vec_id = e.vec_id, pv)
ORDER BY cosine DESC, vec_id ASC LIMIT {k}
"""


def _emb_neardup_oracle_sql(dim: int = ANN_DIM, n_tables: int = ANN_TABLES,
                            n_planes: int = ANN_PLANES,
                            threshold: float = 0.28) -> str:
    """DuckDB twin of embedding_neardup_pairs: identical sha-seeded
    planes as literals, per-(vector, table) buckets, bucket-collision
    candidate pairs (id_a < id_b, deduped across tables), exact cosine
    rounded to 6 and thresholded."""
    from .pipeline.similarity import _planes
    rows = []
    for t in range(n_tables):
        planes = _planes(dim, n_planes, seed=f"t{t}")
        for p in range(n_planes):
            vals = ", ".join(repr(float(v)) for v in planes[p])
            rows.append(f"({t}, {p}, [{vals}])")
    values = ",\n  ".join(rows)
    cos = (f"{_DOT.format(a='ea.embedding', b='eb.embedding')}"
           f" / (sqrt({_DOT.format(a='ea.embedding', b='ea.embedding')})"
           f" * sqrt({_DOT.format(a='eb.embedding', b='eb.embedding')}))")
    return f"""
WITH planes(tbl, pidx, vals) AS (VALUES
  {values}
), proj AS (
  SELECT e.vec_id, pl.tbl, pl.pidx,
         CASE WHEN list_sum(list_transform(range(1, {dim} + 1),
              i -> e.embedding[i]::DOUBLE * pl.vals[i])) >= 0
              THEN 1 ELSE 0 END AS bit
  FROM embeddings e, planes pl
), buck AS (
  SELECT vec_id, tbl,
         sum(bit * (1 << ({n_planes} - 1 - pidx)))::BIGINT AS bucket
  FROM proj GROUP BY 1, 2
), cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM buck a JOIN buck b
    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT id_a, id_b, cosine FROM (
  SELECT c.id_a, c.id_b, ROUND({cos}, 6) AS cosine
  FROM cand c
  JOIN embeddings ea ON ea.vec_id = c.id_a
  JOIN embeddings eb ON eb.vec_id = c.id_b)
WHERE cosine >= {threshold}
"""


#: shared fingerprint CTEs for the simhash twin and the banded-pairs twin
_SIMHASH_CTES = f"""WITH dt AS (
          SELECT doc_id, term, count(*)::BIGINT AS tf FROM (
            SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents)
          GROUP BY 1, 2
        ), th AS (
          SELECT doc_id, tf,
                 CAST('0x' || substr(sha256(term), 1, 16) AS UBIGINT) AS h
          FROM dt
        ), bits AS (
          SELECT doc_id, j, sum(tf * (2 * ((h >> j) & 1)::BIGINT - 1)) AS acc
          FROM th, (SELECT unnest(range(64)) AS j) GROUP BY 1, 2
        ), sim AS (
          SELECT doc_id,
                 sum(CASE WHEN acc > 0 AND j < 63
                          THEN (1::BIGINT << j::INT) ELSE 0 END)
                 + CASE WHEN bool_or(j = 63 AND acc > 0)
                        THEN -9223372036854775808 ELSE 0 END AS simhash
          FROM bits GROUP BY 1
        )"""


_STOP_SQL = {
    "en": "['the','and','of','to','is','in','that','it','for','on']",
    "de": "['der','die','das','und','ist','nicht','ein','mit','zu']",
    "fr": "['le','la','les','et','est','pas','un','une','dans']",
    "es": "['el','la','los','las','es','no','un','una','por']",
}
_ALL_STOP_SQL = ("['the','and','of','to','is','in','that','it','for','on',"
                 "'der','die','das','und','ist','nicht','ein','mit','zu',"
                 "'le','la','les','et','est','pas','un','une','dans',"
                 "'el','la','los','las','es','no','un','una','por']")

def _scan_queries_oracle_sql() -> str:
    """VALUES twin of q_scan_queries: same frozen query set, §T tokenizer
    applied to the query text in DuckDB."""
    qset = (BM25_QUERIES
            + [(100 + qid, text, k) for qid, text, k in BM25_AND_QUERIES])
    vals = ",\n  ".join(f"({qid}, '{text}', {k})" for qid, text, k in qset)
    toks_on_query = _TOKS_SQL.replace("lower(text)", "lower(query)")
    return f"""
WITH qset(query_id, query, k) AS (VALUES
  {vals})
SELECT query_id, k, unnest(list_distinct({toks_on_query})) AS term
FROM qset"""


#: shared from-first-principles index-layout scaffolding (used by the
#: index_manifest AND segment_stats twins — one definition so the
#: range-size rule / id-ordering convention can never diverge between
#: them): doc ids dense by (repo, path) [commit is a pure function of
#: doc_id], the engine's range_size doubling rule re-derived in SQL
#: (smallest power of two ≥1024 with n_docs // d ≤ DEFAULT_TARGET_RANGES,
#: capped 2^20), distinct (doc, term) pairs, (term, salt) group sizes.
_LAYOUT_CTES = f"""
WITH ids AS (
  SELECT row_number() OVER (ORDER BY source,
                            'doc/'||CAST(doc_id AS VARCHAR)) - 1 AS did,
         text
  FROM documents),
nn AS (SELECT count(*) AS n_docs FROM documents),
rs AS (
  SELECT COALESCE(MIN(p), 1048576) AS d
  FROM (VALUES (1024),(2048),(4096),(8192),(16384),(32768),(65536),
               (131072),(262144),(524288)) t(p)
  WHERE (SELECT n_docs FROM nn) // p <= 256),
tf AS (
  SELECT did, term FROM (
    SELECT did, unnest({_TOKS_SQL}) AS term FROM ids)
  GROUP BY did, term),
grp AS (
  SELECT term, did // (SELECT d FROM rs) AS salt, count(*) AS cnt
  FROM tf GROUP BY 1, 2)"""


ORACLE_SQL: dict[str, str] = {
    # manifest journal twin over the shared layout scaffolding: blocks =
    # ceil(group/128) per (term, salt); one 'start' + one 'done' row,
    # attempt 1 (the contract build is single-chunk, fresh)
    "index_manifest": f"""{_LAYOUT_CTES},
agg AS (
  SELECT (SELECT n_docs FROM nn)::BIGINT AS n_docs,
         (SELECT count(*) FROM tf)::BIGINT AS n_postings,
         COALESCE(SUM(CAST(CEIL(cnt / 128.0) AS BIGINT)), 0)::BIGINT
           AS n_blocks
  FROM grp)
SELECT 0::INTEGER AS chunk, 'start' AS status, 0::BIGINT AS n_docs,
       0::BIGINT AS n_postings, 0::BIGINT AS n_blocks, 1::INTEGER AS attempt
UNION ALL
SELECT 0::INTEGER, 'done', n_docs, n_postings, n_blocks, 1::INTEGER
FROM agg""",
    # per-SALT layout twin over the SAME scaffolding: the engine's
    # written block rows, grouped by doc range, must match
    # ceil(group/128) blocks and exact posting counts from raw text
    "segment_stats": f"""{_LAYOUT_CTES}
SELECT salt::BIGINT AS salt,
       SUM(CAST(CEIL(cnt / 128.0) AS BIGINT))::BIGINT AS n_blocks,
       SUM(cnt)::BIGINT AS n_postings
FROM grp GROUP BY salt""",
    # chunked-build + resume twin: the engine's chunking arithmetic
    # (chunk_docs = max(rsize, ceil(n/chunks/rsize)*rsize) at rsize=64,
    # n_chunks=3) and the true posting total, re-derived independently
    "build_resume": f"""
WITH nn AS (SELECT count(*) AS n FROM documents),
ck AS (SELECT GREATEST(64, CAST(CEIL(n / 3.0 / 64) AS BIGINT) * 64)
         AS chunk_docs FROM nn),
nc AS (SELECT GREATEST(1, CAST(CEIL((SELECT n FROM nn)
         / (SELECT chunk_docs FROM ck)::DOUBLE) AS INTEGER)) AS c),
tfc AS (SELECT count(*) AS p FROM (
  SELECT doc_id, term FROM (
    SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents)
  GROUP BY doc_id, term))
SELECT (SELECT c FROM nc) AS n_chunks,
       (SELECT c FROM nc) AS built_first,
       0::INTEGER AS built_resume,
       (SELECT c FROM nc) AS skipped_resume,
       (SELECT p FROM tfc)::BIGINT AS n_postings""",
    # streaming-converged-state twin: 10 source files at
    # maxFilesPerTrigger=8 -> exactly 2 availableNow epochs; ids dense;
    # meta n_postings = true distinct (doc, term) pair count
    "stream_ingest": f"""
WITH tfc AS (SELECT count(*) AS p FROM (
  SELECT doc_id, term FROM (
    SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents)
  GROUP BY doc_id, term))
SELECT 2::INTEGER AS n_epochs,
       (SELECT count(*) FROM documents)::INTEGER AS n_docs,
       1::INTEGER AS ids_dense,
       (SELECT p FROM tfc)::BIGINT AS n_postings""",
    "dictionary_stats": f"""
        SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf FROM (
          SELECT doc_id, term, count(*)::BIGINT AS tf FROM (
            SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents)
          GROUP BY doc_id, term)
        GROUP BY term""",
    "scan_queries": _scan_queries_oracle_sql(),
    "minhash_bands": f"""
        WITH {_SIGS_CTE}
        SELECT doc_id, band, band_key FROM bands""",
    "neardup_pairs": f"""
        WITH {_SIGS_CTE}
        SELECT id_a, id_b FROM cand""",
    "jaccard_pairs": f"""
        WITH {_SIGS_CTE},
        sizes AS (SELECT doc_id, count(*)::BIGINT AS n FROM dtoks GROUP BY 1),
        inter AS (
          SELECT c.id_a, c.id_b, count(*)::BIGINT AS i
          FROM cand c
          JOIN dtoks x ON x.doc_id = c.id_a
          JOIN dtoks y ON y.doc_id = c.id_b AND y.t = x.t
          GROUP BY 1, 2)
        SELECT id_a, id_b,
               ROUND(i * 1.0 / (sa.n + sb.n - i), 4) AS jaccard
        FROM inter JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.7""",
    "cosine_topk": f"""
        WITH p AS (SELECT embedding AS pv FROM embeddings WHERE vec_id = 0)
        SELECT vec_id, cosine FROM (
          SELECT e.vec_id,
                 ROUND({_DOT.format(a='e.embedding', b='pv')}
                       / (sqrt({_DOT.format(a='e.embedding',
                                            b='e.embedding')})
                          * sqrt({_DOT.format(a='pv', b='pv')})), 6)
                 AS cosine
          FROM embeddings e, p)
        ORDER BY cosine DESC, vec_id ASC LIMIT 10""",
    "lang_id": f"""
        WITH h AS (
          SELECT doc_id,
                 {', '.join(
                     f"len(list_intersect(list_distinct({_TOKS_SQL}), "
                     f"{_STOP_SQL[lg]})) AS hits_{lg}"
                     for lg in _STOP_SQL)}
          FROM documents)
        SELECT doc_id,
               CASE WHEN greatest(hits_en, hits_de, hits_fr, hits_es) = 0
                    THEN 'xx'
                    WHEN hits_de = greatest(hits_en, hits_de, hits_fr,
                                            hits_es) THEN 'de'
                    WHEN hits_en = greatest(hits_en, hits_de, hits_fr,
                                            hits_es) THEN 'en'
                    WHEN hits_es = greatest(hits_en, hits_de, hits_fr,
                                            hits_es) THEN 'es'
                    ELSE 'fr' END AS pred_lang,
               greatest(hits_en, hits_de, hits_fr, hits_es)::BIGINT
               AS best_hits
        FROM h""",
    "quality_score": f"""
        WITH q AS (
          SELECT doc_id,
                 len({_TOKS_SQL})::BIGINT AS n_tokens,
                 len(text) AS text_len,
                 len(regexp_replace(lower(text), '[^a-z0-9_]', '', 'g'))
                 AS alnum_len,
                 len(list_intersect(list_distinct({_TOKS_SQL}),
                                    {_ALL_STOP_SQL})) AS stop_hits
          FROM documents)
        SELECT doc_id, n_tokens,
               ROUND(CASE WHEN text_len > 0
                          THEN alnum_len * 1.0 / text_len ELSE 0 END, 4)
               AS alnum_ratio,
               ROUND(CASE WHEN n_tokens > 0
                          THEN stop_hits * 1.0 / n_tokens ELSE 0 END, 4)
               AS stop_ratio,
               ROUND(least(n_tokens / 100.0, 1.0) * 0.4
                     + CASE WHEN text_len > 0
                            THEN alnum_len * 1.0 / text_len ELSE 0 END * 0.4
                     + least(CASE WHEN n_tokens > 0
                                  THEN stop_hits * 10.0 / n_tokens
                                  ELSE 0 END, 1.0) * 0.2, 4) AS quality
        FROM q""",
    "tokenize_tf": f"""
        SELECT doc_id, term, count(*)::BIGINT AS tf FROM (
          SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents)
        GROUP BY doc_id, term""",
    "tokenize_tf_arrow": f"""
        SELECT doc_id, term, count(*)::BIGINT AS tf FROM (
          SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents)
        GROUP BY doc_id, term""",
    "doc_lengths": f"""
        SELECT doc_id, len({_TOKS_SQL})::BIGINT AS dl FROM documents""",
    "corpus_stats": f"""
        SELECT count(*)::BIGINT AS n_docs,
               ROUND(avg(dl), 6) AS avgdl,
               sum(dl)::BIGINT AS n_tokens
        FROM (SELECT len({_TOKS_SQL}) AS dl FROM documents)""",
    "doc_freq": f"""
        SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf FROM (
          SELECT doc_id, term, count(*)::BIGINT AS tf FROM (
            SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents)
          GROUP BY doc_id, term)
        GROUP BY term""",
    "filter_lang": """
        SELECT doc_id, lang, n_chars FROM documents
        WHERE lang IN ('en', 'de') AND n_chars > 200""",
    "distinct_counts": """
        SELECT count(DISTINCT lang)::BIGINT AS n_langs,
               count(DISTINCT source)::BIGINT AS n_sources,
               count(DISTINCT doc_id)::BIGINT AS n_docs
        FROM documents""",
    "sha256": "SELECT doc_id, sha256(text) AS sha FROM documents",
    "dup_contents": """
        SELECT sha256(text) AS sha, count(*)::BIGINT AS n
        FROM documents GROUP BY 1 HAVING count(*) > 1""",
    "doc_ids_dense": """
        SELECT source AS repo, 'doc/'||CAST(doc_id AS VARCHAR) AS path,
               row_number() OVER (ORDER BY source,
                                  'doc/'||CAST(doc_id AS VARCHAR)) - 1
               AS dense_id
        FROM documents""",
    "scalar_fns": """
        SELECT doc_id, len(text)::BIGINT AS text_len,
               upper(substr(text, 1, 8)) AS head8,
               ROUND(ln(1 + n_chars), 6) AS log_chars
        FROM documents""",
    "map_fns": f"""
        SELECT doc_id,
               COALESCE(max(CASE WHEN term = 'spark' THEN tf END), 0)::BIGINT
               AS tf_spark,
               count(*)::BIGINT AS n_terms
        FROM (
          SELECT doc_id, term, count(*)::BIGINT AS tf FROM (
            SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents)
          GROUP BY doc_id, term)
        GROUP BY doc_id""",
    "json_fns": """
        SELECT doc_id,
               json_extract_string(js, '$.lang') AS j_lang,
               CAST(json_extract(js, '$.n') AS BIGINT) AS j_n
        FROM (SELECT doc_id,
                     '{"lang":"' || lang || '","n":' ||
                     CAST(n_chars AS VARCHAR) || '}' AS js
              FROM documents)""",
    "udaf_rms": """
        SELECT lang,
               ROUND(sqrt(avg(n_chars * n_chars * 1.0)), 4) AS rms_chars,
               count(*)::BIGINT AS n
        FROM documents GROUP BY lang""",
    "range_join": """
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM documents a JOIN documents b
          ON a.lang = b.lang AND a.doc_id < b.doc_id
         AND abs(a.n_chars - b.n_chars) <= 4""",
    "cross_stats": """
        SELECT lang, source, n_l, n_s
        FROM (SELECT lang, count(*)::BIGINT AS n_l FROM documents
              GROUP BY lang)
        CROSS JOIN (SELECT source, count(*)::BIGINT AS n_s FROM documents
                    GROUP BY source)""",
    "conjunctive_and": f"""
        SELECT doc_id FROM (
          SELECT doc_id, term FROM (
            SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents)
          WHERE term IN ('spark', 'join') GROUP BY doc_id, term)
        GROUP BY doc_id HAVING count(DISTINCT term) = 2""",
    "semi_join": f"""
        SELECT doc_id, lang FROM documents
        WHERE list_contains({_TOKS_SQL}, 'spark')""",
    "union_langs": """
        SELECT doc_id FROM documents WHERE lang = 'en'
        UNION ALL SELECT doc_id FROM documents WHERE lang = 'de'""",
    "except_docs": """
        SELECT doc_id FROM documents WHERE lang = 'en'
        EXCEPT ALL SELECT doc_id FROM documents WHERE n_chars < 200""",
    "intersect_docs": """
        SELECT doc_id FROM documents WHERE lang = 'en'
        INTERSECT SELECT doc_id FROM documents WHERE n_chars > 300""",
    "topk_per_lang": """
        SELECT lang, rnk, doc_id, n_chars FROM (
          SELECT lang, doc_id, n_chars,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY n_chars DESC, doc_id ASC)
                 ::INT AS rnk
          FROM documents) WHERE rnk <= 3""",
    "running_sum": """
        SELECT source, doc_id,
               sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING)::BIGINT
               AS running
        FROM documents""",
    "lang_rollup": """
        SELECT COALESCE(lang, '<all>') AS lang,
               COALESCE(source, '<all>') AS source,
               count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS chars
        FROM documents GROUP BY ROLLUP(lang, source)""",
    "events_hourly": """
        SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour, event_type,
               count(*)::BIGINT AS n, ROUND(sum(value), 4) AS v
        FROM events GROUP BY 1, 2""",
    "lineitem_pricing": """
        SELECT l_returnflag, l_linestatus,
               ROUND(sum(l_quantity), 2) AS sum_qty,
               ROUND(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*)::BIGINT AS n_rows
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1997-09-01'
        GROUP BY l_returnflag, l_linestatus""",
    "revenue_by_nation": """
        SELECT n_name, count(*)::BIGINT AS n_orders,
               ROUND(sum(o_totalprice), 2) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name""",
    "bm25_topk": _BM25_ORACLE,
    "bm25_topk_sharded": _BM25_SHARDED_ORACLE,
    "bm25_topk_and": _BM25_AND_ORACLE,
    "bm25_topk_msm": _BM25_MSM_ORACLE,
    "bm25_topk_msm_sharded": _BM25_MSM_SHARDED_ORACLE,
    "bm25_topk_collapse": _BM25_COLLAPSE_ORACLE,
    "bm25_topk_collapse_sharded": _BM25_COLLAPSE_SHARDED_ORACLE,
    "bm25_phrase_topk": _BM25_PHRASE_ORACLE,
    "bm25_phrase_sharded": _BM25_PHRASE_SHARDED_ORACLE,
    "bm25_topk_prefix": _BM25_PREFIX_ORACLE,
    "bm25_topk_fuzzy": _BM25_FUZZY_ORACLE,
    "bm25_topk_wildcard": _BM25_WILDCARD_ORACLE,
    "bm25_topk_regexp": _BM25_REGEXP_ORACLE,
    "bm25_topk_prefix_sharded": _BM25_PREFIX_SHARDED_ORACLE,
    "bm25_topk_regexp_sharded": _BM25_REGEXP_SHARDED_ORACLE,
    "bm25_topk_bool": _BM25_BOOL_ORACLE,
    "bm25_topk_bool_sharded": _BM25_BOOL_SHARDED_ORACLE,
    "bm25_topk_boosted": _BM25_BOOST_ORACLE,
    "bm25_topk_boosted_sharded": _BM25_BOOST_SHARDED_ORACLE,
    "bm25_topk_deleted": _BM25_DELETED_ORACLE,
    "bm25_topk_delete_query": _BM25_DELETE_QUERY_ORACLE,
    "bm25_topk_page2": _BM25_PAGE2_ORACLE,
    # the cursor continuation must land on the SAME rows as offset
    # paging — one oracle, two engine paths certified against it
    "bm25_topk_after": _BM25_PAGE2_ORACLE,
    "bm25_topk_filtered": _BM25_FILTERED_ORACLE,
    "bm25_topk_range": _BM25_RANGE_ORACLE,
    "bm25_topk_range_not": _BM25_RANGE_NOT_ORACLE,
    "bm25_topk_filtered_or": _BM25_FILTERED_OR_ORACLE,
    "bm25_topk_filtered_not": _BM25_FILTERED_NOT_ORACLE,
    "lsh_ann_topk": _ann_oracle_sql(),
    # federated ANN ≡ unified (deterministic planes ⇒ shared bucket
    # space): the twin IS the unified oracle, unchanged
    "lsh_ann_topk_sharded": _ann_oracle_sql(),
    # tombstone visibility on the ANN path: same planes/buckets, the
    # deleted ids (vec_id % 5 == 0) dropped from candidates only
    "lsh_ann_topk_deleted": _ann_oracle_sql(keep_pred="vec_id % 5 != 0"),
    "lsh_ann_topk_filtered": _ann_oracle_sql(
        meta_pred="em.label IN (1, 2, 3)"),
    "ivf_ann_topk": _ivf_oracle_sql(),
    # shared-quantizer federation ≡ unified: the twin IS the unified
    # IVF oracle, unchanged
    "ivf_ann_topk_sharded": _ivf_oracle_sql(),
    "hybrid_topk": _hybrid_oracle_sql(),
    "more_like_this": _mlt_oracle_sql(),
    "facet_counts": _facet_counts_oracle_sql(),
    "facet_counts_filtered": _facet_counts_oracle_sql(
        count_col="source", extra_pred="d.lang = 'en'"),
    "facet_counts_range_filtered": _facet_counts_oracle_sql(
        extra_pred=f"length(d.text) BETWEEN {_RANGE_LO} AND {_RANGE_HI}"),
    "range_counts": _range_counts_oracle_sql(),
    "search_snippets": _snippets_oracle_sql(),
    "bm25_topk_upsert": _upsert_oracle_sql(),
    # backfilled facets must be indistinguishable from built-in ones:
    # the oracles ARE the built-in filtered pairs'
    "bm25_topk_facet_backfill": _BM25_FILTERED_ORACLE,
    "bm25_topk_range_backfill": _BM25_RANGE_ORACLE,
    "match_counts": _match_counts_oracle_sql(),
    "match_counts_pattern": _match_counts_pattern_oracle_sql(),
    "bm25_topk_synonyms": _synonyms_oracle_sql(BM25_SYN_QUERIES,
                                               SYNONYMS_MAP),
    "bm25_topk_synonyms_sharded": _sharded_wrap(
        _synonyms_oracle_sql(BM25_SYN_QUERIES, SYNONYMS_MAP)),
    "match_cardinality": _match_cardinality_oracle_sql(),
    "significant_terms": _significant_terms_oracle_sql(),
    "bm25_topk_rescored": _rescore_oracle_sql(),
    "percolate_matches": _percolate_oracle_sql(),
    "match_stats": _match_stats_oracle_sql(),
    "match_percentiles": _match_percentiles_oracle_sql(),
    "match_docs": _match_docs_oracle_sql(),
    "sorted_topk": _sorted_oracle_sql(with_doc_id=True),
    "sorted_topk_sharded": _sorted_oracle_sql(with_doc_id=False),
    "term_suggest": _term_suggest_oracle_sql(),
    "emb_neardup_pairs": _emb_neardup_oracle_sql(
        threshold=EMB_NEARDUP_THRESHOLD),
    # SQL twin of pipeline/dedup.simhash64: term hash = first 8 bytes of
    # sha256(term) (big-endian), acc_j = Σ tf·(2·bit_j − 1), sign bits
    # packed into a signed int64 (bit 63 via two's-complement offset)
    "simhash": f"""
        {_SIMHASH_CTES}
        SELECT d.doc_id, COALESCE(s.simhash, 0)::BIGINT AS simhash
        FROM documents d LEFT JOIN sim s ON s.doc_id = d.doc_id""",
    # Manku-style banded hamming pairs over the SAME fingerprint CTEs:
    # 4 × 16-bit bands (pigeonhole-complete at radius 3), band equi-join
    # candidates, bit_count(xor) filter
    "simhash_neardup_pairs": f"""
        {_SIMHASH_CTES}
        , sh AS (
          SELECT d.doc_id, COALESCE(s.simhash, 0)::BIGINT AS sh
          FROM documents d LEFT JOIN sim s ON s.doc_id = d.doc_id
        ), bands AS (
          SELECT doc_id, sh, b, (sh >> (16 * b::INT)) & 65535 AS bv
          FROM sh, (SELECT unnest(range(4)) AS b)
        ), cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b,
                 a.sh AS sa, b2.sh AS sb
          FROM bands a JOIN bands b2
            ON a.b = b2.b AND a.bv = b2.bv AND a.doc_id < b2.doc_id
        )
        SELECT id_a, id_b, hamming FROM (
          SELECT id_a, id_b, bit_count(xor(sa, sb))::INT AS hamming
          FROM cand)
        WHERE hamming <= 3""",
    # near-dup clusters = connected components of the SimHash pair
    # graph: same fingerprint/band/candidate CTEs, then a recursive
    # reachability walk — component id = min label reachable from each
    # node; docs in no pair cluster as themselves
    "neardup_components": f"""
        {_SIMHASH_CTES.replace("WITH dt AS", "WITH RECURSIVE dt AS", 1)}
        , sh AS (
          SELECT d.doc_id, COALESCE(s.simhash, 0)::BIGINT AS sh
          FROM documents d LEFT JOIN sim s ON s.doc_id = d.doc_id
        ), bands AS (
          SELECT doc_id, sh, b, (sh >> (16 * b::INT)) & 65535 AS bv
          FROM sh, (SELECT unnest(range(4)) AS b)
        ), cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b,
                 a.sh AS sa, b2.sh AS sb
          FROM bands a JOIN bands b2
            ON a.b = b2.b AND a.bv = b2.bv AND a.doc_id < b2.doc_id
        ), prs AS (
          SELECT id_a, id_b FROM cand
          WHERE bit_count(xor(sa, sb)) <= 3
        ), sym AS (
          SELECT id_a AS u, id_b AS v FROM prs
          UNION SELECT id_b, id_a FROM prs
        ), walk(u, lbl) AS (
          SELECT u, u AS lbl FROM (SELECT DISTINCT u FROM sym) t
          UNION
          SELECT s.u, w.lbl FROM sym s JOIN walk w ON w.u = s.v
        ), comp AS (
          SELECT u, min(lbl) AS c FROM walk GROUP BY u
        )
        SELECT d.doc_id, COALESCE(c.c, d.doc_id)::BIGINT AS cluster_id
        FROM documents d LEFT JOIN comp c ON c.u = d.doc_id""",
    # SQL twin of pipeline/textqual.winnow_fingerprints (k=4, w=5): Horner
    # polynomial of per-token sha256 hashes mod 2^64 (HUGEINT arithmetic —
    # products stay < 2^104), window-min, distinct, signed int64
    "winnow_fingerprints": f"""
        WITH toks AS (
          SELECT doc_id, unnest({_TOKS_SQL}) AS term,
                 unnest(range(len({_TOKS_SQL}))) AS pos
          FROM documents
        ), th AS (
          SELECT doc_id, pos,
                 CAST('0x' || substr(sha256(term), 1, 16)
                      AS UBIGINT)::HUGEINT AS h
          FROM toks
        ), n AS (SELECT doc_id, count(*)::BIGINT AS m FROM th GROUP BY 1),
        kg AS (
          SELECT a.doc_id, a.pos,
                 ((((((a.h * {_WINNOW_B_SQL} + b.h) % {1 << 64})
                     * {_WINNOW_B_SQL} + c.h) % {1 << 64})
                   * {_WINNOW_B_SQL} + d.h) % {1 << 64}) AS hk
          FROM th a JOIN th b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
          JOIN th c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
          JOIN th d ON d.doc_id = a.doc_id AND d.pos = a.pos + 3
        ), ws AS (
          SELECT doc_id, unnest(range(greatest(1, (m - 3) - 5 + 1))) AS s
          FROM n WHERE m - 3 >= 1
        ), mins AS (
          SELECT w.doc_id, w.s, min(k.hk) AS fp
          FROM ws w JOIN kg k ON k.doc_id = w.doc_id
           AND k.pos >= w.s AND k.pos < w.s + 5
          GROUP BY 1, 2
        )
        SELECT DISTINCT doc_id,
          CAST(fp - CASE WHEN fp >= 9223372036854775808
                         THEN 18446744073709551616::HUGEINT ELSE 0 END
               AS BIGINT) AS fingerprint
        FROM mins""",
    # exact SQL twin of pipeline/multimodal._fake_decode over UTF-8 payloads:
    # feature[dim] = float32(u32 / 2^32) where u32 = 4 bytes of
    # sha256(text || str(dim // 8)) at offset (dim % 8) * 4
    "media_features": """
        WITH m AS (
          SELECT doc_id AS media_id,
                 CASE doc_id % 3 WHEN 0 THEN 'image'
                                 WHEN 1 THEN 'audio'
                                 ELSE 'video' END AS kind,
                 sha256(text || '0') AS h0, sha256(text || '1') AS h1
          FROM documents
        ), d AS (
          SELECT media_id, kind, dim,
                 CASE WHEN dim < 8 THEN substr(h0, dim * 8 + 1, 8)
                      ELSE substr(h1, (dim - 8) * 8 + 1, 8) END AS hx
          FROM m, (SELECT unnest(range(16)) AS dim)
        )
        SELECT media_id, kind, dim::INT AS dim,
               ROUND(CAST(CAST('0x' || hx AS UBIGINT) / 4294967296.0
                          AS FLOAT)::DOUBLE, 6) AS value
        FROM d""",
}

QUERIES = {
    "tokenize_tf": q_tokenize_tf,
    "tokenize_tf_arrow": q_tokenize_tf_arrow,
    "doc_lengths": q_doc_lengths,
    "corpus_stats": q_corpus_stats,
    "doc_freq": q_doc_freq,
    "filter_lang": q_filter_lang,
    "distinct_counts": q_distinct_counts,
    "sha256": q_sha256,
    "dup_contents": q_dup_contents,
    "doc_ids_dense": q_doc_ids_dense,
    "scalar_fns": q_scalar_fns,
    "conjunctive_and": q_conjunctive_and,
    "map_fns": q_map_fns,
    "json_fns": q_json_fns,
    "udaf_rms": q_udaf_rms,
    "range_join": q_range_join,
    "cross_stats": q_cross_stats,
    "semi_join": q_semi_join,
    "union_langs": q_union_langs,
    "except_docs": q_except_docs,
    "intersect_docs": q_intersect_docs,
    "topk_per_lang": q_topk_per_lang,
    "running_sum": q_running_sum,
    "lang_rollup": q_lang_rollup,
    "events_hourly": q_events_hourly,
    "lineitem_pricing": q_lineitem_pricing,
    "revenue_by_nation": q_revenue_by_nation,
    "bm25_topk": q_bm25_topk,
    "bm25_topk_sharded": q_bm25_topk_sharded,
    "bm25_topk_and": q_bm25_topk_and,
    "bm25_topk_msm": q_bm25_topk_msm,
    "bm25_topk_msm_sharded": q_bm25_topk_msm_sharded,
    "bm25_topk_collapse": q_bm25_topk_collapse,
    "bm25_topk_collapse_sharded": q_bm25_topk_collapse_sharded,
    "bm25_phrase_topk": q_bm25_phrase_topk,
    "bm25_phrase_sharded": q_bm25_phrase_sharded,
    "bm25_topk_prefix": q_bm25_topk_prefix,
    "bm25_topk_fuzzy": q_bm25_topk_fuzzy,
    "bm25_topk_wildcard": q_bm25_topk_wildcard,
    "bm25_topk_regexp": q_bm25_topk_regexp,
    "bm25_topk_prefix_sharded": q_bm25_topk_prefix_sharded,
    "bm25_topk_regexp_sharded": q_bm25_topk_regexp_sharded,
    "bm25_topk_bool": q_bm25_topk_bool,
    "bm25_topk_bool_sharded": q_bm25_topk_bool_sharded,
    "bm25_topk_boosted": q_bm25_topk_boosted,
    "bm25_topk_boosted_sharded": q_bm25_topk_boosted_sharded,
    "bm25_topk_deleted": q_bm25_topk_deleted,
    "bm25_topk_delete_query": q_bm25_topk_delete_query,
    "bm25_topk_page2": q_bm25_topk_page2,
    "bm25_topk_after": q_bm25_topk_after,
    "bm25_topk_filtered_or": q_bm25_topk_filtered_or,
    "bm25_topk_filtered_not": q_bm25_topk_filtered_not,
    "bm25_topk_filtered": q_bm25_topk_filtered,
    "bm25_topk_range": q_bm25_topk_range,
    "bm25_topk_range_not": q_bm25_topk_range_not,
    "dictionary_stats": q_dictionary_stats,
    "scan_queries": q_scan_queries,
    # training-data pipeline ops
    "minhash_bands": q_minhash_bands,
    "neardup_pairs": q_neardup_pairs,
    "jaccard_pairs": q_jaccard_pairs,
    "cosine_topk": q_cosine_topk,
    "lang_id": q_lang_id,
    "quality_score": q_quality_score,
    # engine-internal surfaces (SQL twins recompute the expected values
    # from raw text + the engine's published arithmetic)
    "build_resume": q_build_resume,
    "stream_ingest": q_stream_ingest,
    "index_manifest": q_index_manifest,
    "segment_stats": q_segment_stats,
    "simhash": q_simhash,
    "winnow_fingerprints": q_winnow_fingerprints,
    "lsh_ann_topk": q_lsh_ann_topk,
    "lsh_ann_topk_sharded": q_lsh_ann_topk_sharded,
    "lsh_ann_topk_deleted": q_lsh_ann_topk_deleted,
    "lsh_ann_topk_filtered": q_lsh_ann_topk_filtered,
    "ivf_ann_topk": q_ivf_ann_topk,
    "ivf_ann_topk_sharded": q_ivf_ann_topk_sharded,
    "hybrid_topk": q_hybrid_topk,
    "more_like_this": q_more_like_this,
    "facet_counts": q_facet_counts,
    "facet_counts_filtered": q_facet_counts_filtered,
    "facet_counts_range_filtered": q_facet_counts_range_filtered,
    "range_counts": q_range_counts,
    "search_snippets": q_search_snippets,
    "bm25_topk_upsert": q_bm25_topk_upsert,
    "bm25_topk_facet_backfill": q_bm25_topk_facet_backfill,
    "bm25_topk_range_backfill": q_bm25_topk_range_backfill,
    "match_counts": q_match_counts,
    "match_counts_pattern": q_match_counts_pattern,
    "bm25_topk_synonyms": q_bm25_topk_synonyms,
    "bm25_topk_synonyms_sharded": q_bm25_topk_synonyms_sharded,
    "match_cardinality": q_match_cardinality,
    "significant_terms": q_significant_terms,
    "bm25_topk_rescored": q_bm25_topk_rescored,
    "percolate_matches": q_percolate,
    "match_stats": q_match_stats,
    "match_percentiles": q_match_percentiles,
    "match_docs": q_match_docs,
    "sorted_topk": q_sorted_topk,
    "sorted_topk_sharded": q_sorted_topk_sharded,
    "term_suggest": q_term_suggest,
    "emb_neardup_pairs": q_emb_neardup_pairs,
    "simhash_neardup_pairs": q_simhash_neardup_pairs,
    "neardup_components": q_neardup_components,
    "media_features": q_media_features,
}
