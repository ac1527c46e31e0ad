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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.tokenize import tokenize_expr
from .operators.doc_ids import assign_doc_ids
from .sources.corpus import documents_as_corpus

# ---------------------------------------------------------------------------
# shared pieces
# ---------------------------------------------------------------------------

#: §T tokenizer in ANSI-ish DuckDB SQL over the raw `documents` view
_TOKS_SQL = ("list_filter(regexp_extract_all(lower(text), '[a-z0-9_]+'), "
             "t -> len(t) BETWEEN 2 AND 64)")

#: BM25 reference query set for the flagship (terms exist in documents.text)
BM25_QUERIES: list[tuple[int, str, int]] = [
    (0, "spark join filter", 10),
    (1, "group sort merge", 10),
    (2, "customer row", 10),
    (3, "window", 10),
    (4, "stream batch value", 10),
    (5, "zz_oov_token", 10),
]

_INDEX_CACHE: dict[str, str] = {}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _doc_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, term, tf) via built-ins — the ◇ oracle path for op 11."""
    return (_docs(spark, sf_dir)
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
        build_index(spark, documents_as_corpus(spark, sf_dir), out)
        _INDEX_CACHE[sf_dir] = out
    return _INDEX_CACHE[sf_dir]


# ---------------------------------------------------------------------------
# ◇ queries — Spark side
# ---------------------------------------------------------------------------

def q_tokenize_tf(spark, sf_dir):
    """ops 10/11/12/14 — tokenizer + explode + tf."""
    return _doc_terms(spark, sf_dir).select("doc_id", "term", "tf")


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
    """op 20 — df/cf per term."""
    return (_doc_terms(spark, sf_dir)
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


# ---------------------------------------------------------------------------
# training-data pipeline ◇ ops (dedup / similarity / text analysis)
# ---------------------------------------------------------------------------

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
# rows-only entries (engine internals — no SQL equivalent; driver records a
# weaker rows>0 check, SURVEY §3.4)
# ---------------------------------------------------------------------------

def q_simhash(spark, sf_dir):
    """64-bit SimHash fingerprints (bit-parallel numpy; tested vs a
    pure-Python oracle in tests/test_pipeline.py)."""
    from .pipeline.dedup import simhash64
    return simhash64(_docs(spark, sf_dir))


def q_winnow_fingerprints(spark, sf_dir):
    """Winnowing document fingerprints (Schleimer et al. 2003)."""
    from .pipeline.textqual import winnow_fingerprints
    return winnow_fingerprints(_docs(spark, sf_dir))


def q_lsh_ann_topk(spark, sf_dir):
    """Random-hyperplane LSH ANN over embeddings (recall tested vs brute
    force in tests/test_pipeline.py)."""
    from .pipeline.similarity import lsh_ann_topk
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return lsh_ann_topk(emb, _probe_vec(spark, sf_dir), k=10)


def q_media_features(spark, sf_dir):
    """Multimodal plumbing: binary payloads -> feature vectors via
    mapInPandas (decode stubbed deterministically — no codecs in image)."""
    from .pipeline.multimodal import extract_media_features, synth_media
    return extract_media_features(synth_media(spark, n=64), decode="fake")

def q_index_manifest(spark, sf_dir):
    """op 4/29 surface — per-chunk lineage + metrics journal."""
    return (spark.read.parquet(f"{contract_index_dir(spark, sf_dir)}/manifest")
            .select("chunk", "status", "n_docs", "n_postings", "n_blocks",
                    "bytes_out", "attempt", "job_id"))


def q_segment_stats(spark, sf_dir):
    """compressed-block layout surface (K1–K5)."""
    seg = spark.read.option(
        "basePath", f"{contract_index_dir(spark, sf_dir)}/segments").parquet(
        f"{contract_index_dir(spark, sf_dir)}/segments")
    return (seg.groupBy("bucket")
            .agg(F.count("*").alias("n_blocks"),
                 F.sum("n_docs").alias("n_postings"),
                 F.sum(F.length("docids_blob") + F.length("tfs_blob")
                       + F.length("dls_blob")).alias("bytes")))


# ---------------------------------------------------------------------------
# DuckDB oracle SQL (views documents/events/lineitem/... pre-registered)
# ---------------------------------------------------------------------------

_BM25_ORACLE = f"""
WITH ordered AS (
  SELECT row_number() OVER (ORDER BY source, 'doc/'||CAST(doc_id AS VARCHAR))
         - 1 AS d, text FROM documents
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
  (0, 'spark', 10), (0, 'join', 10), (0, 'filter', 10),
  (1, 'group', 10), (1, 'sort', 10), (1, 'merge', 10),
  (2, 'customer', 10), (2, 'row', 10),
  (3, 'window', 10),
  (4, 'stream', 10), (4, 'batch', 10), (4, 'value', 10),
  (5, 'zz_oov_token', 10)
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
)
SELECT query_id, rank::INT AS rank, doc_id, score
FROM ranked WHERE rank <= k
"""


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

ORACLE_SQL: dict[str, str] = {
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
    "conjunctive_and": f"""
        SELECT doc_id FROM (
          SELECT doc_id, term FROM (
            SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents)
          WHERE term IN ('spark', 'join') GROUP BY doc_id, term)
        GROUP BY doc_id HAVING count(DISTINCT term) = 2""",
    "semi_join": """
        SELECT doc_id, lang FROM documents
        WHERE list_contains(regexp_extract_all(lower(text),
                            '[a-z0-9_]+'), 'spark')""",
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
}

QUERIES = {
    "tokenize_tf": q_tokenize_tf,
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
    # training-data pipeline ops
    "minhash_bands": q_minhash_bands,
    "neardup_pairs": q_neardup_pairs,
    "jaccard_pairs": q_jaccard_pairs,
    "cosine_topk": q_cosine_topk,
    "lang_id": q_lang_id,
    "quality_score": q_quality_score,
    # rows-only (engine internals / no SQL oracle; pytest-verified instead)
    "index_manifest": q_index_manifest,
    "segment_stats": q_segment_stats,
    "simhash": q_simhash,
    "winnow_fingerprints": q_winnow_fingerprints,
    "lsh_ann_topk": q_lsh_ann_topk,
    "media_features": q_media_features,
}
