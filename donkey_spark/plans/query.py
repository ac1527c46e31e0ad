"""Entry point B — top-k BM25 query (SURVEY §3.3).

Donkey's search lifecycle (extract → per-feature index probe → Matcher
aggregate → top-K Hits `[donkey:src/donkey.cpp — unverified, SURVEY §0]`)
re-expressed Spark-first:

  tokenize queries (driver-side, §T) → dictionary lookup (bucket+term
  parquet pruning, collected — dozens of rows) → segments scan pruned by
  bucket partition dirs + term row-group stats → ONE groupBy(salt)
  applyInPandas running the block-max scorer per doc range (every term's
  postings for a range co-partition by the global range salt, so a doc's
  whole score forms inside one group — no per-doc shuffle) → per-range
  bounded top-k → global window rank → doc-metadata fetch by pushed-down
  doc_id IN (...) filter.

The score stage's exchange moves only block rows of the queried terms; the
final exchange moves ≤ k rows per range. Rank identity: float64 BM25 (K6),
ties by ascending doc_id.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.tokenize import tokenize_py
from ..kernels.bm25 import idf as bm25_idf
from ..kernels.wand import TermBlocks, score_range_topk
from ..operators.postings import term_bucket_py

_RESULT_SCHEMA = ("query_id int, rank int, doc_id long, score double, "
                  "repo string, path string")


class Index:
    """Reader over a built index directory (plans/build.py layout)."""

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.dir = index_dir
        m = spark.read.parquet(f"{index_dir}/meta").collect()[0]
        self.n_docs = int(m["n_docs"])
        self.avgdl = float(m["avgdl"])
        self.range_size = int(m["range_size"])
        self.codec = m["codec"]
        self.n_buckets = int(m["n_buckets"])

    # -- planning helpers -------------------------------------------------
    def _lookup_terms(self, terms: list[str]) -> dict[str, int]:
        """term -> df via dictionary, pruned by bucket dirs + term stats."""
        if not terms:
            return {}
        buckets = sorted({term_bucket_py(t, self.n_buckets) for t in terms})
        rows = (self.spark.read.parquet(f"{self.dir}/dictionary")
                .where(F.col("bucket").isin(buckets)
                       & F.col("term").isin(terms))
                .select("term", "df").collect())
        return {r["term"]: int(r["df"]) for r in rows}

    # -- search ------------------------------------------------------------
    def search_batch(self, queries: list[tuple[int, str, int]]) -> DataFrame:
        """queries: [(query_id, text, k)] -> DataFrame(query_id, rank,
        doc_id, score, repo, path) ordered by (query_id, rank)."""
        spark = self.spark
        parsed = {qid: (sorted(set(tokenize_py(text))), k)
                  for qid, text, k in queries}
        all_terms = sorted({t for ts, _ in parsed.values() for t in ts})
        dfs = self._lookup_terms(all_terms)
        live_terms = [t for t in all_terms if t in dfs]
        if not live_terms:
            return spark.createDataFrame([], _RESULT_SCHEMA)
        idf_map = {t: float(bm25_idf(self.n_docs, dfs[t]))
                   for t in live_terms}
        qplan = [(qid, [t for t in ts if t in idf_map], k)
                 for qid, (ts, k) in parsed.items()]
        qplan = [q for q in qplan if q[1]]

        buckets = sorted({term_bucket_py(t, self.n_buckets)
                          for t in live_terms})
        seg = (spark.read.option("basePath", f"{self.dir}/segments")
               .parquet(f"{self.dir}/segments")
               .where(F.col("bucket").isin(buckets)         # dir pruning
                      & F.col("term").isin(live_terms)))    # row-group stats

        base_mult, codec, avgdl = self.range_size, self.codec, self.avgdl

        def score_fn(pdf: pd.DataFrame) -> pd.DataFrame:
            salt = int(pdf["salt"].iloc[0])
            base = salt * base_mult
            by_term: dict[str, list[dict]] = {}
            for term, g in pdf.groupby("term", sort=False):
                recs = g.sort_values("block_id").to_dict("records")
                for r in recs:
                    r["codec"] = codec
                by_term[term] = recs
            out_q, out_d, out_s = [], [], []
            for qid, terms, k in qplan:
                tbs = [TermBlocks(idf_map[t], by_term[t])
                       for t in terms if t in by_term]
                if not tbs:
                    continue
                ids, sc = score_range_topk(base, base_mult, tbs, avgdl, k)
                out_q.extend([qid] * len(ids))
                out_d.extend(ids.tolist())
                out_s.extend(sc.tolist())
            return pd.DataFrame({"query_id": pd.Series(out_q, dtype="int32"),
                                 "doc_id": pd.Series(out_d, dtype="int64"),
                                 "score": pd.Series(out_s, dtype="float64")})

        scored = seg.groupBy("salt").applyInPandas(
            score_fn, "query_id int, doc_id long, score double")

        w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                                   F.asc("doc_id"))
        ks = spark.createDataFrame([(qid, k) for qid, _, k in qplan],
                                   "query_id int, k int")
        topk = (scored.withColumn("rank", F.row_number().over(w))
                .join(F.broadcast(ks), "query_id")
                .where(F.col("rank") <= F.col("k"))
                .select("query_id", "rank", "doc_id", "score"))

        hits = topk.collect()          # ≤ Σk rows — drives doc_id pushdown
        if not hits:
            return spark.createDataFrame([], _RESULT_SCHEMA)
        ids = sorted({r["doc_id"] for r in hits})
        docs = (spark.read.parquet(f"{self.dir}/docs")
                .where(F.col("doc_id").isin(ids))       # pushed to parquet
                .select("doc_id", "repo", "path"))
        hits_df = spark.createDataFrame(
            hits, "query_id int, rank int, doc_id long, score double")
        return (hits_df.join(F.broadcast(docs), "doc_id")
                .select("query_id", "rank", "doc_id", "score", "repo", "path")
                .orderBy("query_id", "rank"))

    def search(self, text: str, k: int = 10) -> DataFrame:
        return self.search_batch([(0, text, k)]).drop("query_id")
