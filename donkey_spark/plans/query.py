"""Entry point B — top-k BM25 query (SURVEY §3.3).

Donkey's search lifecycle (extract → per-feature index probe → Matcher
aggregate → top-K Hits `[donkey:src/donkey.cpp — unverified, SURVEY §0]`)
re-expressed Spark-first:

  tokenize queries (driver-side, §T) → dictionary lookup (bucket+term
  parquet pruning, memoized across queries) → segments scan pruned by
  bucket partition dirs + term row-group stats → ONE groupBy(salt)
  applyInPandas running the block-max scorer per doc range (every term's
  postings for a range co-partition by the global range salt, so a doc's
  whole score forms inside one group — no per-doc shuffle) → per-range
  bounded top-k (≤ k rows per range reach the driver) → driver merge with
  the (score desc, doc_id asc) tie-break → doc-metadata fetch by
  pushed-down doc_id IN (...) filter.

Latency design (donkey keeps its index RAM-resident; the Spark analog):
DataFrame handles for segments/dictionary/docs are built once per Index so
file listings and schema stay cached; `cache=True` persists the segment
blocks in executor memory; per-term dictionary rows are memoized on the
driver. A query then costs exactly two Spark jobs (score + metadata fetch),
plus one dictionary probe per never-seen term.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.tokenize import tokenize_py
from ..kernels.bm25 import idf as bm25_idf
from ..kernels.wand import (TermBlocks, score_range_topk,
                            score_range_topk_and)
from ..operators.postings import term_bucket_py

_RESULT_SCHEMA = ("query_id int, rank int, doc_id long, score double, "
                  "repo string, path string")


class Index:
    """Reader over a built index directory (plans/build.py layout)."""

    def __init__(self, spark: SparkSession, index_dir: str,
                 cache: bool = False):
        self.spark = spark
        self.dir = index_dir
        m = spark.read.parquet(f"{index_dir}/meta").collect()[0]
        self.n_docs = int(m["n_docs"])
        self.avgdl = float(m["avgdl"])
        self.range_size = int(m["range_size"])
        self.codec = m["codec"]
        self.n_buckets = int(m["n_buckets"])
        self._seg = spark.read.option(
            "basePath", f"{index_dir}/segments").parquet(
            f"{index_dir}/segments")
        self._dict = spark.read.parquet(f"{index_dir}/dictionary")
        self._docs = spark.read.parquet(f"{index_dir}/docs")
        self._df_memo: dict[str, int | None] = {}
        if cache:
            self._seg = self._seg.persist()
            self._seg.count()          # materialize the warm index

    # -- planning helpers -------------------------------------------------
    def _lookup_terms(self, terms: list[str]) -> dict[str, int]:
        """term -> df via dictionary (bucket dirs + term stats pruning);
        memoized — repeated terms never re-probe parquet."""
        missing = [t for t in terms if t not in self._df_memo]
        if missing:
            buckets = sorted({term_bucket_py(t, self.n_buckets)
                              for t in missing})
            rows = (self._dict
                    .where(F.col("bucket").isin(buckets)
                           & F.col("term").isin(missing))
                    .select("term", "df").collect())
            found = {r["term"]: int(r["df"]) for r in rows}
            for t in missing:
                self._df_memo[t] = found.get(t)
        return {t: self._df_memo[t] for t in terms
                if self._df_memo.get(t) is not None}

    # -- search ------------------------------------------------------------
    def search_batch(self, queries: list[tuple[int, str, int]],
                     mode: str = "or") -> DataFrame:
        """queries: [(query_id, text, k)] -> DataFrame(query_id, rank,
        doc_id, score, repo, path) ordered by (query_id, rank).

        mode="or" (default): disjunctive block-max scoring. mode="and":
        conjunctive — only docs containing EVERY query term score (op 32
        intersection fast path); a query with any out-of-dictionary term
        returns no rows (no doc can contain it)."""
        if mode not in ("or", "and"):
            raise ValueError(mode)
        spark = self.spark
        parsed = {qid: (sorted(set(tokenize_py(text))), k)
                  for qid, text, k in queries}
        all_terms = sorted({t for ts, _ in parsed.values() for t in ts})
        dfs = self._lookup_terms(all_terms)
        live_terms = sorted(dfs)
        if not live_terms:
            return spark.createDataFrame([], _RESULT_SCHEMA)
        idf_map = {t: float(bm25_idf(self.n_docs, dfs[t]))
                   for t in live_terms}
        qplan = [(qid, [t for t in ts if t in idf_map], k)
                 for qid, (ts, k) in parsed.items()
                 if mode == "or" or all(t in idf_map for t in ts)]
        qplan = [q for q in qplan if q[1]]
        if not qplan:
            return spark.createDataFrame([], _RESULT_SCHEMA)

        needed = sorted({t for _, ts, _ in qplan for t in ts})
        buckets = sorted({term_bucket_py(t, self.n_buckets)
                          for t in needed})
        seg = self._seg.where(F.col("bucket").isin(buckets)   # dir pruning
                              & F.col("term").isin(needed))

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
                if mode == "and":
                    ids, sc = score_range_topk_and(
                        base, base_mult, tbs, avgdl, k, len(terms))
                else:
                    ids, sc = score_range_topk(base, base_mult, tbs,
                                               avgdl, k)
                out_q.extend([qid] * len(ids))
                out_d.extend(ids.tolist())
                out_s.extend(sc.tolist())
            return pd.DataFrame({"query_id": pd.Series(out_q, dtype="int32"),
                                 "doc_id": pd.Series(out_d, dtype="int64"),
                                 "score": pd.Series(out_s, dtype="float64")})

        scored = seg.groupBy("salt").applyInPandas(
            score_fn, "query_id int, doc_id long, score double")

        # Global top-k (op 35). Candidates are ≤ k per (query, touched
        # range). Small bound → merge on the driver (TakeOrdered analog,
        # saves a window+join job pair per call); large bound (hot terms ×
        # many ranges at cluster scale) → distributed window rank first.
        ks = {qid: k for qid, _, k in qplan}
        n_ranges = max(1, (self.n_docs + self.range_size - 1)
                       // self.range_size)
        cand_bound = sum(min(k, self.n_docs) for k in ks.values()) * n_ranges
        if cand_bound > 1_000_000:
            from pyspark.sql import Window
            w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                                       F.asc("doc_id"))
            ksdf = spark.createDataFrame(list(ks.items()), "query_id int, k int")
            scored = (scored.withColumn("rank", F.row_number().over(w))
                      .join(F.broadcast(ksdf), "query_id")
                      .where(F.col("rank") <= F.col("k"))
                      .drop("rank", "k"))
        cand = scored.collect()                       # Spark job 1
        by_q: dict[int, list] = {}
        for r in cand:
            by_q.setdefault(r["query_id"], []).append(r)
        hits = []
        for qid, rows in by_q.items():
            rows.sort(key=lambda r: (-r["score"], r["doc_id"]))
            hits.extend((qid, rk + 1, r["doc_id"], r["score"])
                        for rk, r in enumerate(rows[:ks[qid]]))
        if not hits:
            return spark.createDataFrame([], _RESULT_SCHEMA)

        ids = sorted({h[2] for h in hits})
        meta = {r["doc_id"]: (r["repo"], r["path"]) for r in
                self._docs.where(F.col("doc_id").isin(ids))  # pushed down
                .select("doc_id", "repo", "path").collect()}  # Spark job 2
        rows = [(qid, rk, d, s, *meta.get(d, (None, None)))
                for qid, rk, d, s in sorted(hits)]
        return spark.createDataFrame(rows, _RESULT_SCHEMA)

    def search(self, text: str, k: int = 10,
               mode: str = "or") -> DataFrame:
        return self.search_batch([(0, text, k)], mode=mode).drop("query_id")
