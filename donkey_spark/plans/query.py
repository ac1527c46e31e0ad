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

Single-query latency fast path: when the dictionary-estimated pruned
posting bytes fall under `local_bytes` (default 64 MB) and the index is on
a local filesystem, the SAME per-salt kernel runs on the driver over a
pyarrow scan of the probed bucket dirs — zero Spark jobs, ~50-200 ms
instead of ~2 s of fixed job overhead. Hot terms, big batches, or remote
storage automatically fall back to the distributed path; results are
bit-identical (shared scorer, shared merge).
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

#: columns the scorer needs from segment block rows
_SEG_COLS = ["term", "salt", "block_id", "first_doc_id", "max_doc_id",
             "block_max_tfpart", "n_docs", "docids_blob", "tfs_blob",
             "dls_blob"]

#: conservative bytes-per-posting for the local-path estimate (measured
#: ~4.2 B of blob + parquet row overhead amortized over 128-posting blocks)
_BYTES_PER_POSTING = 8


_REC_COLS = ["first_doc_id", "max_doc_id", "block_max_tfpart", "n_docs",
             "docids_blob", "tfs_blob", "dls_blob"]


def _make_group_scorer(qplan, idf_map, mode, base_mult, avgdl):
    """(salt, by_term) -> (qids, doc_ids, scores) — the per-doc-range
    scoring core, shared verbatim by the distributed (applyInPandas) and
    driver-local (pyarrow) paths: identical kernels, identical results."""

    def score_group(salt: int, by_term: dict[str, list[dict]]):
        base = salt * base_mult
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
                ids, sc = score_range_topk(base, base_mult, tbs, avgdl, k)
            out_q.extend([qid] * len(ids))
            out_d.extend(ids.tolist())
            out_s.extend(sc.tolist())
        return out_q, out_d, out_s

    return score_group


def _make_score_fn(qplan, idf_map, mode, base_mult, codec, avgdl):
    """pandas wrapper over the group scorer for the applyInPandas path."""
    score_group = _make_group_scorer(qplan, idf_map, mode, base_mult, avgdl)

    def score_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        salt = int(pdf["salt"].iloc[0])
        by_term: dict[str, list[dict]] = {}
        for term, g in pdf.groupby("term", sort=False):
            gs = g.sort_values("block_id")
            arrs = [gs[c].to_numpy() for c in _REC_COLS]
            # plain zip over numpy columns — ~60x faster than pandas
            # to_dict('records'), which dominates block-heavy queries
            recs = [dict(zip(_REC_COLS, row), codec=codec)
                    for row in zip(*arrs)]
            by_term[term] = recs
        out_q, out_d, out_s = score_group(salt, by_term)
        return pd.DataFrame({"query_id": pd.Series(out_q, dtype="int32"),
                             "doc_id": pd.Series(out_d, dtype="int64"),
                             "score": pd.Series(out_s, dtype="float64")})

    return score_fn


class Index:
    """Reader over a built index directory (plans/build.py layout)."""

    def __init__(self, spark: SparkSession, index_dir: str,
                 cache: bool = False, local_bytes: int = 64 << 20):
        """local_bytes: when the index lives on a local filesystem and the
        estimated pruned posting bytes for a query batch fall under this
        bound, score on the DRIVER via pyarrow (same kernels, zero Spark
        jobs) — the analog of donkey serving from its RAM-resident index.
        0 disables the fast path. The distributed path takes over
        automatically for hot terms / big batches / remote storage."""
        from ..fsutil import fs_is_local, local_path
        self.spark = spark
        self.dir = index_dir
        # gate on the RESOLVED filesystem, not the path string: a
        # scheme-less path means fs.defaultFS (HDFS on a real cluster)
        # to Spark but the local disk to pyarrow — only scheme == 'file'
        # makes the driver-side reads coherent
        self.local_bytes = (local_bytes
                            if fs_is_local(spark, index_dir) else 0)
        self._local_dir = local_path(index_dir)
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
        memoized — repeated terms never re-probe parquet. On a local
        filesystem the probe is a pyarrow row-group-pruned read (~ms);
        remote storage uses the Spark scan."""
        missing = [t for t in terms if t not in self._df_memo]
        if missing:
            buckets = sorted({term_bucket_py(t, self.n_buckets)
                              for t in missing})
            if self.local_bytes > 0:
                import pyarrow.dataset as ds
                tbl = self._pa_dataset("dictionary").to_table(
                    columns=["term", "df"],
                    filter=ds.field("bucket").isin(buckets)
                    & ds.field("term").isin(missing))
                found = dict(zip(tbl["term"].to_pylist(),
                                 (int(x) for x in tbl["df"].to_pylist())))
            else:
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
    def search_rows(self, queries: list[tuple[int, str, int]],
                    mode: str = "or") -> list[tuple]:
        """queries: [(query_id, text, k)] -> fully-materialized result rows
        [(query_id, rank, doc_id, score, repo, path)] sorted by
        (query_id, rank) — the serving-layer surface (donkey's Hits
        analog; results are ≤ Σk rows by construction, never distributed).

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
            return []
        idf_map = {t: float(bm25_idf(self.n_docs, dfs[t]))
                   for t in live_terms}
        qplan = [(qid, [t for t in ts if t in idf_map], k)
                 for qid, (ts, k) in parsed.items()
                 if mode == "or" or all(t in idf_map for t in ts)]
        qplan = [q for q in qplan if q[1]]
        if not qplan:
            return []

        needed = sorted({t for _, ts, _ in qplan for t in ts})
        buckets = sorted({term_bucket_py(t, self.n_buckets)
                          for t in needed})
        # Cost model: the scorer touches each query's terms' postings, so
        # driver-local WORK is Σ_q Σ_{t∈q} df(t) — not the union — while
        # the distributed path amortizes one ~2 s job over all queries and
        # all cores. Go local only when the single-threaded work is small.
        est_work = sum(dfs[t] for _, ts, _ in qplan
                       for t in ts) * _BYTES_PER_POSTING
        use_local = 0 < est_work <= self.local_bytes

        if use_local:
            # driver-local scoring: pyarrow reads ONLY the probed bucket
            # dirs + term-pruned row groups (same pruning the Spark scan
            # does), then the identical per-salt kernel runs in-process —
            # no Spark job. Bounded by est_work ≤ local_bytes.
            scorer = _make_group_scorer(qplan, idf_map, mode,
                                        self.range_size, self.avgdl)
            cand = self._local_candidates(needed, buckets, scorer)
        else:
            score_fn = _make_score_fn(qplan, idf_map, mode, self.range_size,
                                      self.codec, self.avgdl)
            seg = self._seg.where(F.col("bucket").isin(buckets)  # dir prune
                                  & F.col("term").isin(needed))
            scored = seg.groupBy("salt").applyInPandas(
                score_fn, "query_id int, doc_id long, score double")
            # Global top-k (op 35). Candidates are ≤ k per (query, touched
            # range). Small bound → merge on the driver (TakeOrdered
            # analog, saves a window+join job pair per call); large bound
            # (hot terms × many ranges at cluster scale) → distributed
            # window rank first.
            ks_ = {qid: k for qid, _, k in qplan}
            n_ranges = max(1, (self.n_docs + self.range_size - 1)
                           // self.range_size)
            cand_bound = (sum(min(k, self.n_docs) for k in ks_.values())
                          * n_ranges)
            if cand_bound > 1_000_000:
                from pyspark.sql import Window
                w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                                           F.asc("doc_id"))
                ksdf = spark.createDataFrame(list(ks_.items()),
                                             "query_id int, k int")
                scored = (scored.withColumn("rank", F.row_number().over(w))
                          .join(F.broadcast(ksdf), "query_id")
                          .where(F.col("rank") <= F.col("k"))
                          .drop("rank", "k"))
            cand = [(r["query_id"], r["doc_id"], r["score"])
                    for r in scored.collect()]        # Spark job 1

        ks = {qid: k for qid, _, k in qplan}
        by_q: dict[int, list] = {}
        for qid, did, sc in cand:
            by_q.setdefault(qid, []).append((did, sc))
        hits = []
        for qid, rows in by_q.items():
            rows.sort(key=lambda r: (-r[1], r[0]))
            hits.extend((qid, rk + 1, did, sc)
                        for rk, (did, sc) in enumerate(rows[:ks[qid]]))
        if not hits:
            return []

        ids = sorted({h[2] for h in hits})
        meta = self._doc_meta(ids, use_local)
        return [(qid, rk, d, s, *meta.get(d, (None, None)))
                for qid, rk, d, s in sorted(hits)]

    def search_batch(self, queries: list[tuple[int, str, int]],
                     mode: str = "or") -> DataFrame:
        """DataFrame wrapper over search_rows (same columns/ordering)."""
        return self.spark.createDataFrame(self.search_rows(queries, mode),
                                          _RESULT_SCHEMA)

    def _pa_dataset(self, sub: str):
        """Memoized pyarrow dataset handles (file discovery is per-Index,
        like the Spark DataFrame handles)."""
        import pyarrow.dataset as ds
        if not hasattr(self, "_pa_cache"):
            self._pa_cache = {}
        if sub not in self._pa_cache:
            self._pa_cache[sub] = ds.dataset(f"{self._local_dir}/{sub}",
                                             partitioning="hive")
        return self._pa_cache[sub]

    def _local_candidates(self, needed, buckets,
                          score_group) -> list[tuple]:
        """Driver-side scoring over the pruned block set (pyarrow): one
        lexsort groups the block rows by (salt, term, block_id), then the
        shared group scorer runs per doc range. Returns (qid, doc_id,
        score) tuples."""
        import numpy as np
        import pyarrow.dataset as ds
        dset = self._pa_dataset("segments")
        tbl = dset.to_table(
            columns=_SEG_COLS,
            filter=ds.field("bucket").isin(buckets)
            & ds.field("term").isin(needed))
        if tbl.num_rows == 0:
            return []
        term_dict = tbl["term"].combine_chunks().dictionary_encode()
        tcode = term_dict.indices.to_numpy()
        terms_list = term_dict.dictionary.to_pylist()
        salt = tbl["salt"].to_numpy()
        bid = tbl["block_id"].to_numpy()
        order = np.lexsort((bid, tcode, salt))
        cols = {c: tbl[c].to_pylist() for c in _REC_COLS}
        codec = self.codec
        recs = [dict(zip(_REC_COLS, row), codec=codec) for row in zip(
            *[[cols[c][i] for i in order] for c in _REC_COLS])]
        salt_o, tcode_o = salt[order], tcode[order]
        bounds = np.flatnonzero(np.concatenate(
            ([True], (salt_o[1:] != salt_o[:-1])
             | (tcode_o[1:] != tcode_o[:-1]), [True])))
        out: list[tuple] = []
        by_term: dict[str, list[dict]] = {}
        for gi in range(len(bounds) - 1):
            s, e = bounds[gi], bounds[gi + 1]
            by_term[terms_list[tcode_o[s]]] = recs[s:e]
            last_of_salt = (gi + 1 == len(bounds) - 1
                            or salt_o[bounds[gi + 1]] != salt_o[s])
            if last_of_salt:
                q, d, sc = score_group(int(salt_o[s]), by_term)
                out.extend(zip(q, d, sc))
                by_term = {}
        return out

    def _doc_meta(self, ids: list, use_local: bool) -> dict:
        """doc_id -> (repo, path) for a BOUNDED id set (≤ Σk)."""
        if use_local:
            import pyarrow.dataset as ds
            dset = self._pa_dataset("docs")
            t = dset.to_table(columns=["doc_id", "repo", "path"],
                              filter=ds.field("doc_id").isin(ids))
            return {d: (r, p) for d, r, p in
                    zip(t["doc_id"].to_pylist(), t["repo"].to_pylist(),
                        t["path"].to_pylist())}
        return {r["doc_id"]: (r["repo"], r["path"]) for r in
                self._docs.where(F.col("doc_id").isin(ids))  # pushed down
                .select("doc_id", "repo", "path").collect()}  # Spark job 2

    def search(self, text: str, k: int = 10,
               mode: str = "or") -> DataFrame:
        return self.search_batch([(0, text, k)], mode=mode).drop("query_id")
