"""Field-collapsing serving latency (T38) — warm medians on the
400k-file faceted serving index (shared fixture/index with
bench/sortby_latency.py).

The cost claims under test: (1) collapse must score the FULL match
set (the per-range bound is lifted — group-blind truncation would be
wrong), so a collapsed batch prices like the match-set aggregations
(count/stats), NOT like the pruned ranked batch; (2) the group
cardinality axis — repo (161 groups) vs path (~unique per doc, the
group-per-doc worst case) — moves only the groupBy/window stage, not
the scan; (3) inner_hits=3 swaps the partial agg for a window pass
over the joined frame.

Usage: python bench/collapse_latency.py [--corpus ...] [--index ...]
       [--cores 32] [--reps 5] [--nq 10]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERY_SEED = 42


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus",
                    default="/tmp/fix_bench/corpus_files.parquet")
    ap.add_argument("--index", default="/tmp/serve_idx_400k_rng")
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--nq", type=int, default=10)
    a = ap.parse_args()

    import pandas as pd

    from donkey_spark.config import get_spark
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.collapse import collapse_rows
    from donkey_spark.plans.query import Index
    from fixtures.gen_corpus import gen_queries

    spark = get_spark(f"colbench_c{a.cores}", cores=a.cores,
                      shuffle_partitions=a.cores)
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    out: dict = {"cores": a.cores, "reps": a.reps}
    if not os.path.isdir(f"{a.index}/meta"):
        corpus = (spark.read.parquet(a.corpus)
                  .withColumn("n_chars", F.length("content")))
        t0 = time.monotonic()
        info = build_index(spark, corpus, a.index,
                           facets=("lang",), range_facets=("n_chars",))
        out["build_s"] = round(time.monotonic() - t0, 1)
        out["n_docs"] = info["n_docs"]

    idx = Index(spark, a.index)
    head = pd.read_parquet(a.corpus, columns=["content"]).iloc[:5000]
    queries = [(int(r.query_id), r.query, int(r.k))
               for r in gen_queries(head, QUERY_SEED).itertuples()]
    qs = queries[:a.nq]

    idx.search_rows(qs[:3])                      # warm JVM + dictionary
    collapse_rows(idx, qs[:1], by="lang")

    def med(fn):
        walls = []
        for _ in range(a.reps):
            t0 = time.monotonic()
            fn()
            walls.append(time.monotonic() - t0)
        return round(statistics.median(walls), 3)

    rows: dict = {}

    def run(key, **kw):
        got = collapse_rows(idx, qs, **kw)
        rows[key] = len(got)

    out["ranked_batch_s"] = med(lambda: idx.search_rows(qs))  # context
    out["collapse_repo_s"] = med(lambda: run("repo", by="repo"))
    out["collapse_lang_s"] = med(lambda: run("lang", by="lang"))
    out["collapse_path_s"] = med(lambda: run("path", by="path"))
    out["collapse_repo_inner3_s"] = med(
        lambda: run("repo3", by="repo", inner_hits=3))
    out["collapse_repo_filtered_s"] = med(
        lambda: run("repof", by="repo",
                    filters={"lang": ["py", "java"]}))
    out["n_queries"] = len(qs)
    out["rows"] = rows
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
