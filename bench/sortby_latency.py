"""Sort-by-field latency at scale (plans/sortby.py) — §Q warm medians
on the 400k-file faceted serving index (shared with bench/
range_filter.py; reused when present).

The cost claim under test: a field-sorted query is the match-set
kernel (the same pruned per-salt scan match_count runs) PLUS one
column-pruned docs join + TakeOrderedAndProject — so its latency
should sit a bounded constant above total-hits counting, and both
should be corpus-size-shaped (O(posting bytes touched)), not
match-set-materializing. The ranked single query is printed as
context (sorting must not cost more than scoring's same-shape scan +
heavier kernel).

Usage: python bench/sortby_latency.py [--corpus ...] [--index ...]
       [--cores 32] [--reps 3] [--nq 20]
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
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--nq", type=int, default=20)
    ap.add_argument("--rebuild", action="store_true")
    a = ap.parse_args()

    import pandas as pd

    from donkey_spark.config import get_spark
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.facet_counts import match_count
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.sortby import sorted_topk
    from fixtures.gen_corpus import gen_queries

    spark = get_spark(f"sortbench_c{a.cores}", cores=a.cores,
                      shuffle_partitions=a.cores)
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    out: dict = {"cores": a.cores, "reps": a.reps}
    have = False
    if not a.rebuild and os.path.isdir(f"{a.index}/meta"):
        m = spark.read.parquet(f"{a.index}/meta").collect()[0].asDict()
        have = "n_chars" in (m.get("range_facets") or "")
    if not have:
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
    sorted_topk(idx, qs[0][1], by="dl", k=10)

    def med(fn):
        walls = []
        for _ in range(a.reps):
            t0 = time.monotonic()
            fn()
            walls.append(time.monotonic() - t0)
        return round(statistics.median(walls), 2)

    n_rows = {}

    def run_sorted(by, filters=None, key=None):
        got = [sorted_topk(idx, text, by=by, k=k, filters=filters)
               for _, text, k in qs]
        n_rows[key or f"sorted_{by}"] = sum(len(r) for r in got)

    out["ranked_batch_s"] = med(lambda: idx.search_rows(qs))
    # per-term boosting: same kernel, weights folded into idf — its
    # batch must price AT the plain ranked batch (the no-cost claim)
    bqs = [(qid, f"{text.split()[0]}^2 {' '.join(text.split()[1:])}"
            if " " in text else f"{text}^2", k) for qid, text, k in qs]
    out["boosted_batch_s"] = med(lambda: idx.search_rows_boosted(bqs))
    out["count_each_s"] = med(
        lambda: [match_count(idx, text) for _, text, _ in qs])
    from donkey_spark.plans.facet_counts import (match_percentiles,
                                                 match_stats)
    out["stats_dl_each_s"] = med(
        lambda: [match_stats(idx, text, by="dl")
                 for _, text, _ in qs])
    out["pct_dl_each_s"] = med(
        lambda: [match_percentiles(idx, text, by="dl")
                 for _, text, _ in qs])
    out["sorted_dl_each_s"] = med(lambda: run_sorted("dl"))
    out["sorted_lang_each_s"] = med(lambda: run_sorted("lang"))
    out["sorted_dl_filtered_each_s"] = med(
        lambda: run_sorted("dl", filters={"lang": ["py", "java"]},
                           key="sorted_dl_filtered"))
    out["n_queries"] = len(qs)
    out["rows"] = n_rows
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
