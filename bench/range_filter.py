"""Range-facet overhead at scale (§2.14 T25) — the r4 facet-overhead
protocol re-run for numeric ranges: §Q 50-query warm batch medians on a
400k-file index built with range_facets=("n_chars",), comparing

  unfiltered      the plain ranked batch (context)
  range           n_chars ∈ [q30, q70]  (~40% of docs)
  not_range       the complement
  range_counts    the binned histogram of one reference query (shift
                  chosen for ~dozens of bins)

The design claim under test: a range filter is a bounded OR of trie
node presence postings intersected inside the same per-salt kernel —
no docs-table join, no extra shuffle, no extra scan — so it should
land within run noise of the unfiltered batch, like equality facets
did (BASELINE.md r4: every variant within ±11%).

Usage: python bench/range_filter.py [--corpus /tmp/fix_bench/...]
       [--index /tmp/serve_idx_400k_rng] [--cores 32] [--reps 3]
Reuses an existing --index dir if its meta already carries the range
facet (pass --rebuild to force).
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
    ap.add_argument("--rebuild", action="store_true")
    a = ap.parse_args()

    import pandas as pd

    from donkey_spark.config import get_spark
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.facet_counts import range_counts
    from donkey_spark.plans.query import Index
    from fixtures.gen_corpus import gen_queries

    spark = get_spark(f"rngbench_c{a.cores}", cores=a.cores,
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
    # query set + the [q30, q70] window from the corpus itself
    head = pd.read_parquet(a.corpus, columns=["content"]).iloc[:5000]
    queries = [(int(r.query_id), r.query, int(r.k))
               for r in gen_queries(head, QUERY_SEED).itertuples()]
    qs = spark.read.parquet(a.corpus).select(
        F.expr("percentile_approx(length(content), array(0.3, 0.7), "
               "10000)").alias("q")).collect()[0]["q"]
    lo, hi = int(qs[0]), int(qs[1])
    out["range"] = [lo, hi]

    variants = {
        "unfiltered": None,
        "range": {"n_chars": {"range": [lo, hi]}},
        "not_range": {"n_chars": {"not": {"range": [lo, hi]}}},
    }
    idx.search_rows(queries[:3])                       # warm-up, discarded
    for name, filt in variants.items():
        walls = []
        for _ in range(a.reps):
            t0 = time.monotonic()
            rows = idx.search_rows(queries, filters=filt)
            walls.append(time.monotonic() - t0)
        out[name + "_s"] = round(statistics.median(walls), 2)
        out[name + "_rows"] = len(rows)
    walls = []
    for _ in range(a.reps):
        t0 = time.monotonic()
        nbins = range_counts(idx, "sort merge join", "n_chars", 8).count()
        walls.append(time.monotonic() - t0)
    out["range_counts_shift8_s"] = round(statistics.median(walls), 2)
    out["range_counts_bins"] = int(nbins)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
