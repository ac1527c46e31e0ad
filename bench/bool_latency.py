"""Boolean-expression serving latency (r5, §2.14 T24).

The cost claim under test: a boolean query costs what an OR query over
ALL its expression terms costs — the tree adds numpy mask algebra per
salt, never a job, a join, or a shuffle. Measured warm against the
400k-file faceted serving index (shared with bench/serving_mixed.py):

  pos_or_s    the 4-query batch as plain OR over each query's POSITIVE
              terms only (lower bound: same scoring work, no NOT-branch
              presence decodes)
  all_or_s    plain OR over ALL tree terms (the like-for-like scan+decode
              baseline — what the cost shape promises bool matches)
  bool_s      search_rows_bool of the full expressions (mask build +
              masked scoring)

Usage: python bench/bool_latency.py [--fixture /tmp/fix_bench]
       [--index /tmp/serve_idx_400k] [--cores 8] [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BOOLS = [
    (0, "spark AND (shuffle OR join) AND NOT lambda", 10),
    (1, "select AND filter AND NOT (group OR agg)", 10),
    (2, "(encode OR decode) AND hash AND NOT yield", 10),
    (3, "partition AND NOT broadcast", 10),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixture", default="/tmp/fix_bench")
    ap.add_argument("--index", default="/tmp/serve_idx_400k")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    a = ap.parse_args()

    from donkey_spark.config import get_spark
    from donkey_spark.functions.boolquery import (bool_terms,
                                                  parse_bool_text,
                                                  positive_terms)
    from donkey_spark.plans.query import Index

    spark = get_spark("bool_latency", cores=a.cores,
                      shuffle_partitions=a.cores)
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.isdir(f"{a.index}/meta"):
        from donkey_spark.plans.build import build_index
        corpus = spark.read.parquet(f"{a.fixture}/corpus_files.parquet")
        t0 = time.perf_counter()
        build_index(spark, corpus, a.index, facets=("lang",))
        print(json.dumps({"built_index_s": round(time.perf_counter() - t0,
                                                 1)}), flush=True)

    idx = Index(spark, a.index)
    trees = {qid: parse_bool_text(t) for qid, t, _ in BOOLS}
    pos_or = [(qid, sorted(positive_terms(trees[qid])), k)
              for qid, _, k in BOOLS]
    all_or = [(qid, sorted(bool_terms(trees[qid])), k)
              for qid, _, k in BOOLS]

    idx.search_rows_bool(BOOLS)          # warm JVM + dictionary memo
    t_pos, t_all, t_bool = [], [], []
    ref = None
    for _ in range(a.reps):
        t0 = time.perf_counter()
        idx.search_rows(pos_or)
        t_pos.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        idx.search_rows(all_or)
        t_all.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        rows = idx.search_rows_bool(BOOLS)
        t_bool.append(time.perf_counter() - t0)
        if ref is None:
            ref = rows
        assert rows == ref               # rep-to-rep determinism

    med = lambda xs: round(float(np.median(xs)), 3)   # noqa: E731
    print(json.dumps({
        "n_queries": len(BOOLS), "cores": a.cores, "reps": a.reps,
        "pos_or_s": med(t_pos), "all_or_s": med(t_all),
        "bool_s": med(t_bool),
        "pos_or_all": [round(t, 3) for t in t_pos],
        "all_or_all": [round(t, 3) for t in t_all],
        "bool_all": [round(t, 3) for t in t_bool],
        "bool_vs_all_or_x": round(med(t_bool) / med(t_all), 2),
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
