"""Facet-histogram latency (plans/facet_counts.py) on the 400k faceted
serving index — the counts a search UI renders beside its filters.

Protocol: warm medians (reps after one discarded warm-up) of

  facet_or    facet_counts(text, "lang", mode="or")   full match set
  facet_and   facet_counts(text, "lang", mode="and")
  topk_ref    Index.search_rows top-10 of the same text — context: what
              a plain ranked query costs on the same index

over reference queries of 2–4 terms. The histogram decodes every posting
of every query term once (no block-max pruning applies — counting needs
the full match set), so the interesting number is its multiple over the
pruned top-k, and that the shuffle stays O(salts × values).

Usage: python bench/facet_counts.py [--index /tmp/serve_idx_400k]
       [--cores 8] [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "sort merge join",
    "table scan filter",
    "spark shuffle partition",
    "index build merge segment",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", default="/tmp/serve_idx_400k")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    a = ap.parse_args()

    from donkey_spark.config import get_spark
    from donkey_spark.plans.facet_counts import facet_counts, facet_values
    from donkey_spark.plans.query import Index

    spark = get_spark("facet_counts_bench", cores=a.cores,
                      shuffle_partitions=a.cores)
    spark.sparkContext.setLogLevel("ERROR")
    idx = Index(spark, a.index)
    vals = facet_values(idx, "lang")      # enumerate once, like a UI would

    def med(fn):
        fn()                              # warm-up rep, discarded
        walls = []
        for _ in range(a.reps):
            t0 = time.perf_counter()
            fn()
            walls.append(time.perf_counter() - t0)
        return float(np.median(walls))

    out = {"index": a.index, "cores": a.cores, "reps": a.reps,
           "n_values": len(vals), "queries": {}}
    for text in QUERIES:
        row = {
            "facet_or": med(lambda: facet_counts(
                idx, text, "lang", values=vals).collect()),
            "facet_and": med(lambda: facet_counts(
                idx, text, "lang", mode="and", values=vals).collect()),
            "topk_ref": med(lambda: idx.search_rows([(0, text, 10)])),
        }
        n_or = sum(r["n_docs"] for r in facet_counts(
            idx, text, "lang", values=vals).collect())
        row = {k: round(v, 3) for k, v in row.items()}
        row["matched_docs_or"] = int(n_or)
        out["queries"][text] = row
        print(json.dumps({text: row}), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
