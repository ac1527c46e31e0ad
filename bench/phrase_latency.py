"""Phrase-query serving latency + positions build cost (r5, format v3).

Builds (once) a positional 400k-file index and measures, warm:

  cand_s    the EXACT candidate stage search_phrase runs first: AND-mode
            BM25 at k=64 (its initial widening width for k=10) — not
            k=10, or the "overhead" would silently include the wider
            candidate fetch (r5 review)
  phrase_s  full search_phrase (candidates + position verification +
            widening) — the delta over cand_s is the price of position
            verification itself
  slop_s    search_phrase(slop=2)

Also reports the build's positions_write phase (the one extra content
pass positional indexes pay).

Usage: python bench/phrase_latency.py [--fixture /tmp/fix_bench]
       [--index /tmp/serve_idx_400k_pos] [--cores 8] [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PHRASES = ["def return", "for in range", "class def", "return for"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixture", default="/tmp/fix_bench")
    ap.add_argument("--index", default="/tmp/serve_idx_400k_pos")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    a = ap.parse_args()

    from donkey_spark.config import get_spark
    from donkey_spark.plans.query import Index

    spark = get_spark("phrase_latency", cores=a.cores,
                      shuffle_partitions=a.cores)
    spark.sparkContext.setLogLevel("ERROR")

    build_info = None
    if not os.path.isdir(f"{a.index}/meta"):
        from donkey_spark.plans.build import build_index
        corpus = spark.read.parquet(f"{a.fixture}/corpus_files.parquet")
        info = build_index(spark, corpus, a.index, positions=True)
        build_info = {"build_wall_s": round(info["wall_s"], 1),
                      "phases": info["phases"]}
        print(json.dumps(build_info), flush=True)

    idx = Index(spark, a.index)
    for p in PHRASES:                      # warm dictionary + page cache
        idx.search_phrase(p, k=10)

    med = lambda xs: round(float(np.median(xs)), 4)   # noqa: E731
    rows = []
    for p in PHRASES:
        t_and, t_ph, t_sl = [], [], []
        n_hits = 0
        for _ in range(a.reps):
            t0 = time.perf_counter()
            idx.search_rows([(0, p, 64)], mode="and")   # = first round
            t_and.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            hits = idx.search_phrase(p, k=10)
            t_ph.append(time.perf_counter() - t0)
            n_hits = len(hits)
            t0 = time.perf_counter()
            idx.search_phrase(p, k=10, slop=2)
            t_sl.append(time.perf_counter() - t0)
        rows.append({"phrase": p, "hits": n_hits,
                     "cand_s": med(t_and), "phrase_s": med(t_ph),
                     "slop2_s": med(t_sl),
                     "verify_overhead_s": round(med(t_ph) - med(t_and), 4)})
        print(json.dumps(rows[-1]), flush=True)

    print(json.dumps({"cores": a.cores, "reps": a.reps,
                      "build": build_info, "rows": rows}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
