"""Mixed per-query serving batch — the r4 `search_rows_mixed` surface
under a serving-regime protocol (r4 VERDICT #7).

50 reference queries with PER-QUERY modes/filters/k (cycling unfiltered /
equality / OR / NOT lang facets, OR / AND modes) against a 400k-file
faceted index, warm medians of:

  mixed       one search_rows_mixed call (groups by (mode, filter
              signature), shares the dictionary memo across groups)
  per_group   one search_rows call per (mode, filter) group — what mixed
              does internally, minus its grouping overhead
  per_query   one search_rows call per query — the naive serving loop

The claim under test: mixed ≈ per_group (grouping overhead is noise) and
both amortize far below per_query (per-salt filter masks, prefill decode
cache and dictionary probes are shared within a group).

Usage: python bench/serving_mixed.py [--fixture /tmp/fix_bench]
       [--index /tmp/serve_idx_400k] [--cores 8] [--reps 5]
The index is built once (facets=lang) if missing.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixture", default="/tmp/fix_bench")
    ap.add_argument("--index", default="/tmp/serve_idx_400k")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    a = ap.parse_args()

    from donkey_spark.config import get_spark
    from donkey_spark.plans.query import Index

    spark = get_spark("serving_mixed", cores=a.cores,
                      shuffle_partitions=a.cores)
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.isdir(f"{a.index}/meta"):
        from donkey_spark.plans.build import build_index
        corpus = spark.read.parquet(f"{a.fixture}/corpus_files.parquet")
        t0 = time.perf_counter()
        build_index(spark, corpus, a.index, facets=("lang",))
        print(json.dumps({"built_index_s": round(time.perf_counter() - t0,
                                                 1)}), flush=True)

    langs = sorted(
        r["lang"] for r in spark.read.parquet(
            f"{a.fixture}/corpus_files.parquet")
        .select("lang").distinct().collect() if r["lang"])[:3]
    qrows = spark.read.parquet(f"{a.fixture}/queries.parquet").collect()
    queries = [(int(r["query_id"]), r["query"], int(r["k"]))
               for r in qrows]

    filt_cycle = [None,
                  {"lang": [langs[0]]},
                  {"lang": langs[:2]},
                  {"lang": {"not": [langs[0]]}}]
    specs = [(qid, text, k,
              "and" if i % 5 == 4 else "or",
              filt_cycle[i % len(filt_cycle)])
             for i, (qid, text, k) in enumerate(queries)]

    idx = Index(spark, a.index)
    idx.search_rows_mixed(specs[:8])          # warm JVM + dictionary memo

    import json as _json
    from collections import defaultdict
    groups: dict = defaultdict(list)
    for qid, text, k, mode, filt in specs:
        sig = (mode, _json.dumps(filt, sort_keys=True, default=list)
               if filt else "")
        groups[sig].append((qid, text, k, filt))

    t_mixed, t_group, t_query = [], [], []
    ref = None
    for _ in range(a.reps):
        t0 = time.perf_counter()
        rows = idx.search_rows_mixed(specs)
        t_mixed.append(time.perf_counter() - t0)
        if ref is None:
            ref = rows
        assert rows == ref                    # rep-to-rep determinism

        t0 = time.perf_counter()
        acc = []
        for (mode, _), qs in groups.items():
            acc.extend(idx.search_rows([(q, t, k) for q, t, k, _ in qs],
                                       mode=mode, filters=qs[0][3]))
        t_group.append(time.perf_counter() - t0)
        assert sorted(acc) == ref             # same results, any protocol

        t0 = time.perf_counter()
        for qid, text, k, mode, filt in specs:
            idx.search_rows([(qid, text, k)], mode=mode, filters=filt)
        t_query.append(time.perf_counter() - t0)

    med = lambda xs: round(float(np.median(xs)), 3)   # noqa: E731
    print(json.dumps({
        "n_queries": len(specs), "n_groups": len(groups),
        "cores": a.cores, "reps": a.reps,
        "mixed_s": med(t_mixed), "per_group_s": med(t_group),
        "per_query_s": med(t_query),
        "mixed_all": [round(t, 3) for t in t_mixed],
        "per_group_all": [round(t, 3) for t in t_group],
        "per_query_all": [round(t, 3) for t in t_query],
        "amortization_x": round(med(t_query) / med(t_mixed), 2),
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
