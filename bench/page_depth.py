"""Deep-paging cost: offset (search_rows_page) vs cursor
(search_rows_after) at increasing page depth, on the 400k-file serving
index (shared with bench/sortby_latency.py; reused when present).

The shape under test: offset paging retrieves (and merges) offset+k
rows per query, so its cost must GROW with depth — the documented
ES from+size pathology T30 inherits deliberately. Cursor paging keeps
candidates ≤ k per doc range at ANY depth, so its cost should be FLAT
in depth; the price is the disabled θ block skipping (a cursored
query decodes every probed block, like the first page of a cold
ranking), which bounds it a constant above the page-1 wall.

Setup (untimed): the depth-d cursor comes from one search_rows call
with k=d. Timed: one paging call per query per depth, warm medians.

Usage: python bench/page_depth.py [--cores 32] [--reps 3] [--nq 10]
       [--depths 10,100,1000]
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
    ap.add_argument("--nq", type=int, default=10)
    ap.add_argument("--depths", default="10,100,1000")
    a = ap.parse_args()

    import pandas as pd

    from donkey_spark.config import get_spark
    from donkey_spark.plans.query import Index
    from fixtures.gen_corpus import gen_queries

    spark = get_spark(f"pagebench_c{a.cores}", cores=a.cores,
                      shuffle_partitions=a.cores)
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.isdir(f"{a.index}/meta"):
        raise SystemExit(f"{a.index} missing — run bench/sortby_latency.py "
                         f"or bench/range_filter.py first to build it")

    idx = Index(spark, a.index)
    head = pd.read_parquet(a.corpus, columns=["content"]).iloc[:5000]
    queries = [(int(r.query_id), r.query, 10)
               for r in gen_queries(head, QUERY_SEED).itertuples()]
    qs = queries[:a.nq]
    depths = [int(d) for d in a.depths.split(",")]

    idx.search_rows(qs[:3])                      # warm JVM + dictionary

    # untimed: depth-d cursors per query (the previous page's last row)
    cursors: dict[int, dict[int, tuple]] = {}
    deep = idx.search_rows([(q, t, max(depths)) for q, t, _ in qs])
    by_q: dict[int, list] = {}
    for r in deep:
        by_q.setdefault(r[0], []).append(r)
    for d in depths:
        cursors[d] = {q: (rows[d - 1][3], rows[d - 1][2])
                      for q, rows in by_q.items() if len(rows) >= d}

    def med(fn):
        walls = []
        for _ in range(a.reps):
            t0 = time.monotonic()
            fn()
            walls.append(time.monotonic() - t0)
        return round(statistics.median(walls), 2)

    out: dict = {"cores": a.cores, "reps": a.reps, "n_queries": len(qs),
                 "page1_s": med(lambda: [idx.search_rows([q])
                                         for q in qs])}
    for d in depths:
        qd = [q for q in qs if q[0] in cursors[d]]
        out[f"offset{d}_s"] = med(
            lambda d=d, qd=qd: [idx.search_rows_page([q], offset=d)
                                for q in qd])
        out[f"cursor{d}_s"] = med(
            lambda d=d, qd=qd: [idx.search_rows_after(
                [q], {q[0]: cursors[d][q[0]]}) for q in qd])
        out[f"n_at_{d}"] = len(qd)
    # agreement spot-check: the two paths must produce the same page
    d = depths[0]
    for q in qs[:3]:
        if q[0] not in cursors[d]:
            continue
        assert (idx.search_rows_after([q], {q[0]: cursors[d][q[0]]})
                == idx.search_rows_page([q], offset=d)), q
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
