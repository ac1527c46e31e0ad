"""Top-k query latency + parallelism-invariance runner (BASELINE.md).

Runs the §Q 50-query reference set against a built index, one search per
measurement (k from the query set), and prints p50/p95 plus a digest of
(doc_id, rounded score) per query for cross-parallelism identity checks.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--queries", required=True, help="queries.parquet")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--batch", action="store_true",
                    help="also time the whole set as one batch")
    ap.add_argument("--cache", action="store_true",
                    help="persist segment blocks in executor memory "
                         "(donkey's RAM-resident index analog)")
    a = ap.parse_args()

    from donkey_spark.config import get_spark
    from donkey_spark.plans.query import Index

    spark = get_spark(f"query_c{a.cores}", cores=a.cores,
                      shuffle_partitions=a.cores)
    spark.sparkContext.setLogLevel("ERROR")
    idx = Index(spark, a.index, cache=a.cache)
    qrows = spark.read.parquet(a.queries).collect()
    queries = [(int(r["query_id"]), r["query"], int(r["k"])) for r in qrows]

    idx.search_batch(queries[:3]).collect()          # warm JVM + dictionary
    lat = []
    h = hashlib.sha256()
    for qid, text, k in queries:
        t0 = time.monotonic()
        # serving-surface latency: fully-materialized hit rows (donkey's
        # Hits analog); the DataFrame wrapper adds only a local conversion
        rows = idx.search_rows([(qid, text, k)])
        lat.append(time.monotonic() - t0)
        for (_, rank, doc_id, score, _, _) in rows:
            h.update(f"{qid}:{rank}:{doc_id}:{score:.9f}".encode())
    lat.sort()
    out = {"cores": a.cores, "n_queries": len(queries),
           "p50_s": round(lat[len(lat) // 2], 3),
           "p95_s": round(lat[int(len(lat) * 0.95)], 3),
           "mean_s": round(sum(lat) / len(lat), 3),
           "results_digest": h.hexdigest()[:16]}
    if a.batch:
        t0 = time.monotonic()
        idx.search_batch(queries).collect()
        out["batch_all_s"] = round(time.monotonic() - t0, 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
