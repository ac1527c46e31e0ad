"""Driver bench harness (repo contract): headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headliners: the two engine entry points (index build over the documents
corpus; block-max BM25 batch query) plus representative contract queries
(tokenize+tf, TPC-H-style agg, join/agg). Deeper scaling evidence
(local[8] vs local[32] on the 200k-file fixture corpus) lives in
bench/scaling.py → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from donkey_spark.config import get_spark
    from donkey_spark.sources import documents_as_corpus
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.query import Index
    from donkey_spark.contract import (BM25_AND_QUERIES, BM25_QUERIES,
                                       q_tokenize_tf, q_lineitem_pricing,
                                       q_revenue_by_nation, q_doc_freq)

    spark = get_spark("donkey_bench", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    idx_dir = tempfile.mkdtemp(prefix="donkey_bench_idx_")
    try:
        t0 = time.monotonic()
        corpus = documents_as_corpus(spark, sf_dir)
        info = build_index(spark, corpus, idx_dir)
        timings["index_build"] = round(time.monotonic() - t0, 3)

        idx = Index(spark, idx_dir)
        t0 = time.monotonic()
        idx.search_batch(BM25_QUERIES).collect()
        timings["bm25_topk_batch"] = round(time.monotonic() - t0, 3)

        t0 = time.monotonic()
        idx.search_batch(BM25_AND_QUERIES, mode="and").collect()
        timings["bm25_and_batch"] = round(time.monotonic() - t0, 3)

        for name, fn in [("tokenize_tf", q_tokenize_tf),
                         ("doc_freq", q_doc_freq),
                         ("lineitem_pricing", q_lineitem_pricing),
                         ("revenue_by_nation", q_revenue_by_nation)]:
            t0 = time.monotonic()
            fn(spark, sf_dir).collect()
            timings[name] = round(time.monotonic() - t0, 3)

        total = round(sum(timings.values()), 3)
        sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
        print(json.dumps({
            "metric": "donkey_spark_headline_total",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            "n_docs": info["n_docs"],
            "n_postings": info["n_postings"],
            "build_files_per_sec": round(info["n_docs"]
                                         / timings["index_build"], 1),
        }))
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
