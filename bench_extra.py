"""Round-6 measurement harness (guide §1) — NOT the frozen bench.

Prints a per-phase breakdown of the index build plus noop-sink-isolated
timings (guide §1.4) for each declared bench query, so computation is
timed separately from the bench's collect() sink. One JSON line per
section. Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench_extra.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _noop(df) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return round(time.monotonic() - t0, 3)


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

    t_sess0 = time.monotonic()
    spark = get_spark("donkey_bench_extra", cores=cpus,
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    t_sess = round(time.monotonic() - t_sess0, 3)

    idx_dir = tempfile.mkdtemp(prefix="donkey_bx_idx_")
    out: dict = {"session_init": t_sess}
    try:
        spark.sparkContext.setJobDescription("bx: index_build")
        t0 = time.monotonic()
        corpus = documents_as_corpus(spark, sf_dir)
        info = build_index(spark, corpus, idx_dir)
        out["index_build"] = round(time.monotonic() - t0, 3)
        out["build_phases"] = info["phases"]

        spark.sparkContext.setJobDescription("bx: bm25 warm+timed")
        idx = Index(spark, idx_dir)
        t0 = time.monotonic()
        idx.search_batch(BM25_QUERIES).collect()
        out["bm25_topk_batch"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        idx.search_batch(BM25_AND_QUERIES, mode="and").collect()
        out["bm25_and_batch"] = round(time.monotonic() - t0, 3)

        for name, fn in [("tokenize_tf", q_tokenize_tf),
                         ("doc_freq", q_doc_freq),
                         ("lineitem_pricing", q_lineitem_pricing),
                         ("revenue_by_nation", q_revenue_by_nation)]:
            spark.sparkContext.setJobDescription(f"bx: {name} noop")
            out[f"{name}_noop"] = _noop(fn(spark, sf_dir))
            spark.sparkContext.setJobDescription(f"bx: {name} collect")
            t0 = time.monotonic()
            fn(spark, sf_dir).collect()
            out[f"{name}_collect"] = round(time.monotonic() - t0, 3)
        print(json.dumps(out))
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
