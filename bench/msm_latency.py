"""minimum_should_match serving latency (T37) — §Q warm medians on the
400k-file faceted serving index (shared with bench/sortby_latency.py;
reused when present).

The cost claim under test: msm routes through the counting kernel
(kernels/wand.score_range_topk_msm), whose θ must qualify
conservatively (only already-m-matched docs may raise it), so an
msm batch should price BETWEEN the plain OR batch (tightest θ) and a
θ-free scan — and m = termcount, which reproduces mode="and"'s
results, is allowed to cost more than the AND kernel (which prunes by
intersection ubs) because exactness, not the AND fast path, is msm's
contract. The batches are interleaved (or → msm2 → msm-all → and →
or again) so host drift is visible in the repeated plain batch.

Usage: python bench/msm_latency.py [--corpus ...] [--index ...]
       [--cores 32] [--reps 5] [--nq 20]
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
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--nq", type=int, default=20)
    a = ap.parse_args()

    import pandas as pd

    from donkey_spark.config import get_spark
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.query import Index
    from fixtures.gen_corpus import gen_queries

    spark = get_spark(f"msmbench_c{a.cores}", cores=a.cores,
                      shuffle_partitions=a.cores)
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    out: dict = {"cores": a.cores, "reps": a.reps}
    if not os.path.isdir(f"{a.index}/meta"):
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
    # msm needs multi-term queries; keep ones with >= 2 tokens
    multi = [(q, t, k) for q, t, k in queries if len(t.split()) >= 2]
    qs = multi[:a.nq]
    m2 = {qid: 2 for qid, _, _ in qs}
    mall = {qid: len(t.split()) for qid, t, _ in qs}

    idx.search_rows(qs[:3])                      # warm JVM + dictionary

    def med(fn):
        walls = []
        for _ in range(a.reps):
            t0 = time.monotonic()
            fn()
            walls.append(time.monotonic() - t0)
        return round(statistics.median(walls), 3)

    rows: dict = {}

    def run(key, **kw):
        got = idx.search_rows(qs, **kw)
        rows[key] = len(got)

    # interleaved: plain / m=2 / m=all / and / plain-again
    out["or_batch_s"] = med(lambda: run("or"))
    out["msm2_batch_s"] = med(lambda: run("msm2", min_match=m2))
    out["msm_all_batch_s"] = med(lambda: run("msm_all", min_match=mall))
    out["and_batch_s"] = med(lambda: run("and", mode="and"))
    out["or_batch_again_s"] = med(lambda: run("or2"))
    # exactness spot-assert inside the bench itself: m=all ≡ and
    assert (idx.search_rows(qs, min_match=mall)
            == idx.search_rows(qs, mode="and")), "msm m=all != and"
    out["n_queries"] = len(qs)
    out["rows"] = rows
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
