"""Federated-search overhead (T21, BENCH/BASELINE.md §Sharded).

Builds a unified index and 2-/4-way shard federations over the same
corpus fixture, then measures warm serving latency (single query p50
and the 20-query batch wall) on each layout, asserting rank identity
along the way — the federation's cost is the per-query stats probes +
per-shard plans + driver merge, and this runner quantifies it.

    python bench/sharded_federation.py --data /tmp/fix_250k --cores 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    (i, text, 10) for i, text in enumerate([
        "def return value", "class init self", "import module", "for range",
        "while true break", "try except raise", "open read write",
        "list append sort", "dict key value", "lambda map filter",
        "print format string", "async await", "yield generator",
        "assert equal test", "None false true", "index error",
        "join split strip", "sum min max", "path file name",
        "return self value",
    ])]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/fix_250k",
                    help="fixture dir (corpus_files.parquet)")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--work", default="/tmp/shard_bench")
    ap.add_argument("--reps", type=int, default=5,
                    help="warm repetitions per layout (median reported)")
    a = ap.parse_args()

    from pyspark.sql import functions as F

    from donkey_spark.config import get_spark
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.sharded import search_rows_sharded

    spark = get_spark(f"shard_bench_c{a.cores}", cores=a.cores,
                      shuffle_partitions=a.cores)
    spark.sparkContext.setLogLevel("ERROR")
    corpus = spark.read.parquet(f"{a.data}/corpus_files.parquet")

    layouts: dict[str, list[str]] = {}
    part = F.abs(F.crc32(F.concat_ws("/", "repo", "path")))
    for n in (1, 2, 4):
        dirs = []
        for i in range(n):
            d = f"{a.work}/n{n}_s{i}"
            if not os.path.exists(f"{d}/meta"):
                t0 = time.monotonic()
                build_index(spark, corpus.where(part % n == i), d)
                print(f"built {d}: {time.monotonic() - t0:.1f}s",
                      flush=True)
            dirs.append(d)
        layouts[f"{n}shard"] = dirs

    def key(rows, unified):
        if unified:
            return [(q, rk, repo, path, round(s, 9))
                    for q, rk, d, s, repo, path in rows]
        return [(q, rk, repo, path, round(s, 9))
                for q, rk, sh, d, s, repo, path in rows]

    uni = Index(spark, layouts["1shard"][0])
    want = key(uni.search_rows(QUERIES), unified=True)
    out = {"data": a.data, "cores": a.cores, "n_queries": len(QUERIES)}
    for name, dirs in layouts.items():
        shards = [Index(spark, d) for d in dirs]

        def run_batch():
            if len(shards) == 1:
                return key(shards[0].search_rows(QUERIES), unified=True)
            return key(search_rows_sharded(shards, QUERIES),
                       unified=False)

        assert run_batch() == want, f"rank identity broke on {name}"
        batch_walls, single_walls = [], []
        for _ in range(a.reps):
            t0 = time.monotonic()
            run_batch()
            batch_walls.append(time.monotonic() - t0)
            t0 = time.monotonic()
            if len(shards) == 1:
                shards[0].search_rows([QUERIES[0]])
            else:
                search_rows_sharded(shards, [QUERIES[0]])
            single_walls.append(time.monotonic() - t0)
        batch_walls.sort()
        single_walls.sort()
        out[name] = {
            "batch20_median_s": round(batch_walls[a.reps // 2], 3),
            "single_median_s": round(single_walls[a.reps // 2], 3),
        }
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
