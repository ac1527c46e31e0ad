"""spark-submit entry point — tombstone documents (plans/delete.py).

    spark-submit --py-files dist/engine.zip scripts/delete_docs.py \
        --index /idx --ids 17,42,99
    spark-submit --py-files dist/engine.zip scripts/delete_docs.py \
        --index /idx --keys dead_keys.parquet   # (repo, path, commit)

Deleted docs are invisible to every query immediately; space is
reclaimed by the next compact_index / full rebuild.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--ids", default=None,
                    help="comma-separated doc ids to tombstone")
    ap.add_argument("--keys", default=None,
                    help="parquet of (repo, path, commit) keys to tombstone")
    a = ap.parse_args()
    if not a.ids and not a.keys:
        ap.error("need --ids or --keys")

    from pyspark.sql import SparkSession
    from donkey_spark.plans.delete import delete_docs

    spark = SparkSession.builder.appName("donkey_delete").getOrCreate()
    docs = (spark.read.parquet(a.keys) if a.keys
            else [int(x) for x in a.ids.split(",") if x])
    n = delete_docs(spark, a.index, docs)
    print(f"tombstones: {n}")


if __name__ == "__main__":
    main()
