"""spark-submit entry point — tombstone documents (plans/delete.py).

    spark-submit --py-files dist/engine.zip scripts/delete_docs.py \
        --index /idx --ids 17,42,99
    spark-submit --py-files dist/engine.zip scripts/delete_docs.py \
        --index /idx --keys dead_keys.parquet   # (repo, path, commit)
    spark-submit --py-files dist/engine.zip scripts/delete_docs.py \
        --index /idx --query "credit card" --filter lang=en   # takedown

Deleted docs are invisible to every query immediately; space is
reclaimed by the next compact_index / full rebuild. --query tombstones
every MATCHING document (or/and modes, the same --filter grammar as
scripts/query.py) — the match set never gathers on the driver.
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
    ap.add_argument("--query", default=None,
                    help="tombstone every doc matching this query")
    ap.add_argument("--mode", default="or",
                    choices=["or", "and", "pattern"],
                    help="with --query: any term (or) / every term "
                         "(and) / pattern atoms expanded against the "
                         "dictionary like search (pattern — e.g. "
                         "delete everything matching /v[0-9]+_tmp/)")
    ap.add_argument("--filter", action="append", default=[],
                    metavar="COL=V[,V...] | COL!=... | COL=LO..HI",
                    help="with --query: restrict the match set — same "
                         "grammar as scripts/query.py")
    a = ap.parse_args()
    if sum(bool(x) for x in (a.ids, a.keys, a.query)) != 1:
        ap.error("need exactly one of --ids / --keys / --query")
    if (a.filter or a.mode != "or") and not a.query:
        ap.error("--mode/--filter apply to --query deletes only")

    from pyspark.sql import SparkSession
    from donkey_spark.plans.delete import delete_by_query, delete_docs

    spark = SparkSession.builder.appName("donkey_delete").getOrCreate()
    if a.query:
        from donkey_spark.functions.filters import parse_filter_specs
        n = delete_by_query(spark, a.index, a.query, mode=a.mode,
                            filters=parse_filter_specs(a.filter))
    else:
        docs = (spark.read.parquet(a.keys) if a.keys
                else [int(x) for x in a.ids.split(",") if x])
        n = delete_docs(spark, a.index, docs)
    print(f"tombstones: {n}")


if __name__ == "__main__":
    main()
