"""spark-submit entry point — facet backfill (plans/add_facet.py).

    spark-submit --py-files dist/engine.zip scripts/add_facet.py \
        --index /idx --column lang                      # from docs table
    spark-submit --py-files dist/engine.zip scripts/add_facet.py \
        --index /idx --column license --values lic.parquet  # (doc_id, value)
    spark-submit --py-files dist/engine.zip scripts/add_facet.py \
        --index /idx --column n_chars --range --values sizes.parquet

Indexes a NEW filter column on an existing index without rebuilding it:
equality facets by default, numeric range facets (trie presence tags,
filterable with ``--filter col=lo..hi`` and binnable with range_counts)
with ``--range``. Filters work the moment the command returns.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--column", required=True)
    ap.add_argument("--values", default=None,
                    help="parquet of (doc_id, value) rows; omit to take "
                         "the column from the index's own docs table")
    ap.add_argument("--range", action="store_true",
                    help="index as a NUMERIC RANGE facet (values cast "
                         "to long) instead of an equality facet")
    a = ap.parse_args()

    from pyspark.sql import SparkSession
    from donkey_spark.plans.add_facet import add_facet, add_range_facet

    spark = SparkSession.builder.appName("donkey_add_facet").getOrCreate()
    values = spark.read.parquet(a.values) if a.values else None
    fn = add_range_facet if getattr(a, "range") else add_facet
    info = fn(spark, a.index, a.column, values=values)
    print(info)


if __name__ == "__main__":
    main()
