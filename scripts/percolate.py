"""spark-submit entry point — percolate stored queries over a corpus.

    spark-submit --py-files dist/engine.zip scripts/percolate.py \
        --corpus /data/corpus_files --queries saved_queries.parquet \
        --mode or --out /data/matches

The tag-at-ingest job: every corpus document classified against a
standing query library (plans/percolate.py) in one Catalyst pass —
no index, no UDF. --queries parquet needs (query_id, query); a single
ad-hoc rule can be given inline with --query instead.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True,
                    help="parquet with (repo, path, commit, content)")
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--queries", help="parquet with (query_id, query)")
    g.add_argument("--query", help="one inline query text (id 0)")
    ap.add_argument("--mode", default="or", choices=["or", "and"])
    ap.add_argument("--min-match", type=int, default=None, metavar="M",
                    help="with --mode or: docs must contain at least M "
                         "distinct query terms (T37 semantics)")
    ap.add_argument("--out", default=None,
                    help="write matches parquet here (default: show)")
    a = ap.parse_args()
    if a.min_match is not None and a.mode != "or":
        ap.error("--min-match applies to --mode or only")

    from pyspark.sql import SparkSession

    from donkey_spark.plans.percolate import percolate
    spark = SparkSession.builder.appName("donkey-percolate").getOrCreate()
    corpus = spark.read.parquet(a.corpus)
    if a.query:
        queries = [(0, a.query)]
    else:
        queries = [(int(r["query_id"]), r["query"])
                   for r in spark.read.parquet(a.queries).collect()]
    res = percolate(corpus, queries, mode=a.mode, min_match=a.min_match)
    if a.out:
        res.write.mode("overwrite").parquet(a.out)
        print(f"wrote {a.out}")
    else:
        res.orderBy("query_id", "repo", "path").show(100, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
