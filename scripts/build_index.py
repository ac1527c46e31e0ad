"""spark-submit entry point A — index build (BASELINE.json north_rule:
"run via spark-submit --py-files on a multi-executor cluster").

    python scripts/make_engine_zip.py            # -> dist/engine.zip
    spark-submit --py-files dist/engine.zip scripts/build_index.py \
        --corpus <iceberg-table-or-parquet-path> --out /idx \
        [--ref-hashes <parquet>] [--chunks 16] [--resume] [--codec pfor]

On a cluster, omit master configs here — spark-submit supplies them; run
locally it falls back to local[*] via donkey_spark.config.get_spark.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True,
                    help="Iceberg table id or parquet path (fixed schema)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--ref-hashes", default=None,
                    help="parquet with (repo,path,commit,sha256) — enforces "
                         "the per-row content invariant")
    ap.add_argument("--chunks", type=int, default=1)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--codec", default="varint", choices=["varint", "pfor"])
    ap.add_argument("--job-id", default="job-0")
    ap.add_argument("--facets", default="",
                    help="comma-separated metadata columns to index as "
                         "filter postings (e.g. lang) — enables "
                         "query.py --filter col=value")
    ap.add_argument("--range-facets", default="",
                    help="comma-separated NUMERIC columns to index as "
                         "trie range postings — enables query.py "
                         "--filter col=lo..hi and --facet-counts col "
                         "--bin-shift S. The corpus contract has no "
                         "numeric columns, so entries are derived: "
                         "n_chars (content length) and n_lines")
    ap.add_argument("--extractor", default="python",
                    choices=["python", "arrow"])
    ap.add_argument("--positions", action="store_true",
                    help="also write the positions side table (format "
                         "version 3) — enables query.py --phrase")
    a = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from donkey_spark.plans.build import build_index
    from donkey_spark.sources.corpus import scan_corpus

    spark = SparkSession.builder.appName("donkey_build").getOrCreate()
    corpus = scan_corpus(spark, a.corpus)
    rfacets = tuple(f for f in a.range_facets.split(",") if f)
    derived = {"n_chars": lambda: F.length("content"),
               "n_lines": lambda: F.size(F.split("content", "\n"))}
    for rf in rfacets:
        if rf not in derived:
            raise SystemExit(
                f"--range-facets: unknown column {rf!r}; the corpus "
                f"contract is all-string, so only the derived columns "
                f"{sorted(derived)} can be range-indexed from the CLI "
                f"(library callers pass any integral column)")
        corpus = corpus.withColumn(rf, derived[rf]())
    ref = (spark.read.parquet(a.ref_hashes) if a.ref_hashes else None)
    info = build_index(spark, corpus, a.out, codec=a.codec,
                       n_chunks=a.chunks, resume=a.resume,
                       ref_hashes=ref, job_id=a.job_id,
                       extractor=a.extractor,
                       facets=tuple(f for f in a.facets.split(",") if f),
                       range_facets=rfacets,
                       positions=a.positions)
    json.dump(info, sys.stdout, default=str)
    print()


if __name__ == "__main__":
    main()
