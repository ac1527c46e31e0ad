"""spark-submit entry point — document upsert (replace-by-key).

    spark-submit --py-files dist/engine.zip scripts/upsert_docs.py \
        --index /idx --docs new_versions.parquet

``--docs``: corpus-schema parquet (repo, path, commit, lang, content),
one row per file — changed content must carry a NEW commit (rows whose
full triple is already indexed are skipped, which is what makes
re-running a torn upsert converge; see plans/upsert.py).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--docs", required=True,
                    help="corpus-schema parquet of the NEW versions")
    a = ap.parse_args()

    from pyspark.sql import SparkSession
    from donkey_spark.plans.upsert import upsert_docs

    spark = SparkSession.builder.appName("donkey_upsert").getOrCreate()
    info = upsert_docs(spark, a.index, spark.read.parquet(a.docs))
    print(json.dumps(info))


if __name__ == "__main__":
    main()
