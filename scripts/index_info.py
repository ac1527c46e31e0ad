"""spark-submit entry point — index introspection (plans/info.py).

    spark-submit --py-files dist/engine.zip scripts/index_info.py \
        --index /idx

Prints one JSON report: format version, corpus stats, per-table bytes
and chunk layout, dictionary merge state, journal breakdown by writer,
tombstone count. Touches metadata only — never postings.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    a = ap.parse_args()

    from pyspark.sql import SparkSession

    from donkey_spark.plans.info import index_info

    spark = SparkSession.builder.appName("donkey_index_info").getOrCreate()
    print(json.dumps(index_info(spark, a.index), indent=2))


if __name__ == "__main__":
    main()
