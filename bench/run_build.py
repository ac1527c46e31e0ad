"""One index-build run for the scaling protocol (BASELINE.md).

spark-submit-able:
    spark-submit --py-files engine.zip bench/run_build.py \
        --data /tmp/fix_bench --cores 8 --out /tmp/idx8
or plain python (it creates its own local[N] session). Prints one JSON
line: wall seconds (build only), files/sec, n_postings, segments digest.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True, help="fixture dir (corpus_files.parquet)")
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--codec", default="varint")
    ap.add_argument("--digest", action="store_true")
    a = ap.parse_args()

    from donkey_spark.config import get_spark
    from donkey_spark.plans.build import build_index
    from donkey_spark.sources.corpus import scan_corpus

    shutil.rmtree(a.out, ignore_errors=True)
    spark = get_spark(f"build_c{a.cores}", cores=a.cores)
    spark.sparkContext.setLogLevel("ERROR")
    corpus = scan_corpus(spark, f"{a.data}/corpus_files.parquet")
    t0 = time.monotonic()
    info = build_index(spark, corpus, a.out, codec=a.codec)
    wall = time.monotonic() - t0
    out = {"cores": a.cores, "wall_s": round(wall, 2),
           "n_docs": info["n_docs"], "n_postings": info["n_postings"],
           "files_per_sec": round(info["n_docs"] / wall, 1),
           "phases": info["phases"]}
    if a.digest:
        from donkey_spark.operators.postings import segments_digest
        seg = spark.read.option("basePath", f"{a.out}/segments").parquet(
            f"{a.out}/segments")
        n, x = segments_digest(seg.drop("chunk", "bucket"))
        out["digest"] = f"{n}:{x}"
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
