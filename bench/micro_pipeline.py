"""Microbench: vectorized simhash/winnow UDF kernels vs the transparent
per-row Python oracles (VERDICT r1 items 3/4 — "≥10× throughput on a
50k-doc microbench, no per-token Python in the UDF").

Apples-to-apples: both paths run single-threaded on the driver over the
same materialized pandas content column — the comparison isolates the
kernel (batch-vectorized numpy vs per-row/per-token Python), not Spark
parallelism.

Usage: python bench/micro_pipeline.py [--docs 50000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from collections import Counter

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fixtures.gen_corpus import gen_corpus  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=50_000)
    ap.add_argument("--oracle-docs", type=int, default=2_000,
                    help="docs for the per-row oracle timing (extrapolated)")
    a = ap.parse_args()

    from donkey_spark.functions.tokenize import tokenize_py
    from donkey_spark.pipeline.dedup import simhash64_py, simhash_batch
    from donkey_spark.pipeline.textqual import winnow_batch, winnow_py

    pdf = gen_corpus(a.docs, seed=42)
    content = pd.Series(pdf["content"].to_numpy())
    sub = content.iloc[:a.oracle_docs]

    out = {"docs": a.docs}

    # tokenization is common to both paths (per-doc C regex — not the
    # per-token Python the vectorization removed); time it separately so
    # the kernel-only speedup is visible alongside the end-to-end one
    t0 = time.monotonic()
    for x in content:
        tokenize_py(x)
    tok_rate = a.docs / (time.monotonic() - t0)
    out["tokenize_docs_per_s"] = round(tok_rate, 1)

    def kernel_speedup(oracle_rate: float, vec_rate: float) -> float:
        ko = 1.0 / oracle_rate - 1.0 / tok_rate
        kv = 1.0 / vec_rate - 1.0 / tok_rate
        return round(ko / kv, 1) if kv > 0 else float("inf")

    # --- simhash ---------------------------------------------------------
    t0 = time.monotonic()
    for x in sub:
        simhash64_py(sorted(Counter(tokenize_py(x)).items()))
    oracle_rate = a.oracle_docs / (time.monotonic() - t0)

    t0 = time.monotonic()
    got = simhash_batch(content)
    vec_rate = a.docs / (time.monotonic() - t0)
    # spot-check equality on the oracle subset
    for i in range(0, a.oracle_docs, 97):
        exp = simhash64_py(sorted(Counter(tokenize_py(content.iloc[i]))
                                  .items()))
        assert int(got.iloc[i]) == exp, i
    out["simhash"] = {"oracle_docs_per_s": round(oracle_rate, 1),
                      "vectorized_docs_per_s": round(vec_rate, 1),
                      "speedup": round(vec_rate / oracle_rate, 1),
                      "kernel_speedup": kernel_speedup(oracle_rate,
                                                       vec_rate)}

    # --- winnow ----------------------------------------------------------
    t0 = time.monotonic()
    for x in sub:
        winnow_py(tokenize_py(x))
    oracle_rate = a.oracle_docs / (time.monotonic() - t0)

    t0 = time.monotonic()
    wgot = winnow_batch(content, 4, 5)
    vec_rate = a.docs / (time.monotonic() - t0)
    for i in range(0, a.oracle_docs, 97):
        exp = winnow_py(tokenize_py(content.iloc[i]))
        assert sorted(int(f) & ((1 << 64) - 1)
                      for f in wgot.iloc[i]) == exp, i
    out["winnow"] = {"oracle_docs_per_s": round(oracle_rate, 1),
                     "vectorized_docs_per_s": round(vec_rate, 1),
                     "speedup": round(vec_rate / oracle_rate, 1),
                     "kernel_speedup": kernel_speedup(oracle_rate,
                                                      vec_rate)}

    print(json.dumps(out))


if __name__ == "__main__":
    main()
