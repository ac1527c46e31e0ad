"""Regexp term-query serving cost (T43) — expansion + ranked batch on
the 400k-file serving index (shared with bench/msm_latency.py; reused
when present).

The cost claims under test: a regexp expansion is a DICTIONARY probe —
a head-bounded regexp (``/re(turn|ad)/``) prices like a prefix probe
(row-group-pruned range scan + RE2 over the slice), a headless regexp
(``/.*_(vec|arr)/``) prices like a leading wildcard (one full
term-column scan), and after expansion a regexp query batch IS the
plain OR batch (the scorer never learns patterns existed), so ranked
batches with the different pattern kinds should all price within the
ranked batch's own spread. Batches are interleaved (ranked → regexp →
prefix → wildcard → ranked again) so host drift shows in the repeated
plain batch. Expansion timings use a FRESH Index per rep (the memo is
per-Index, so the steady-state serving cost is ~0 — cold is the
honest number).

Usage: python bench/regexp_latency.py [--corpus ...] [--index ...]
       [--cores 32] [--reps 5] [--nq 10]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERY_SEED = 42

#: (label, kind, base, dist) — cold-expansion probes over the 400k
#: dictionary: a pruned range scan, the RE2 twin of that range scan, a
#: full-scan regexp with group alternation, and the wildcard/fuzzy
#: full-scan baselines
EXPANSIONS = [
    ("prefix_re", "prefix", "re", 0),
    ("regexp_head", "regexp", "re(turn|ad)", 0),
    ("regexp_headless", "regexp", ".*_(vec|arr)", 0),
    ("wildcard_leading", "wildcard", "*turn", 0),
    ("fuzzy_return1", "fuzzy", "return", 1),
]

#: pattern atoms substituted into the §Q query stream per batch kind
ATOMS = {
    "regexp": ["/re(turn|ad)/", "/v10[0-9]{2}_[a-z]+/", "/s[ceo].*/"],
    "prefix": ["re*", "v10*", "s*"],
    "wildcard": ["re*rn", "v10*_*", "s?an"],
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus",
                    default="/tmp/fix_bench/corpus_files.parquet")
    ap.add_argument("--index", default="/tmp/serve_idx_400k_rng")
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--nq", type=int, default=10)
    a = ap.parse_args()

    import pandas as pd

    from donkey_spark.config import get_spark
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.query import Index
    from fixtures.gen_corpus import gen_queries

    spark = get_spark(f"rebench_c{a.cores}", cores=a.cores,
                      shuffle_partitions=a.cores)
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    out: dict = {"cores": a.cores, "reps": a.reps}
    if not os.path.isdir(f"{a.index}/meta"):
        corpus = (spark.read.parquet(a.corpus)
                  .withColumn("n_chars", F.length("content")))
        t0 = time.monotonic()
        info = build_index(spark, corpus, a.index,
                           facets=("lang",), range_facets=("n_chars",))
        out["build_s"] = round(time.monotonic() - t0, 1)
        out["n_docs"] = info["n_docs"]

    idx = Index(spark, a.index)
    out["n_dict_terms"] = int(
        idx._pa_dataset("dictionary").count_rows())

    def med(fn):
        walls = []
        for _ in range(a.reps):
            t0 = time.monotonic()
            fn()
            walls.append(time.monotonic() - t0)
        return round(statistics.median(walls), 3)

    # -- cold expansion cost per kind (fresh Index per rep → no memo)
    exp_rows: dict = {}
    for label, kind, base, dist in EXPANSIONS:
        def cold(kind=kind, base=base, dist=dist, label=label):
            exp_rows[label] = len(
                Index(spark, a.index).expand_pattern(
                    kind, base, dist, max_expansions=10**9))
        cold()                                   # warm files/JVM once
        out[f"expand_{label}_s"] = med(cold)
    out["expansions"] = exp_rows

    # -- interleaved ranked batches: plain vs each pattern kind
    head = pd.read_parquet(a.corpus, columns=["content"]).iloc[:5000]
    queries = [(int(r.query_id), r.query, int(r.k))
               for r in gen_queries(head, QUERY_SEED).itertuples()]
    qs = queries[:a.nq]
    idx.search_rows(qs[:3])                      # warm
    rows: dict = {}

    def plain(key):
        rows[key] = len(idx.search_rows(qs))

    def pat(key):
        atoms = ATOMS[key]
        pq = [(qid, f"{atoms[i % len(atoms)]} {text}", k)
              for i, (qid, text, k) in enumerate(qs)]
        rows[key] = len(idx.search_rows_pattern(pq, max_expansions=16))

    out["ranked_batch_s"] = med(lambda: plain("ranked"))
    out["regexp_batch_s"] = med(lambda: pat("regexp"))
    out["prefix_batch_s"] = med(lambda: pat("prefix"))
    out["wildcard_batch_s"] = med(lambda: pat("wildcard"))
    out["ranked_again_s"] = med(lambda: plain("ranked2"))
    out["n_queries"] = len(qs)
    out["rows"] = rows
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
