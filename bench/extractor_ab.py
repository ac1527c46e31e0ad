"""Extractor A/B — per-doc Counter path vs vectorized Arrow kernel.

The BENCH/BASELINE.md §Extractor protocol, scripted (it was ad hoc in
r3): both extractors run single-threaded in ONE process over the SAME
8k-doc fixture batch, strictly interleaved (p,a,p,a,...) so host drift
between reps cancels, medians reported. Also prints the arrow kernel's
per-pass byte-traffic budget so a bandwidth-bound loss is attributable
pass by pass (the r4 VERDICT ask).

Usage: python bench/extractor_ab.py [--docs 8000] [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import unicodedata
from collections import Counter

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fixtures.gen_corpus import gen_corpus  # noqa: E402


def _python_path(contents: list[str], cap: int):
    """The doc_features_udf body (per-doc C regex + Counter)."""
    from donkey_spark.functions.tokenize import _RE_LEN
    findall, norm = _RE_LEN.findall, unicodedata.normalize
    out_t, out_f, out_dl = [], [], []
    for x in contents:
        toks = findall(norm("NFC", x).lower())[:cap] if x else []
        c = Counter(toks)
        out_t.append(list(c.keys()))
        out_f.append(list(c.values()))
        out_dl.append(len(toks))
    return out_t, out_f, out_dl


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=8_000)
    ap.add_argument("--reps", type=int, default=5)
    a = ap.parse_args()

    from donkey_spark.config import MAX_TOKENS_PER_DOC
    from donkey_spark.kernels.exttok import extract_doc_features

    pdf = gen_corpus(a.docs, seed=42)
    contents = pdf["content"].tolist()
    arr = pa.array(contents, pa.utf8())
    total_mb = sum(len(c.encode()) for c in contents) / 1e6

    # warmup (both paths, untimed)
    _python_path(contents[:500], MAX_TOKENS_PER_DOC)
    extract_doc_features(pa.array(contents[:500], pa.utf8()))

    t_py, t_ar = [], []
    for _ in range(a.reps):                       # strictly interleaved
        t0 = time.perf_counter()
        _python_path(contents, MAX_TOKENS_PER_DOC)
        t_py.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        extract_doc_features(arr)
        t_ar.append(time.perf_counter() - t0)

    # SOLO protocol (r5): each path runs its reps consecutively — the
    # production shape (a Spark worker runs ONE extractor for its whole
    # life). Interleaving, designed to cancel host drift, turned out to
    # actively poison the arrow path: every python rep churns the heap
    # with millions of short-lived objects, and the next arrow rep pays
    # the page faults. Report both; solo is the deployment-relevant one.
    s_py = []
    for _ in range(a.reps):
        t0 = time.perf_counter()
        _python_path(contents, MAX_TOKENS_PER_DOC)
        s_py.append(time.perf_counter() - t0)
    s_ar = []
    for _ in range(a.reps):
        t0 = time.perf_counter()
        extract_doc_features(arr)
        s_ar.append(time.perf_counter() - t0)

    med_py = float(np.median(t_py))
    med_ar = float(np.median(t_ar))
    smed_py = float(np.median(s_py))
    smed_ar = float(np.median(s_ar))
    print(json.dumps({
        "docs": a.docs, "mb": round(total_mb, 1), "reps": a.reps,
        "python_median_s": round(med_py, 3),
        "arrow_median_s": round(med_ar, 3),
        "python_all": [round(t, 3) for t in t_py],
        "arrow_all": [round(t, 3) for t in t_ar],
        "solo_python_median_s": round(smed_py, 3),
        "solo_arrow_median_s": round(smed_ar, 3),
        "solo_python_all": [round(t, 3) for t in s_py],
        "solo_arrow_all": [round(t, 3) for t in s_ar],
        "python_mb_s": round(total_mb / med_py, 1),
        "arrow_mb_s": round(total_mb / med_ar, 1),
        "solo_arrow_mb_s": round(total_mb / smed_ar, 1),
        "winner_interleaved": "python" if med_py <= med_ar else "arrow",
        "winner_solo": "python" if smed_py <= smed_ar else "arrow",
    }))

    # ---- per-pass byte-traffic budget of the arrow kernel ---------------
    # Reads+writes per full-buffer pass over N content bytes (the ASCII
    # bulk path), so a bandwidth-bound gap is attributable mechanically.
    # r5 fusions: lower deferred to token bytes only (the full-buffer
    # lower gather is gone), prev/nxt shifted masks replaced by one
    # adjacent-compare sweep, and the byte-level keep-mask erase (delta +
    # cumsum + and over the full buffer) replaced by a token-level Arrow
    # filter. K = total token-run bytes (~0.7 N on code corpora).
    N = int(total_mb * 1e6)
    K = int(0.7 * N)
    passes = [
        ("LUT token mask (gather u8->bool)", 2 * N),
        ("adjacent-compare toggles (bool r2 w1)", 3 * N),
        ("toggle flatnonzero (bool read)", N),
        ("boolean compress runs (r u8+bool, w K)", 2 * N + K),
        ("LUT lower on token bytes (gather K)", 2 * K),
        ("arrow filter invalid runs (r+w ~K)", 2 * K),
        ("dictionary_encode scan (r K)", K),
    ]
    tot = sum(b for _, b in passes)
    print(json.dumps({
        "arrow_pass_budget_bytes": {k: v for k, v in passes},
        "total_traffic_gb": round(tot / 1e9, 2),
        "content_gb": round(N / 1e9, 3),
        "traffic_multiple_of_input": round(tot / N, 1),
        "note": ("r5: non-escaping work arrays come from a grow-only "
                 "per-process scratch pool (kernels/exttok._SCRATCH) — "
                 "fresh-allocation page-fault churn was the dominant "
                 "rep-to-rep variance, not compute"),
    }))


if __name__ == "__main__":
    main()
