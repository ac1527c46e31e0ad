"""IVF recall@10 / cost sweep + build throughput (r5 T12 evidence).

Sweeps the IVF index's two probe-cost knobs — ``n_lists`` (quantizer
size) and ``nprobe`` (lists scanned per query) — against exact
brute-force ground truth on the same clustered fixture the LSH sweep
uses, reporting recall@10 and the candidate fraction (share of the
corpus each probe rescans). This is the comparison that justifies IVF
next to LSH: a data-dependent quantizer concentrates true neighbors in
far fewer candidates on clustered data.

The sweep runs in a numpy mirror of the engine's training/assignment
arithmetic (same seeding, same argmax tie rule, same 9-decimal centroid
rounding); one configuration is then validated through the REAL Spark
path (build_ivf_index + ivf_topk) — trained centroids must match the
mirror to 1e-9 and probe top-10s must match exactly. A dim-768 case
measures real build throughput (train + assign + partitioned write).

Usage: python bench/ivf_recall.py [--n 100000] [--dim 64] [--probes 50]
       [--highdim-n 100000] [--skip-spark]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ann_recall import make_vectors  # noqa: E402


def train_mirror(vecs: np.ndarray, n_lists: int, n_iters: int) -> np.ndarray:
    """numpy twin of pipeline.ivf.train_ivf_centroids (seed = first
    n_lists vectors since fixture ids are 0..n-1; 9-decimal rounding
    after every update makes sum-order differences vanish)."""
    from donkey_spark.pipeline.ivf import _normalize
    cents = _normalize(vecs[:n_lists].astype(np.float64))
    for _ in range(n_iters):
        assign = np.argmax(vecs @ cents.T, axis=1)
        nxt = cents.copy()
        sums = np.zeros_like(cents)
        np.add.at(sums, assign, vecs)
        cnts = np.bincount(assign, minlength=n_lists)
        nz = cnts > 0
        nxt[nz] = sums[nz] / cnts[nz][:, None]
        cents = _normalize(nxt)
    return cents


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--probes", type=int, default=50)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--n-iters", type=int, default=2)
    ap.add_argument("--highdim-n", type=int, default=100_000)
    ap.add_argument("--skip-spark", action="store_true")
    a = ap.parse_args()

    # float32 round-trip mirrors the parquet/Arrow storage of embeddings
    vecs = make_vectors(a.n, a.dim).astype(np.float32).astype(np.float64)
    rng = np.random.default_rng(7)
    probe_ix = rng.choice(a.n, size=a.probes, replace=False)
    probes = (vecs[probe_ix]
              + 0.05 * rng.standard_normal((a.probes, a.dim)))

    norms = np.linalg.norm(vecs, axis=1)

    def topk_ids(cand_ix: np.ndarray, p: np.ndarray) -> list[int]:
        cos = (vecs[cand_ix] @ p) / (norms[cand_ix] * np.linalg.norm(p))
        order = np.lexsort((cand_ix, -np.round(cos, 6)))
        return cand_ix[order[:a.k]].tolist()

    truth = [topk_ids(np.arange(a.n), p) for p in probes]

    from donkey_spark.pipeline.ivf import probe_lists
    results = []
    trained = {}
    for n_lists in (64, 256):
        cents = train_mirror(vecs, n_lists, a.n_iters)
        trained[n_lists] = cents
        assign = np.argmax(vecs @ cents.T, axis=1)
        for nprobe in (1, 2, 4, 8, 16):
            recalls, fracs = [], []
            for qi, p in enumerate(probes):
                lists = probe_lists(cents, p.tolist(), nprobe)
                cand = np.flatnonzero(np.isin(assign, lists))
                fracs.append(cand.size / a.n)
                got = topk_ids(cand, p) if cand.size else []
                recalls.append(len(set(got) & set(truth[qi])) / a.k)
            results.append({
                "n_lists": n_lists, "nprobe": nprobe,
                "recall_at_10": round(float(np.mean(recalls)), 3),
                "cand_frac": round(float(np.mean(fracs)), 4)})

    spark_check = highdim = None
    if not a.skip_spark:
        import pandas as pd
        from donkey_spark.config import get_spark
        from donkey_spark.pipeline.ivf import (build_ivf_index, ivf_topk,
                                               read_centroids)
        spark = get_spark("ivf_recall", cores=8, shuffle_partitions=16)
        spark.sparkContext.setLogLevel("ERROR")
        pdf = pd.DataFrame({"vec_id": np.arange(a.n),
                            "embedding": list(vecs.astype(np.float32))})
        df = spark.createDataFrame(pdf)
        idx_dir = "/tmp/ivf_recall_idx"
        shutil.rmtree(idx_dir, ignore_errors=True)
        build_ivf_index(df, idx_dir, n_lists=64, n_iters=a.n_iters)
        cdiff = float(np.max(np.abs(read_centroids(spark, idx_dir)
                                    - trained[64])))
        cents = trained[64]
        assign = np.argmax(vecs @ cents.T, axis=1)
        ok = 0
        for qi in rng.choice(a.probes, size=3, replace=False):
            p = probes[qi].tolist()
            got = [r["vec_id"] for r in
                   ivf_topk(spark, idx_dir, p, k=a.k, nprobe=8).collect()]
            lists = probe_lists(cents, p, 8)
            cand = np.flatnonzero(np.isin(assign, lists))
            ok += int(got == topk_ids(cand, probes[qi]))
        spark_check = {"centroid_max_abs_diff": cdiff,
                       "probes_validated": 3, "mirror_match": ok}
        shutil.rmtree(idx_dir, ignore_errors=True)

        # dim-768 build throughput: train(2 iters) + assign + write
        hv = make_vectors(a.highdim_n, 768).astype(np.float32)
        hdf = spark.createDataFrame(
            pd.DataFrame({"vec_id": np.arange(a.highdim_n),
                          "embedding": list(hv)}))
        hdf.persist().count()
        hidx = "/tmp/ivf_recall_idx768"
        shutil.rmtree(hidx, ignore_errors=True)
        t0 = time.perf_counter()
        build_ivf_index(hdf, hidx, n_lists=256, n_iters=a.n_iters)
        wall = time.perf_counter() - t0
        highdim = {"dim": 768, "n": a.highdim_n, "n_lists": 256,
                   "n_iters": a.n_iters, "build_wall_s": round(wall, 2),
                   "vectors_per_s": round(a.highdim_n / wall, 0)}
        hdf.unpersist()
        shutil.rmtree(hidx, ignore_errors=True)
        spark.stop()

    print(json.dumps({"n": a.n, "dim": a.dim, "probes": a.probes,
                      "n_iters": a.n_iters, "sweep": results,
                      "spark_validation": spark_check,
                      "highdim_build": highdim}, indent=2))


if __name__ == "__main__":
    main()
