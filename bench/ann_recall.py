"""ANN recall@10 sweep on a 100k-vector fixture (VERDICT r2 #10).

Sweeps the two query/build knobs of the LSH index — n_tables and
multiprobe (lowest-margin bit flips, Lv et al. VLDB 2007) — against exact
brute-force ground truth, reporting recall@10 and the candidate fraction
(the cost proxy: share of the corpus each probe rescans).

The sweep itself runs in a numpy mirror of the engine's bucket math
(identical sha-seeded planes via pipeline.similarity._planes, identical
bucket ids via _bucket_id) so a 2×4-config sweep over 50 probes finishes
in seconds; one configuration is then validated end-to-end through the
REAL Spark path (build_ann_index + ann_topk) and asserted to return the
same top-10 as the mirror — the mirror is a measurement tool, not a
second implementation of record.

Usage: python bench/ann_recall.py [--n 100000] [--dim 64] [--probes 50]
       [--n-planes 12]

(The committed BENCH/BASELINE.md table is the default config: n=100k,
dim=64, 50 probes, n_planes=12.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from donkey_spark.pipeline.similarity import (_bucket_id, _planes,  # noqa: E402
                                              probe_buckets)


def make_vectors(n: int, dim: int, seed: int = 42) -> np.ndarray:
    """Clustered fixture (near neighbors exist by construction): 256
    Gaussian clusters, sigma 0.35 around unit-ish centers."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((256, dim))
    assign = rng.integers(0, 256, size=n)
    return centers[assign] + 0.35 * rng.standard_normal((n, dim))


def bucket_matrix(vecs: np.ndarray, n_tables: int,
                  n_planes: int) -> np.ndarray:
    """(n, n_tables) engine-identical bucket id per vector per table."""
    n = vecs.shape[0]
    out = np.empty((n, n_tables), dtype=np.int64)
    weights = (1 << np.arange(n_planes - 1, -1, -1)).astype(np.int64)
    for t in range(n_tables):
        planes = _planes(vecs.shape[1], n_planes, seed=f"t{t}")
        bits = (vecs @ planes.T >= 0).astype(np.int64)
        out[:, t] = _bucket_id(t, n_planes, [0] * n_planes) + bits @ weights
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--probes", type=int, default=50)
    ap.add_argument("--n-planes", type=int, default=12)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--skip-spark", action="store_true")
    a = ap.parse_args()

    vecs = make_vectors(a.n, a.dim)
    rng = np.random.default_rng(7)
    probe_ix = rng.choice(a.n, size=a.probes, replace=False)
    probes = vecs[probe_ix] + 0.05 * rng.standard_normal((a.probes, a.dim))

    norms = np.linalg.norm(vecs, axis=1)
    # ground truth: exact cosine, ties by id asc (argsort is stable after
    # negating rounded-to-6 cosine — mirrors cosine_topk's output contract)
    def topk_ids(cand_ix: np.ndarray, p: np.ndarray) -> list[int]:
        cos = (vecs[cand_ix] @ p) / (norms[cand_ix] * np.linalg.norm(p))
        order = np.lexsort((cand_ix, -np.round(cos, 6)))
        return cand_ix[order[:a.k]].tolist()

    truth = [topk_ids(np.arange(a.n), p) for p in probes]

    max_tables = 8
    bm = bucket_matrix(vecs, max_tables, a.n_planes)
    results = []
    for n_tables in (2, 4, 8):
        for multiprobe in (0, 1, 2, 4):
            recalls, fracs = [], []
            for qi, p in enumerate(probes):
                pbs = set(probe_buckets(p.tolist(), n_tables,
                                        a.n_planes, multiprobe))
                mask = np.isin(bm[:, :n_tables], list(pbs)).any(axis=1)
                cand = np.flatnonzero(mask)
                fracs.append(cand.size / a.n)
                got = topk_ids(cand, p) if cand.size else []
                recalls.append(len(set(got) & set(truth[qi])) / a.k)
            results.append({
                "n_tables": n_tables, "multiprobe": multiprobe,
                "recall_at_10": round(float(np.mean(recalls)), 3),
                "cand_frac": round(float(np.mean(fracs)), 4)})

    spark_check = None
    if not a.skip_spark:
        import pandas as pd
        from donkey_spark.config import get_spark
        from donkey_spark.pipeline.similarity import ann_topk, build_ann_index
        spark = get_spark("ann_recall", cores=8, shuffle_partitions=8)
        spark.sparkContext.setLogLevel("ERROR")
        pdf = pd.DataFrame({"vec_id": np.arange(a.n),
                            "embedding": list(vecs.astype(np.float32))})
        df = spark.createDataFrame(pdf)
        idx_dir = "/tmp/ann_recall_idx"
        build_ann_index(df, idx_dir, n_tables=8, n_planes=a.n_planes)
        ok = 0
        for qi in rng.choice(a.probes, size=3, replace=False):
            p = probes[qi].tolist()
            got = [r["vec_id"] for r in
                   ann_topk(spark, idx_dir, p, k=a.k, n_tables=8,
                            n_planes=a.n_planes, multiprobe=2).collect()]
            pbs = set(probe_buckets(p, 8, a.n_planes, 2))
            cand = np.flatnonzero(np.isin(bm, list(pbs)).any(axis=1))
            ok += int(got == topk_ids(cand, probes[qi]))
        spark_check = {"probes_validated": 3, "mirror_match": ok}
        spark.stop()

    print(json.dumps({"n": a.n, "dim": a.dim, "probes": a.probes,
                      "n_planes": a.n_planes, "sweep": results,
                      "spark_validation": spark_check}, indent=2))


if __name__ == "__main__":
    main()
