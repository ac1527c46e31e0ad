"""Hybrid lexical + vector retrieval — reciprocal rank fusion (RRF).

The first compound query a retrieval stack serves once it has BOTH a
full-text index and a vector index: fuse a BM25 ranking and an ANN
ranking of the same corpus into one list. RRF [Cormack, Clarke &
Buettcher, SIGIR 2009] is the standard score-free fusion:

    rrf(d) = Σ_r  w_r / (rrf_k + rank_r(d))

summed over the rankings that contain *d* — no score normalization
across heterogeneous scales (BM25 is unbounded, cosine is [-1, 1]), no
training, and deterministic given deterministic input rankings.

Scale shape: each input ranking is a top-``depth`` list (depth is a
small constant — 50..1000), produced by retrieval paths that are
themselves corpus-size-independent (the block-max BM25 scorer, the
partition-pruned LSH/IVF probes). The fusion therefore joins a few
bounded DataFrames and sorts Σ depths rows — driver-trivial at any
corpus size; the expensive work stays inside the two indexes.

Convention: per-document embeddings carry ``vec_id == doc_id`` (the
same convention ``tombstones_from`` uses on the ANN side), so the two
rankings share an id space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ranked_by(df: DataFrame, order_cols, id_col: str) -> DataFrame:
    """Attach a dense 1-based ``rank`` by (order_cols, id_col asc) — the
    deterministic tiebreak every engine ranking uses. Bounded input only
    (top-depth lists): the single-partition window is the point, not a
    pitfall."""
    w = Window.orderBy(*order_cols, F.asc(id_col))
    return df.withColumn("rank", F.row_number().over(w))


def rrf_fuse(frames: list[tuple[str, DataFrame]], k: int = 10,
             rrf_k: int = 60, id_col: str = "doc_id",
             weights: dict[str, float] | None = None) -> DataFrame:
    """Fuse named (id_col, rank) rankings by reciprocal rank.

    Returns ``(rank, doc_id, rrf, <name>_rank...)`` — rrf rounded to 6
    (protects the driver hash from float-sum order), absent-from-a-list
    ranks reported as 0, final order (rrf desc, id asc). ``weights``
    maps ranking name -> multiplier (default 1.0 each)."""
    if not frames:
        raise ValueError("rrf_fuse needs at least one ranking")
    names = [n for n, _ in frames]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate ranking names: {names}")
    weights = weights or {}
    joined = None
    for name, df in frames:
        part = df.select(F.col(id_col),
                         F.col("rank").cast("int").alias(f"{name}_rank"))
        joined = part if joined is None else joined.join(
            part, on=id_col, how="full_outer")
    contrib = [
        F.when(F.col(f"{n}_rank").isNotNull(),
               F.lit(float(weights.get(n, 1.0)))
               / (F.lit(rrf_k) + F.col(f"{n}_rank"))).otherwise(F.lit(0.0))
        for n in names]
    total = contrib[0]
    for c in contrib[1:]:
        total = total + c
    out = (joined.withColumn("rrf", F.round(total, 6))
           .na.fill({f"{n}_rank": 0 for n in names}))
    return (ranked_by(out.select(id_col, "rrf",
                                 *[f"{n}_rank" for n in names]),
                      [F.desc("rrf")], id_col)
            .where(F.col("rank") <= k)
            .select("rank", id_col, "rrf",
                    *[f"{n}_rank" for n in names]))


def hybrid_topk(index, text: str, probe: list[float], *,
                ann_dir: str | None = None, vectors: DataFrame | None = None,
                k: int = 10, depth: int = 50, rrf_k: int = 60,
                mode: str = "or", filters: dict | None = None,
                ann: str = "lsh", ann_opts: dict | None = None,
                weights: dict[str, float] | None = None) -> DataFrame:
    """BM25 ∪ ANN top-k via RRF.

    ``index``: a ``plans.query.Index``; its ``mode``/``filters`` apply
    to the lexical branch. The vector branch probes ``ann_dir`` with the
    LSH (``ann="lsh"``), IVF (``ann="ivf"``) or exact (``ann="exact"``,
    brute-force over ``vectors``) path; ``ann_opts`` passes through
    (n_tables/multiprobe/nprobe/filters/exclude...). Both branches
    retrieve ``depth`` candidates, re-ranked on their published
    deterministic orders (rounded score / rounded cosine, id asc), then
    fused; ties in rrf break by doc_id asc."""
    spark = index.spark
    lex = ranked_by(
        index.search(text, k=depth, mode=mode, filters=filters)
        .select("doc_id", F.round(F.col("score"), 6).alias("score")),
        [F.desc("score")], "doc_id").select("doc_id", "rank")

    opts = dict(ann_opts or {})
    if ann == "lsh":
        from .similarity import ann_topk
        sem = ann_topk(spark, ann_dir, probe, k=depth, **opts)
    elif ann == "ivf":
        from .ivf import ivf_topk
        sem = ivf_topk(spark, ann_dir, probe, k=depth, **opts)
    elif ann == "exact":
        from .similarity import cosine_topk
        if vectors is None:
            raise ValueError('ann="exact" needs vectors=')
        sem = cosine_topk(vectors, probe, k=depth, **opts)
    else:
        raise ValueError(f"unknown ann kind {ann!r} "
                         "(expected lsh | ivf | exact)")
    sem = (ranked_by(sem, [F.desc("cosine")], "vec_id")
           .select(F.col("vec_id").alias("doc_id"), "rank"))
    return rrf_fuse([("bm25", lex), ("ann", sem)], k=k, rrf_k=rrf_k,
                    weights=weights)
