"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — exact brute-force cosine top-k, built-ins only
  (zip_with product + aggregate sum run in codegen; no UDF, no Python).
  The ◇ oracle is DuckDB's list_cosine_similarity.
* ``lsh_ann_topk`` — the scale path: random-hyperplane LSH [Charikar 2002]
  with deterministic sha-seeded planes; candidates = vectors sharing the
  probe's bucket in any table, exact-rescored. At 10^9+ vectors the bucket
  join replaces the full scan; recall is tested vs brute force.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity of two float arrays, computed in float64."""
    da = F.transform(a, lambda x: x.cast("double"))
    db = F.transform(b, lambda x: x.cast("double"))
    return _dot(da, db) / (_norm(da) * _norm(db))


def cosine_topk(vectors: DataFrame, probe: list[float], k: int = 10,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine vs a probe vector. orderBy+limit lowers to
    TakeOrderedAndProject (per-partition heap + driver merge)."""
    p = F.array(*[F.lit(float(x)) for x in probe])
    return (vectors
            .select(id_col,
                    F.round(cosine_expr(F.col(vec_col), p), 6)
                    .alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc(id_col))
            .limit(k))


def _planes(dim: int, n_planes: int, seed: str = "donkey") -> np.ndarray:
    """Deterministic pseudo-random hyperplanes from sha256 — no RNG state,
    reproducible across sessions/cluster sizes."""
    out = np.empty((n_planes, dim), dtype=np.float64)
    for p in range(n_planes):
        vals = []
        ctr = 0
        while len(vals) < dim:
            h = hashlib.sha256(f"{seed}:{p}:{ctr}".encode()).digest()
            vals.extend(int.from_bytes(h[i:i + 4], "big") / 2**31 - 1.0
                        for i in range(0, 32, 4))
            ctr += 1
        out[p] = vals[:dim]
    return out


def lsh_bucket_expr(vec_col: Column, planes: np.ndarray,
                    table: int) -> Column:
    """Bucket id for one hash table: sign bits of plane projections."""
    bits = [F.when(_dot(F.transform(vec_col, lambda x: x.cast("double")),
                        F.array(*[F.lit(float(v)) for v in p])) >= 0, 1)
            .otherwise(0) for p in planes]
    acc = F.lit(table * (1 << (len(planes) + 1)))
    for b in bits:
        acc = acc * 2 + b
    return acc


def _bucket_id(table: int, n_planes: int, bits) -> int:
    b = int(table * (1 << (n_planes + 1)))
    for bit in bits:
        b = b * 2 + int(bit)
    return b


def probe_buckets(probe: list[float], n_tables: int, n_planes: int,
                  multiprobe: int = 0) -> list[int]:
    """The probe vector's bucket id in every hash table (driver-side).

    ``multiprobe`` > 0 adds, per table, the buckets reached by flipping
    the ``multiprobe`` sign bits with the SMALLEST projection margin
    [multi-probe LSH, Lv et al. VLDB 2007]: a near neighbor that landed
    on the other side of a close plane lives in exactly such a bucket, so
    each extra probe buys recall at the cost of one more partition dir
    read — a query-time knob needing no index rebuild."""
    pv = np.array(probe, dtype=np.float64)
    out = []
    for t in range(n_tables):
        planes = _planes(len(probe), n_planes, seed=f"t{t}")
        proj = planes @ pv
        bits = (proj >= 0).astype(np.int64)
        out.append(_bucket_id(t, n_planes, bits))
        for j in np.argsort(np.abs(proj))[:max(0, multiprobe)]:
            flipped = bits.copy()
            flipped[j] ^= 1
            out.append(_bucket_id(t, n_planes, flipped))
    return out


def _apply_exclusions(spark, cand: DataFrame, id_col: str, exclude,
                      tombstones_from: str | None) -> DataFrame:
    """Drop excluded/tombstoned ids from an ANN candidate set BEFORE
    rescoring — the similarity twin of the BM25 scorer's dead mask, so a
    decontaminated document vanishes from BOTH retrieval paths without
    an index rebuild (r4: tombstones previously governed BM25 only).

    ``exclude``: a DataFrame carrying ``id_col`` or a plain id list.
    ``tombstones_from``: a BM25 index dir (plans/delete.py layout) whose
    resolved tombstone doc ids govern this vector table too — the
    pipeline convention that per-document embeddings carry vec_id ==
    doc_id. Same bounded-broadcast regime as the scorer (the key set is
    driver-manageable between compactions by design)."""
    def _drop_ids(df, ids):
        if not len(ids):
            return df
        if len(ids) <= 1000:
            # small sets: a literal In-filter keeps the plan join-free
            return df.where(~F.col(id_col).isin([int(i) for i in ids]))
        # large sets: a literal list would bloat the plan / stall py4j —
        # ship via Arrow as a DataFrame and anti-join (Spark/AQE picks
        # broadcast vs shuffle; the candidate side is tiny either way)
        import pandas as pd
        dead = spark.createDataFrame(
            pd.DataFrame({id_col: [int(i) for i in ids]}))
        return df.join(dead, id_col, "left_anti")

    if tombstones_from is not None:
        from ..plans.delete import load_tombstones
        cand = _drop_ids(cand, load_tombstones(spark, tombstones_from))
    if exclude is not None:
        if isinstance(exclude, DataFrame):
            cand = cand.join(F.broadcast(exclude.select(id_col).distinct()),
                             id_col, "left_anti")
        else:
            cand = _drop_ids(cand, list(exclude))
    return cand


def lsh_ann_topk(vectors: DataFrame, probe: list[float], k: int = 10,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 n_tables: int = 8, n_planes: int = 6,
                 exclude=None, tombstones_from: str | None = None
                 ) -> DataFrame:
    """Approximate top-k over the RAW vector table: union of the probe's
    buckets across hash tables, exact cosine rescoring of candidates only.
    One full codegen scan — fine ad hoc; the indexed path below
    (build_ann_index/ann_topk) replaces the scan with partition pruning.
    ``exclude``/``tombstones_from``: see _apply_exclusions."""
    dim = len(probe)
    pbs = probe_buckets(probe, n_tables, n_planes)
    match = None
    for t in range(n_tables):
        planes = _planes(dim, n_planes, seed=f"t{t}")
        cond = lsh_bucket_expr(F.col(vec_col), planes, t) == pbs[t]
        match = cond if match is None else (match | cond)
    cand = _apply_exclusions(vectors.sparkSession, vectors.where(match),
                             id_col, exclude, tombstones_from)
    return cosine_topk(cand, probe, k, id_col, vec_col)


# --- materialized LSH index (the 10^9+-vector path) -------------------------

def ann_bucket_rows(vectors: DataFrame, id_col: str = "vec_id",
                    vec_col: str = "embedding", n_tables: int = 8,
                    n_planes: int = 6, dim: int | None = None) -> DataFrame:
    """(bucket, vec_id, embedding): one row per (vector, hash table), the
    bucket id carrying the table offset so ids are globally unique. All
    codegen — the n_tables×n_planes projections run in one projection."""
    if dim is None:
        dim = len(vectors.select(vec_col).first()[0])
    buckets = F.array(*[
        lsh_bucket_expr(F.col(vec_col), _planes(dim, n_planes, seed=f"t{t}"),
                        t)
        for t in range(n_tables)])
    return (vectors.select(id_col, vec_col, F.explode(buckets)
                           .alias("bucket")))


def build_ann_index(vectors: DataFrame, out_dir: str,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    n_tables: int = 8, n_planes: int = 6,
                    dim: int | None = None) -> None:
    """Materialize the bucket table, partitioned by bucket, so a probe
    reads exactly n_tables partition dirs out of n_tables·2^n_planes.

    Vectors are denormalized into the bucket rows (n_tables× storage) so a
    probe needs NO join back to the vector table — the pruned scan feeds
    the rescorer directly. For storage-tight deployments store ids only
    and semi-join the vector table on the (bounded) candidate set instead."""
    rows = ann_bucket_rows(vectors, id_col, vec_col, n_tables, n_planes,
                           dim=dim)
    (rows.repartition(F.col("bucket"))
         .write.mode("overwrite").partitionBy("bucket").parquet(out_dir))


def append_ann_vectors(vectors: DataFrame, out_dir: str,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       n_tables: int = 8, n_planes: int = 6,
                       dim: int | None = None) -> None:
    """Incremental vector ingest: hash a NEW batch of vectors into the
    existing bucket table (plain partitioned append — the planes are
    deterministic, so old and new rows share the same bucket space).
    The ANN twin of streaming BM25 ingest: probes see appended vectors
    immediately, no rebuild.

    Semantics note: re-inserting an id that already exists leaves BOTH
    rows in the table and the probe's dropDuplicates picks one
    arbitrarily — to UPDATE a vector, tombstone/exclude the old id (it
    vanishes from results immediately) and compact later
    (``compact_ann_index``), exactly like document deletion."""
    # pass dim on hot append loops: inferring it costs a .first() job
    # per batch, and the dimension is constant for an index anyway
    rows = ann_bucket_rows(vectors, id_col, vec_col, n_tables, n_planes,
                           dim=dim)
    (rows.repartition(F.col("bucket"))
         .write.mode("append").partitionBy("bucket").parquet(out_dir))


def compact_ann_index(spark, vectors: DataFrame, out_dir: str,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      n_tables: int = 8, n_planes: int = 6,
                      tombstones_from: str | None = None,
                      exclude=None, dim: int | None = None) -> None:
    """The ANN `reindex` analog: full rebuild of the bucket table from
    the current vector set, minus tombstoned/excluded ids — reclaims
    the space of deleted vectors and collapses duplicate-id appends.
    ``vectors`` must be independent of ``out_dir`` (a fresh scan of the
    vector source), since the rebuild overwrites the bucket table."""
    vectors = _apply_exclusions(spark, vectors, id_col, exclude,
                                tombstones_from)
    build_ann_index(vectors, out_dir, id_col, vec_col, n_tables, n_planes,
                    dim=dim)


def ann_topk(spark, index_dir: str, probe: list[float], k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_tables: int = 8, n_planes: int = 6,
             multiprobe: int = 0, exclude=None,
             tombstones_from: str | None = None) -> DataFrame:
    """Probe the materialized bucket table: partition-pruned scan of the
    probe's n_tables·(1+multiprobe) buckets → dedupe → exact cosine
    top-k. Identical results to lsh_ann_topk on the same knobs at
    multiprobe=0; recall@10 per knob is measured in BENCH/BASELINE.md
    (bench/ann_recall.py). ``exclude``/``tombstones_from`` drop
    deleted vectors before rescoring (see _apply_exclusions) — the
    bucket table itself stays frozen until the next build_ann_index,
    exactly like posting blocks between compactions."""
    pbs = probe_buckets(probe, n_tables, n_planes, multiprobe)
    cand = (spark.read.parquet(index_dir)
            .where(F.col("bucket").isin(pbs))        # dir pruning
            .dropDuplicates([id_col]))
    cand = _apply_exclusions(spark, cand, id_col, exclude, tombstones_from)
    return cosine_topk(cand, probe, k, id_col, vec_col)
