"""IVF (inverted-file) ANN — the coarse-quantizer scale path.

The LSH index (``pipeline/similarity.py``) partitions vectors by
data-independent random-hyperplane buckets; IVF [Sivic & Zisserman 2003;
the FAISS IndexIVFFlat shape] partitions by a DATA-DEPENDENT coarse
quantizer: k spherical-k-means centroids, each vector stored in the
inverted list of its nearest centroid. A probe scores the k centroids
(driver-side, O(k·dim)), reads only the ``nprobe`` nearest lists out of
k (partition-pruned parquet scan), and exact-rescores the candidates —
at 10^9 vectors with k=65536, nprobe=64 touches ~0.1% of the data.

Spark-first realization:

* **assignment** is one ``(batch, dim) @ (dim, k)`` float64 matmul per
  Arrow batch (``assign_rows``, mapInArrow — same kernel shape as
  ``kernels/annproj.py``; plan size O(1), no per-row interpreted work);
* **training** is distributed Lloyd: each iteration = one assignment
  pass + per-partition (list, count, Σvec) partials + ONE bounded
  shuffle of n_partitions·k rows (independent of n) reduced with
  ``zip_with`` folds; centroids renormalize on the driver (k·dim floats);
* **probe** never joins: vectors (and optional ``meta_cols``) are
  denormalized into the list rows, so filters push into the pruned scan
  exactly like the LSH index.

Determinism: seed centroids are the ``n_lists`` lowest-id vectors;
every Lloyd update rounds centroid components to 9 decimals, so the
~1e-13 relative jitter from cross-partition float sum order vanishes
and retraining on the same data reproduces the same index bit-for-bit
(a component landing within 1e-13 of a rounding boundary could differ —
measure-zero for real embeddings). The ◇ oracle (contract
``ivf_ann_topk``) replays seeding, one Lloyd iteration, assignment and
the probe in DuckDB SQL from first principles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernels.annproj import _list_to_matrix
from .similarity import _apply_exclusions, _apply_filters, cosine_topk

CENTROID_ROUND = 9          # decimals kept after each Lloyd update


def _normalize(c: np.ndarray) -> np.ndarray:
    """Row-normalize + round — the canonical stored-centroid form.
    Zero rows stay zero (a degenerate seed; assignment still works,
    every dot is 0)."""
    n = np.linalg.norm(c, axis=1, keepdims=True)
    n[n == 0.0] = 1.0
    return np.round(c / n, CENTROID_ROUND)


def _accept_quantizer(centroids) -> np.ndarray:
    """Caller-supplied centroids. An already-canonical quantizer (unit
    rows — e.g. another index's ``read_centroids`` output, the shared-
    quantizer federation regime) is used VERBATIM: re-normalizing a
    9-decimal-rounded unit vector divides by a norm ≠ 1 by up to a few
    1e-9 and the re-round can flip last-digit components, silently
    breaking the cross-index bit-equality `ivf_topk_sharded` verifies
    (r5 fourth review). Anything not unit-norm is canonicalized. A
    canonical quantizer may contain ZERO rows (degenerate seeds —
    _normalize keeps them zero), so the unit test is per-row with zero
    admitted; otherwise one zero row would force a re-normalize of the
    whole matrix and reintroduce the drift."""
    c = np.ascontiguousarray(np.asarray(centroids, dtype=np.float64))
    if c.ndim == 2:
        n2 = (c * c).sum(axis=1)
        if bool(np.all((np.abs(n2 - 1.0) <= 1e-6) | (n2 == 0.0))):
            return c
    return _normalize(c)


def seed_centroids(vectors: DataFrame, n_lists: int,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> np.ndarray:
    """Deterministic seeds: the ``n_lists`` lowest-id vectors,
    normalized. O(k) driver bytes; the orderBy+limit lowers to
    TakeOrderedAndProject."""
    rows = (vectors.select(id_col, vec_col)
            .orderBy(F.asc(id_col)).limit(n_lists).collect())
    if len(rows) < n_lists:
        raise ValueError(
            f"need >= {n_lists} vectors to seed {n_lists} lists, "
            f"got {len(rows)}")
    return _normalize(np.array([r[vec_col] for r in rows],
                               dtype=np.float64))


def assign_rows(df: DataFrame, centroids: np.ndarray,
                vec_col: str = "embedding") -> DataFrame:
    """Append an int ``list`` column: argmax_c dot(vec, centroid_c),
    ties to the lowest list id (np.argmax picks the first maximum —
    the oracle's ``ORDER BY dot DESC, list_id ASC`` twin rule).
    Centroids are normalized, so the argmax equals nearest-by-cosine;
    the vector's own norm is a positive per-row constant and never
    reorders its centroid scores."""
    cmat = np.ascontiguousarray(centroids, dtype=np.float64)
    out_schema = T.StructType(
        df.schema.fields + [T.StructField("list", T.IntegerType(), False)])

    def assign(batches):
        for b in batches:
            if b.num_rows == 0:
                continue
            tbl = pa.Table.from_batches([b])
            vals = _list_to_matrix(tbl.column(vec_col), cmat.shape[1])
            lists = np.argmax(vals @ cmat.T, axis=1).astype(np.int32)
            yield from (tbl.append_column("list", pa.array(lists))
                        .to_batches())

    return df.mapInArrow(assign, schema=out_schema)


def _partial_sums(assigned: DataFrame, n_lists: int, dim: int,
                  vec_col: str = "embedding") -> DataFrame:
    """Per-partition Lloyd partials: one (list, cnt, svec) row per
    non-empty list per partition — the shuffle that follows carries
    n_partitions·k rows no matter how many vectors flowed in."""
    schema = T.StructType([
        T.StructField("list", T.IntegerType(), False),
        T.StructField("cnt", T.LongType(), False),
        T.StructField("svec", T.ArrayType(T.DoubleType(), False), False)])

    def part(batches):
        sums = np.zeros((n_lists, dim), dtype=np.float64)
        cnts = np.zeros(n_lists, dtype=np.int64)
        for b in batches:
            if b.num_rows == 0:
                continue
            tbl = pa.Table.from_batches([b])
            vals = _list_to_matrix(tbl.column(vec_col), dim)
            lists = np.asarray(tbl.column("list").combine_chunks())
            np.add.at(sums, lists, vals)
            cnts += np.bincount(lists, minlength=n_lists)
        nz = np.flatnonzero(cnts)
        if nz.size:
            yield pa.RecordBatch.from_arrays(
                [pa.array(nz.astype(np.int32)), pa.array(cnts[nz]),
                 pa.array(list(sums[nz]))],
                schema=pa.schema([("list", pa.int32()),
                                  ("cnt", pa.int64()),
                                  ("svec", pa.list_(pa.float64()))]))

    return assigned.select("list", vec_col).mapInArrow(part, schema=schema)


def train_ivf_centroids(vectors: DataFrame, n_lists: int,
                        n_iters: int = 2, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        centroids: np.ndarray | None = None) -> np.ndarray:
    """Spherical k-means [Dhillon & Modha 2001]: assign by max dot
    against normalized centroids, update = renormalized mean. Each
    iteration is one data pass + one k-bounded shuffle; the driver only
    ever holds k·dim floats. Lists that go empty keep their previous
    centroid (the oracle mirrors this with a LEFT JOIN COALESCE)."""
    cents = seed_centroids(vectors, n_lists, id_col, vec_col) \
        if centroids is None else _normalize(np.asarray(centroids, float))
    dim = cents.shape[1]
    zero = F.array_repeat(F.lit(0.0), dim)
    for _ in range(n_iters):
        assigned = assign_rows(vectors.select(id_col, vec_col),
                               centroids=cents, vec_col=vec_col)
        agg = (_partial_sums(assigned, n_lists, dim, vec_col)
               .groupBy("list")
               .agg(F.sum("cnt").alias("cnt"),
                    F.aggregate(F.collect_list("svec"), zero,
                                lambda acc, v: F.zip_with(
                                    acc, v, lambda a, b: a + b))
                    .alias("svec"))
               .collect())
        nxt = cents.copy()
        for r in agg:
            nxt[r["list"]] = np.asarray(r["svec"]) / r["cnt"]
        cents = _normalize(nxt)
    return cents


# --- materialized IVF index --------------------------------------------------

def _lists_dir(index_dir: str) -> str:
    return index_dir.rstrip("/") + "/lists"


def _centroids_dir(index_dir: str) -> str:
    return index_dir.rstrip("/") + "/centroids"


def build_ivf_index(vectors: DataFrame, out_dir: str,
                    n_lists: int = 256, n_iters: int = 2,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    meta_cols: tuple = (),
                    centroids: np.ndarray | None = None) -> np.ndarray:
    """Train (unless ``centroids`` is given), assign, and write
    ``out_dir/lists/list=<i>/`` partitions plus ``out_dir/centroids/``
    (k rows). Like the LSH index, vectors and ``meta_cols`` are
    denormalized into list rows so probes are join-free — and unlike
    LSH the storage factor is exactly 1 (each vector lives in ONE list).

    Production note: train on a deterministic sample
    (``vectors.where(F.hash(id_col) % m == 0)``) when n is huge —
    k-means quality saturates around ~256 samples/centroid (the FAISS
    guideline) and the index assignment pass still covers every row.
    Returns the trained centroids."""
    spark = vectors.sparkSession
    cents = train_ivf_centroids(vectors, n_lists, n_iters, id_col, vec_col) \
        if centroids is None else _accept_quantizer(centroids)
    keep = [id_col, vec_col, *meta_cols]
    rows = assign_rows(vectors.select(*keep), cents, vec_col)
    (rows.repartition(F.col("list"))
         .write.mode("overwrite").partitionBy("list")
         .parquet(_lists_dir(out_dir)))
    cdf = spark.createDataFrame(
        [(i, [float(x) for x in cents[i]]) for i in range(len(cents))],
        schema="list int, cvec array<double>")
    cdf.coalesce(1).write.mode("overwrite").parquet(_centroids_dir(out_dir))
    return cents


def read_centroids(spark, index_dir: str) -> np.ndarray:
    rows = spark.read.parquet(_centroids_dir(index_dir)).collect()
    k = len(rows)
    out = np.empty((k, len(rows[0]["cvec"])), dtype=np.float64)
    for r in rows:
        out[r["list"]] = r["cvec"]
    return out


def append_ivf_vectors(vectors: DataFrame, index_dir: str,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       meta_cols: tuple = ()) -> None:
    """Incremental ingest: assign a new batch with the STORED centroids
    (frozen quantizer — the standard IVF regime) and append to the list
    partitions. Update = tombstone/exclude the old id + compact, exactly
    like the LSH index."""
    cents = read_centroids(vectors.sparkSession, index_dir)
    keep = [id_col, vec_col, *meta_cols]
    rows = assign_rows(vectors.select(*keep), cents, vec_col)
    (rows.repartition(F.col("list"))
         .write.mode("append").partitionBy("list")
         .parquet(_lists_dir(index_dir)))


def compact_ivf_index(spark, vectors: DataFrame, index_dir: str,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      meta_cols: tuple = (), exclude=None,
                      tombstones_from: str | None = None) -> None:
    """Rebuild the list partitions from a fresh vector scan minus
    tombstoned/excluded ids, keeping the trained centroids (no retrain
    — assignments of surviving vectors cannot change)."""
    cents = read_centroids(spark, index_dir)
    vectors = _apply_exclusions(spark, vectors, id_col, exclude,
                                tombstones_from)
    keep = [id_col, vec_col, *meta_cols]
    rows = assign_rows(vectors.select(*keep), cents, vec_col)
    (rows.repartition(F.col("list"))
         .write.mode("overwrite").partitionBy("list")
         .parquet(_lists_dir(index_dir)))


def probe_lists(centroids: np.ndarray, probe: list[float],
                nprobe: int) -> list[int]:
    """The ``nprobe`` nearest lists by centroid dot score, ties to the
    lower list id — O(k·dim) on the driver, no Spark job."""
    dots = centroids @ np.asarray(probe, dtype=np.float64)
    nprobe = min(nprobe, len(dots))
    order = np.lexsort((np.arange(len(dots)), -dots))
    return [int(i) for i in order[:nprobe]]


def ivf_topk(spark, index_dir: str, probe: list[float], k: int = 10,
             nprobe: int = 8, id_col: str = "vec_id",
             vec_col: str = "embedding", exclude=None,
             tombstones_from: str | None = None,
             filters: dict | None = None,
             metadata: DataFrame | None = None,
             centroids: np.ndarray | None = None) -> DataFrame:
    """Partition-pruned probe: score k centroids on the driver, scan
    only the ``nprobe`` chosen ``list=`` dirs, exact cosine top-k over
    the candidates. ``filters``/``exclude``/``tombstones_from`` compose
    exactly as on ``ann_topk``. At nprobe == n_lists this is exact
    brute-force search (every vector lives in exactly one list).
    ``centroids`` skips the stored-quantizer read when the caller
    already holds it (the federation reads it once per shard for its
    shared-quantizer check — passing it back halves the probe's fixed
    driver cost)."""
    cents = read_centroids(spark, index_dir) \
        if centroids is None else centroids
    lists = probe_lists(cents, probe, nprobe)
    cand = (spark.read.parquet(_lists_dir(index_dir))
            .where(F.col("list").isin(lists)))       # dir pruning
    cand = _apply_filters(cand, filters, metadata, id_col)
    cand = _apply_exclusions(spark, cand, id_col, exclude, tombstones_from)
    return cosine_topk(cand, probe, k, id_col, vec_col)
