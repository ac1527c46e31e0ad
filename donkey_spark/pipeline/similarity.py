"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — exact brute-force cosine top-k, built-ins only
  (zip_with product + aggregate sum run in codegen; no UDF, no Python).
  The ◇ oracle is DuckDB's list_cosine_similarity.
* ``lsh_ann_topk`` — the scale path: random-hyperplane LSH [Charikar 2002]
  with deterministic sha-seeded planes; candidates = vectors sharing the
  probe's bucket in any table, exact-rescored. At 10^9+ vectors the bucket
  join replaces the full scan; recall is tested vs brute force.

r5: bucket assignment runs in the ``kernels/annproj`` mapInArrow matmul
kernel at any dim (``method="arrow"``, default; the Catalyst-expression
path survives as the small-dim oracle), and probes accept metadata
``filters`` (equality/OR/NOT — see ``_apply_filters``) composing with
tombstone exclusion.
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
                id_col: str = "vec_id", vec_col: str = "embedding",
                filters: dict | None = None,
                metadata: DataFrame | None = None,
                exclude=None,
                tombstones_from: str | None = None) -> DataFrame:
    """Exact top-k by cosine vs a probe vector. orderBy+limit lowers to
    TakeOrderedAndProject (per-partition heap + driver merge).

    ``filters``/``metadata``/``exclude``/``tombstones_from`` carry the
    SAME semantics as on ``ann_topk``/``ivf_topk`` (r5 review: the exact
    branch must honor every knob hybrid_topk documents as pass-through):
    filter columns present on ``vectors`` predicate directly, the rest
    resolve through ``metadata``; exclusions drop ids before ranking."""
    cand = _apply_filters(vectors, filters, metadata, id_col)
    cand = _apply_exclusions(vectors.sparkSession, cand, id_col,
                             exclude, tombstones_from)
    p = F.array(*[F.lit(float(x)) for x in probe])
    return (cand
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
    """Bucket id for one hash table: sign bits of plane projections.

    SMALL-DIM ORACLE ONLY (r5): every plane element is a plan literal and
    every sign bit an interpreted HOF fold — at 768-d × 8 tables × 6
    planes that is ~37k multiply-adds per row. The production build path
    is ``kernels.annproj`` (one numpy matmul per Arrow batch, same
    deterministic planes, bit-identical buckets — tested)."""
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


def _filter_pred(col: str, spec) -> Column:
    """Metadata-filter predicate — the SAME spec grammar as the BM25
    facet filters, via the shared ``operators.facets
    .normalize_filter_spec`` (one parser, two surfaces): membership for
    a scalar/list, ``{'not': [...]}`` → complement INCLUDING
    null-valued rows (matching the BM25 NOT twin's ``IS NULL OR NOT
    IN``), and numeric ranges ``{'range': [lo, hi]}`` (either end None
    = open) / ``{'not': {'range': ...}}`` — here a plain NOT-NULL +
    BETWEEN over the denormalized meta column (ANN candidates are
    already pruned and bounded; the BM25 side needs the trie postings,
    this side does not). Null rows never match a range — even a
    fully-open one — exactly like the trie side, where a null-valued
    doc carries no tags."""
    from ..operators.facets import normalize_filter_spec
    kind, vals = normalize_filter_spec(col, spec)
    if kind in ("range", "not_range"):
        lo, hi = vals
        # base = NOT NULL, matching the BM25 trie side exactly: a doc
        # with no value carries no trie tag, so even a fully-open
        # [None, None] range matches only non-null rows there
        pred = F.col(col).isNotNull()
        if lo is not None:
            pred = F.col(col) >= F.lit(lo)
        if hi is not None:
            pred = pred & (F.col(col) <= F.lit(hi))
        if kind == "not_range":
            return F.col(col).isNull() | ~pred
        return pred
    if kind == "not":
        return F.col(col).isNull() | ~F.col(col).isin(list(vals))
    return F.col(col).isin(list(vals))


def _apply_filters(cand: DataFrame, filters: dict | None,
                   metadata: DataFrame | None, id_col: str) -> DataFrame:
    """Restrict ANN candidates by metadata values — the compound query a
    training-data pipeline runs first ("nearest neighbors among lang=py
    docs"). Columns present ON the candidate rows filter directly (the
    predicate pushes into the pruned parquet scan — build the index with
    ``meta_cols`` to get this); the rest resolve through ``metadata``
    (any DataFrame carrying id_col + the filter columns) via a broadcast
    semi-join on the filtered slice — bounded, because the filter slice
    is broadcast only after its own predicate pushes into ITS scan, and
    the candidate side is already tiny post-pruning."""
    if not filters:
        return cand
    meta_needed = {c: s for c, s in filters.items()
                   if c not in cand.columns}
    for c, spec in filters.items():
        if c not in meta_needed:
            cand = cand.where(_filter_pred(c, spec))
    if meta_needed:
        if metadata is None:
            raise ValueError(
                f"filters on {sorted(meta_needed)} need these columns "
                f"denormalized into the index (build_ann_index meta_cols=...)"
                f" or a `metadata` DataFrame carrying {id_col} + them")
        keep = metadata
        for c, spec in meta_needed.items():
            keep = keep.where(_filter_pred(c, spec))
        cand = cand.join(F.broadcast(keep.select(id_col).distinct()),
                         id_col, "left_semi")
    return cand


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
                 exclude=None, tombstones_from: str | None = None,
                 filters: dict | None = None,
                 method: str = "arrow") -> DataFrame:
    """Approximate top-k over the RAW vector table: union of the probe's
    buckets across hash tables, exact cosine rescoring of candidates only.
    One full scan — fine ad hoc; the indexed path below
    (build_ann_index/ann_topk) replaces the scan with partition pruning.

    ``method="arrow"`` (default) hashes each Arrow batch with ONE numpy
    matmul (kernels/annproj.py — dimension-robust); ``"expr"`` keeps the
    r4 Catalyst-literal path as the small-dim oracle. Candidate sets are
    identical (tested bit-identical at dim 64).

    ``filters``: metadata predicates evaluated directly on the vector
    table's columns BEFORE hashing — the filter pushes into the scan.
    ``exclude``/``tombstones_from``: see _apply_exclusions."""
    dim = len(probe)
    pbs = probe_buckets(probe, n_tables, n_planes)
    vectors = _apply_filters(vectors, filters, None, id_col)
    if method == "expr":
        match = None
        for t in range(n_tables):
            planes = _planes(dim, n_planes, seed=f"t{t}")
            cond = lsh_bucket_expr(F.col(vec_col), planes, t) == pbs[t]
            match = cond if match is None else (match | cond)
        cand = vectors.where(match)
    else:
        from ..kernels.annproj import bucket_rows_arrow
        cand = (bucket_rows_arrow(vectors, vec_col, n_tables, n_planes,
                                  dim=dim)
                .where(F.col("bucket").isin(pbs))
                .dropDuplicates([id_col]))     # multi-table hits, once
    cand = _apply_exclusions(vectors.sparkSession, cand,
                             id_col, exclude, tombstones_from)
    return cosine_topk(cand, probe, k, id_col, vec_col)


def embedding_neardup_pairs(vectors: DataFrame, threshold: float = 0.9,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            n_tables: int = 4, n_planes: int = 8,
                            dim: int | None = None,
                            method: str = "arrow") -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS — the vector-space twin of
    the MinHash text near-dup (pipeline/dedup.neardup_pairs): candidate
    pairs are vectors sharing an LSH bucket in ANY table (**never
    all-pairs** — the same bucketed shape that makes MinHash banding
    scale), then exact cosine rescoring keeps pairs ≥ threshold.

    Returns (id_a, id_b, cosine) with id_a < id_b, cosine rounded to 6.
    Recall is governed by (n_tables, n_planes) exactly like the ANN
    probe — fewer planes = bigger buckets = more candidates; the
    candidate-pair count is Σ_buckets C(bucket_size, 2), bounded by the
    hash granularity, not n². Bucket assignment runs the production
    matmul kernel (kernels/annproj.py)."""
    rows = ann_bucket_rows(vectors, id_col, vec_col, n_tables, n_planes,
                           dim=dim, method=method)
    a = rows.select(F.col(id_col).alias("id_a"),
                    F.col(vec_col).alias("_va"), "bucket")
    b = rows.select(F.col(id_col).alias("id_b"),
                    F.col(vec_col).alias("_vb"), "bucket")
    cand = (a.join(b, "bucket")
             .where(F.col("id_a") < F.col("id_b"))
             # a pair colliding in several tables must rescore ONCE
             .dropDuplicates(["id_a", "id_b"]))
    return (cand.select("id_a", "id_b",
                        F.round(cosine_expr(F.col("_va"), F.col("_vb")), 6)
                        .alias("cosine"))
            .where(F.col("cosine") >= threshold))


# --- materialized LSH index (the 10^9+-vector path) -------------------------

def ann_bucket_rows(vectors: DataFrame, id_col: str = "vec_id",
                    vec_col: str = "embedding", n_tables: int = 8,
                    n_planes: int = 6, dim: int | None = None,
                    meta_cols: tuple = (),
                    method: str = "arrow") -> DataFrame:
    """(vec_id, embedding[, meta...], bucket): one row per (vector, hash
    table), the bucket id carrying the table offset so ids are globally
    unique across tables.

    ``method="arrow"`` (default, r5): ONE numpy matmul per Arrow batch
    over the stacked deterministic planes (kernels/annproj.py) — cost
    O(n·dim·T·P) in BLAS, plan size O(1), and `dim` is read off the
    first batch (no `.first()` driver job). ``method="expr"`` keeps the
    r4 Catalyst-literal projection as the small-dim oracle; both emit
    bit-identical buckets (tested at dim 64).

    ``meta_cols``: extra metadata columns denormalized into the bucket
    rows so probe-time filters push straight into the pruned scan."""
    keep = [id_col, vec_col, *meta_cols]
    if method == "expr":
        if dim is None:
            dim = len(vectors.select(vec_col).first()[0])
        buckets = F.array(*[
            lsh_bucket_expr(F.col(vec_col),
                            _planes(dim, n_planes, seed=f"t{t}"), t)
            for t in range(n_tables)])
        return (vectors.select(*keep, F.explode(buckets).alias("bucket")))
    from ..kernels.annproj import bucket_rows_arrow
    return bucket_rows_arrow(vectors.select(*keep), vec_col,
                             n_tables, n_planes, dim=dim)


def build_ann_index(vectors: DataFrame, out_dir: str,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    n_tables: int = 8, n_planes: int = 6,
                    dim: int | None = None, meta_cols: tuple = (),
                    method: str = "arrow") -> None:
    """Materialize the bucket table, partitioned by bucket, so a probe
    reads exactly n_tables partition dirs out of n_tables·2^n_planes.

    Vectors are denormalized into the bucket rows (n_tables× storage) so a
    probe needs NO join back to the vector table — the pruned scan feeds
    the rescorer directly. ``meta_cols`` additionally denormalizes
    metadata (lang, source, license...) so filtered probes stay
    join-free too. For storage-tight deployments store ids only and
    semi-join the vector table on the (bounded) candidate set instead."""
    rows = ann_bucket_rows(vectors, id_col, vec_col, n_tables, n_planes,
                           dim=dim, meta_cols=meta_cols, method=method)
    (rows.repartition(F.col("bucket"))
         .write.mode("overwrite").partitionBy("bucket").parquet(out_dir))


def append_ann_vectors(vectors: DataFrame, out_dir: str,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       n_tables: int = 8, n_planes: int = 6,
                       dim: int | None = None, meta_cols: tuple = (),
                       method: str = "arrow") -> None:
    """Incremental vector ingest: hash a NEW batch of vectors into the
    existing bucket table (plain partitioned append — the planes are
    deterministic, so old and new rows share the same bucket space).
    The ANN twin of streaming BM25 ingest: probes see appended vectors
    immediately, no rebuild. Pass the same ``meta_cols`` the index was
    built with, or filtered probes will miss the appended rows' columns.

    Semantics note: re-inserting an id that already exists leaves BOTH
    rows in the table and the probe's dropDuplicates picks one
    arbitrarily — to UPDATE a vector, tombstone/exclude the old id (it
    vanishes from results immediately) and compact later
    (``compact_ann_index``), exactly like document deletion."""
    rows = ann_bucket_rows(vectors, id_col, vec_col, n_tables, n_planes,
                           dim=dim, meta_cols=meta_cols, method=method)
    (rows.repartition(F.col("bucket"))
         .write.mode("append").partitionBy("bucket").parquet(out_dir))


def compact_ann_index(spark, vectors: DataFrame, out_dir: str,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      n_tables: int = 8, n_planes: int = 6,
                      tombstones_from: str | None = None,
                      exclude=None, dim: int | None = None,
                      meta_cols: tuple = (), method: str = "arrow") -> None:
    """The ANN `reindex` analog: full rebuild of the bucket table from
    the current vector set, minus tombstoned/excluded ids — reclaims
    the space of deleted vectors and collapses duplicate-id appends.
    ``vectors`` must be independent of ``out_dir`` (a fresh scan of the
    vector source), since the rebuild overwrites the bucket table."""
    vectors = _apply_exclusions(spark, vectors, id_col, exclude,
                                tombstones_from)
    build_ann_index(vectors, out_dir, id_col, vec_col, n_tables, n_planes,
                    dim=dim, meta_cols=meta_cols, method=method)


def ann_topk(spark, index_dir: str, probe: list[float], k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_tables: int = 8, n_planes: int = 6,
             multiprobe: int = 0, exclude=None,
             tombstones_from: str | None = None,
             filters: dict | None = None,
             metadata: DataFrame | None = None) -> DataFrame:
    """Probe the materialized bucket table: partition-pruned scan of the
    probe's n_tables·(1+multiprobe) buckets → dedupe → exact cosine
    top-k. Identical results to lsh_ann_topk on the same knobs at
    multiprobe=0; recall@10 per knob is measured in BENCH/BASELINE.md
    (bench/ann_recall.py).

    ``filters``: metadata predicates (see _apply_filters) — "nearest
    neighbors among lang=py docs". Columns the index denormalized
    (build_ann_index meta_cols) filter inside the pruned scan; others
    resolve via a broadcast semi-join against ``metadata``.
    ``exclude``/``tombstones_from`` drop deleted vectors before
    rescoring (see _apply_exclusions) — the bucket table itself stays
    frozen until the next build_ann_index, exactly like posting blocks
    between compactions."""
    pbs = probe_buckets(probe, n_tables, n_planes, multiprobe)
    cand = (spark.read.parquet(index_dir)
            .where(F.col("bucket").isin(pbs))        # dir pruning
            .dropDuplicates([id_col]))
    cand = _apply_filters(cand, filters, metadata, id_col)
    cand = _apply_exclusions(spark, cand, id_col, exclude, tombstones_from)
    return cosine_topk(cand, probe, k, id_col, vec_col)
