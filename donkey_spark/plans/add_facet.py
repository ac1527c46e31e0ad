"""Facet backfill — index a NEW filter column on an existing index
without rebuilding it.

At 10^12 files, "we now need to filter by license" must not cost a full
reindex: facet postings are zero-idf presence terms in the same
(term, salt) layout as content postings (operators/facets.py), so a new
column is just MORE postings — buildable from the docs metadata alone
(no content pass, no touch of existing segments):

* one ``segments/chunk=facet_<col>`` dir built by the streaming path's
  ``build_segments`` from (doc_id, dl, "\\x01col=value", tf=1) rows —
  the dl comes from the docs table, the salt from the index's own
  range_size, so the new postings co-locate with every query's scan;
* one ``dictionary/chunk=facet_<col>`` partial (readers sum chunks;
  the merge rule treats non-stream chunks as always live);
* a ``manifest_stream`` journal row at a NEGATIVE ODD epoch carrying
  the posting count (n_docs=0, sum_dl=0 — corpus stats unchanged), so
  later streaming epochs' running totals stay exact. The row is keyed
  by its ``facet:<col>`` status: re-running the backfill OVERWRITES the
  same row instead of stacking a second count (r5 review — a torn
  first run must not double-count), and upsert epochs (even negatives,
  plans/upsert.py) / stream checkpoints (non-negatives) can never
  collide with the allocation;
* meta gains the column in ``facets``; compact_index preserves it —
  its caller corpus must carry the column from then on.

Later epochs: a facet column the corpus schema carries (e.g. lang) is
indexed for new docs automatically; a column backfilled from caller
``values=`` is NOT on later batches, so streaming/upsert epochs skip
it (their docs get no presence posting — NULL semantics) and a
re-run of ``add_facet`` (a REFRESH — allowed for backfilled columns)
rebuilds the postings over the docs table as it stands.

The write order (segments → dictionary → journal → meta) makes a torn
run invisible: until meta commits, planners do not know the facet
exists, and re-running overwrites the same chunk dirs idempotently;
the final meta stats are recomputed from base + journal, so they
converge from ANY torn state rather than accumulating increments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def add_facet(spark: SparkSession, index_dir: str, column: str,
              values: DataFrame | None = None) -> dict:
    """Backfill facet ``column`` onto an existing index.

    ``values``: (doc_id, value) DataFrame — one row per doc, NULL/absent
    docs get no presence posting (same semantics as build-time facets);
    omit it to take the column from the index's own docs table (works
    for the metadata columns docs already stores, e.g. lang). Returns
    {"column", "n_postings", "n_values"}.
    """
    from ..fsutil import fs_exists
    from ..operators.facets import FACET_PREFIX
    from ..operators.postings import (build_segments,
                                      dictionary_from_segments,
                                      merge_segments)
    from .build import _check_dictionary_layout
    if not fs_exists(spark, f"{index_dir}/meta"):
        raise ValueError(f"{index_dir} is not an index (no meta)")
    _check_dictionary_layout(spark, index_dir)
    m = spark.read.parquet(f"{index_dir}/meta").collect()[0].asDict()
    from ..streaming.ingest import split_facets
    facets = split_facets(m, "facets")
    rfacets = split_facets(m, "range_facets")
    if column in rfacets:
        raise ValueError(
            f"{column!r} is already a RANGE facet (range_facets="
            f"{rfacets}) — a column is one kind of facet, not both")
    if column in facets and not fs_exists(
            spark, f"{index_dir}/segments/chunk=facet_{column}"):
        # a BUILD-time facet (postings interleaved in the batch chunks)
        # cannot be regenerated from docs metadata alone; only columns
        # this module backfilled may be refreshed
        raise ValueError(f"facet {column!r} is already indexed by the "
                         f"build (facets={facets}) — only backfilled "
                         f"columns can be refreshed")

    docs = spark.read.parquet(f"{index_dir}/docs")
    if values is None:
        if column not in docs.columns:
            raise ValueError(
                f"docs table has no column {column!r} — pass values= "
                f"(a (doc_id, value) DataFrame) to backfill it")
        vals = docs.select("doc_id", F.col(column).alias("value"))
    else:
        vals = values.select("doc_id", F.col("value"))
        dup = (vals.groupBy("doc_id").count()
               .where(F.col("count") > 1).limit(1).collect())
        if dup:
            raise ValueError(
                f"values has multiple rows for doc_id {dup[0]['doc_id']}"
                f" — a doc carries at most one value per facet column")
        vals = docs.select("doc_id").join(vals, "doc_id")

    dt = (docs.select("doc_id", "dl")
          .join(vals.where(F.col("value").isNotNull()), "doc_id")
          .select("doc_id", "dl",
                  F.concat(F.lit(f"{FACET_PREFIX}{column}="),
                           F.col("value").cast("string")).alias("term"),
                  F.lit(1).alias("tf")))

    n_post, n_vals = _write_backfill(spark, index_dir, m, dt,
                                     chunk=f"facet_{column}",
                                     status=f"facet:{column}")

    # meta commit: stats RECOMPUTED from base + journal (never
    # incremented), through the ONE shared reconcile helper — converges
    # from any torn state (a crash between the journal and meta writes,
    # or a refresh whose previous count meta never saw)
    from ..streaming.ingest import reconcile_meta
    reconcile_meta(spark, index_dir, add_facets=(column,))
    return {"column": column, "n_postings": n_post, "n_values": n_vals}


def add_range_facet(spark: SparkSession, index_dir: str, column: str,
                    values: DataFrame | None = None) -> dict:
    """Backfill numeric range facet ``column`` onto an existing index —
    the T25 twin of add_facet: "we now need to filter by file size"
    must not cost a reindex any more than a new license column does.

    ``values``: (doc_id, value) DataFrame, value castable to long (one
    row per doc; NULL/absent docs index nothing — a NOT/complement
    filter admits them, same as build-time range facets); omit it to
    take the column from the index's own docs table (e.g. ``dl``, the
    one numeric column docs always stores). Postings are the SAME
    64/RANGE_STEP trie presence tags the batch build writes
    (operators/ranges.range_tags_col — one shared expression, so the
    backfill and the build can never drift), in one
    ``segments/chunk=rfacet_<col>`` dir; queries and binned histograms
    work the moment meta commits. Later epochs index the column inline
    when their batch carries it (NULL semantics otherwise); re-running
    refreshes a backfilled column but refuses a build-time one."""
    from ..fsutil import fs_exists
    from ..operators.ranges import RANGE_STEP, range_tags_col
    from .build import _check_dictionary_layout
    if not fs_exists(spark, f"{index_dir}/meta"):
        raise ValueError(f"{index_dir} is not an index (no meta)")
    _check_dictionary_layout(spark, index_dir)
    m = spark.read.parquet(f"{index_dir}/meta").collect()[0].asDict()
    from ..streaming.ingest import split_facets
    rfacets = split_facets(m, "range_facets")
    # pre-range-facet meta has no range_step column — default like every
    # other reader (plans/query.py Index, streaming _base_state) so the
    # headline use case (add a range filter to an OLD index) works
    step = int(m.get("range_step") or RANGE_STEP)
    facets = split_facets(m, "facets")
    if column in facets:
        raise ValueError(
            f"{column!r} is already an EQUALITY facet (facets={facets}) —"
            f" a column is one kind of facet, not both; pick another name")
    if column in rfacets and not fs_exists(
            spark, f"{index_dir}/segments/chunk=rfacet_{column}"):
        raise ValueError(f"range facet {column!r} is already indexed by "
                         f"the build (range_facets={rfacets}) — only "
                         f"backfilled columns can be refreshed")

    docs = spark.read.parquet(f"{index_dir}/docs")
    if values is None:
        if column not in docs.columns:
            raise ValueError(
                f"docs table has no column {column!r} — pass values= "
                f"(a (doc_id, value) DataFrame) to backfill it")
        vals = docs.select("doc_id", F.col(column).alias("value"))
    else:
        vals = values.select("doc_id", F.col("value"))
        dup = (vals.groupBy("doc_id").count()
               .where(F.col("count") > 1).limit(1).collect())
        if dup:
            raise ValueError(
                f"values has multiple rows for doc_id {dup[0]['doc_id']}"
                f" — a doc carries at most one value per facet column")
        vals = docs.select("doc_id").join(vals, "doc_id")

    # cast long FIRST so an uncastable value is NULL (= unindexed)
    # everywhere below, the exact build-side append_range_terms rule
    vals = vals.select("doc_id", F.col("value").cast("long").alias("v"))
    dt = (docs.select("doc_id", "dl")
          .join(vals.where(F.col("v").isNotNull()), "doc_id")
          .select("doc_id", "dl",
                  F.explode(range_tags_col(F.col("v"), column,
                                           step)).alias("term"),
                  F.lit(1).alias("tf")))

    n_post, n_vals = _write_backfill(spark, index_dir, m, dt,
                                     chunk=f"rfacet_{column}",
                                     status=f"rfacet:{column}")
    from ..streaming.ingest import reconcile_meta
    reconcile_meta(spark, index_dir, add_range_facets=(column,))
    return {"column": column, "n_postings": n_post, "n_values": n_vals}


def _write_backfill(spark: SparkSession, index_dir: str, m: dict,
                    dt: DataFrame, *, chunk: str,
                    status: str) -> tuple[int, int]:
    """Shared backfill commit: segments chunk → dictionary partial →
    journal row (write order makes a torn run invisible — meta, which
    alone makes the facet visible to planners, commits after this in
    the caller). Returns (n_postings, n_dictionary_rows)."""
    from ..operators.postings import (build_segments,
                                      dictionary_from_segments,
                                      merge_segments)
    if dt.isEmpty():
        # an all-null (or no-matching-doc_id) backfill would write a
        # segments dir holding only _SUCCESS, and the read-back below
        # raises UNABLE_TO_INFER_SCHEMA (r5 third review) — and there
        # is nothing to index anyway: docs without the column already
        # pass NOT-filters and fail equality/range filters
        raise ValueError(
            f"no non-null values to index for {status!r} — "
            f"nothing to backfill")

    from pyspark.sql import Observation
    obs = Observation(chunk)
    seg = merge_segments(build_segments(
        dt, float(m["avgdl"]), int(m["range_size"]),
        codec=m["codec"], block_size=int(m["block_size"])),
        n_buckets=int(m["n_buckets"]))
    seg = seg.observe(obs, F.coalesce(F.sum("n_docs"), F.lit(0)).alias("p"))
    (seg.write.mode("overwrite").partitionBy("bucket")
        .parquet(f"{index_dir}/segments/chunk={chunk}"))
    n_post = int(obs.get["p"])

    seg_chunk = spark.read.parquet(f"{index_dir}/segments/chunk={chunk}")
    (dictionary_from_segments(seg_chunk, n_buckets=int(m["n_buckets"]))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(f"{index_dir}/dictionary/chunk={chunk}"))
    # one row per term in the partial just written — a metadata-light
    # count, not another distinct() shuffle over the postings chunk
    n_vals = spark.read.parquet(
        f"{index_dir}/dictionary/chunk={chunk}").count()

    # journal the posting count: this column's OWN row if one exists
    # (a re-run — torn or refresh — overwrites it; a fresh allocation
    # would stack a second count into every later epoch's running
    # totals), else a fresh ODD negative epoch below everything (even
    # negatives belong to upserts, non-negatives to stream checkpoints)
    from ..streaming.ingest import journal_df
    epoch = None
    journal = journal_df(spark, index_dir)
    if journal is not None:
        mine = (journal.where(F.col("status") == status)
                .select("epoch").limit(1).collect())
        if mine:
            epoch = int(mine[0]["epoch"])     # reuse verbatim (legacy
            #                                   rows may sit at evens)
        else:
            low = journal.agg(F.min("epoch")).collect()[0][0]
            if low is not None and int(low) < 0:
                epoch = int(low) - 1
                if epoch % 2 == 0:           # fresh rows: odd negatives
                    epoch -= 1               # (below everything either way)
    if epoch is None:
        epoch = -1
    (spark.createDataFrame(
        [(status, 0, 0, n_post)],
        "status string, n_docs long, sum_dl long, n_postings long")
        .write.mode("overwrite")
        .parquet(f"{index_dir}/manifest_stream/epoch={epoch}"))
    return n_post, n_vals
