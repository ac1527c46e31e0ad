"""Ops 22/23 + K8 — posting-segment build & merge (SURVEY §2.4, §2.8).

Donkey's `Index::rebuild` bulk-build / `reindex` analogs `[donkey:
src/index-kgraph.cpp — unverified, SURVEY §0]`, re-designed for Spark:

**Global doc-range salting** (K8, improved): every term shares the same salt
    salt = doc_id DIV range_size
so (a) a hot term's postings split into bounded ≤range_size groups — the
applyInPandas frame for *any* term fits an executor no matter how hot (the
north_rule's "salted repartitioning to defuse hot-term skew"); (b) salts are
contiguous, disjoint doc ranges, so per-salt blocks are already globally
sorted — the merge step is pure metadata renumbering (a window over block
rows, ~postings/128 of the data), never a binary re-encode shuffle; (c) at
query time all terms co-partition by salt, so scoring is one
groupBy(salt).applyInPandas with no per-doc shuffle.

range_size depends only on corpus size (config.default_range_size) — the
built index is identical at any parallelism (BASELINE.md index determinism).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import BLOCK_SIZE, N_BUCKETS
from ..kernels.blocks import encode_groups_core


def to_arrow_segment_schema():
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema
    return to_arrow_schema(SEGMENT_SCHEMA)

SEGMENT_SCHEMA = T.StructType([
    T.StructField("term", T.StringType(), False),
    T.StructField("salt", T.LongType(), False),
    T.StructField("block_id", T.IntegerType(), False),
    T.StructField("first_doc_id", T.LongType(), False),
    T.StructField("max_doc_id", T.LongType(), False),
    T.StructField("n_docs", T.IntegerType(), False),
    T.StructField("max_tf", T.IntegerType(), False),
    T.StructField("sum_tf", T.LongType(), False),
    T.StructField("block_max_tfpart", T.DoubleType(), False),
    T.StructField("docids_blob", T.BinaryType(), False),
    T.StructField("tfs_blob", T.BinaryType(), False),
    T.StructField("dls_blob", T.BinaryType(), False),
])


def term_bucket_py(term: str, n_buckets: int = N_BUCKETS) -> int:
    """crc32-based bucket — computable identically on the driver (zlib)
    and in the JVM (F.crc32), so query planning can prune partitions
    without a Spark job."""
    return zlib.crc32(term.encode("utf-8")) % n_buckets


def term_bucket_col(term_col, n_buckets: int = N_BUCKETS):
    return F.pmod(F.crc32(F.encode(term_col, "UTF-8")),
                  F.lit(n_buckets)).cast("int")


def build_segments(doc_terms: DataFrame, avgdl: float, range_size: int,
                   codec: str = "varint", block_size: int = BLOCK_SIZE,
                   num_partitions: int | None = None) -> DataFrame:
    """(doc_id, dl, term, tf) -> compressed block rows.

    THE big exchange of the build (SURVEY §3.2 stage B): hash-repartition by
    (term, salt) + sortWithinPartitions, then ONE mapInArrow whose kernel
    (kernels.blocks.encode_groups_core) encodes every group in a batch in a
    single vectorized pass.

    Why this exact physical shape (each alternative was measured):
    * groupBy().applyInPandas dispatches Python per (term, salt) group
      (~2 ms each) — fatal at vocab × ranges groups;
    * mapInPandas materializes every term as a Python str (50M+ objects);
      mapInArrow keeps the term column an Arrow array end-to-end — group
      boundaries come from C-level pa.compute.not_equal on adjacent slices
      and the output term column is a take() of block starts.
    Arrow batches can split a group, so flushes defer the trailing
    (possibly incomplete) group; groups never span partitions (hash
    partitioning), so the end-of-partition flush is exact.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    spark = doc_terms.sparkSession
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    dt = (doc_terms
          .withColumn("salt", F.expr(f"doc_id DIV {range_size}"))
          .repartition(n_part, "term", "salt")
          .sortWithinPartitions("term", "salt", "doc_id"))

    out_type = to_arrow_segment_schema()
    flush_rows = 1 << 18          # decouple kernel calls from Arrow batching

    def encode_table(tbl: pa.Table) -> pa.RecordBatch:
        n = tbl.num_rows
        term = tbl.column("term").combine_chunks()
        salts = tbl.column("salt").to_numpy()
        new_group = np.empty(n, dtype=bool)
        new_group[0] = True
        if n > 1:
            neq = pc.not_equal(term.slice(1), term.slice(0, n - 1))
            new_group[1:] = (neq.to_numpy(zero_copy_only=False)
                             | (salts[1:] != salts[:-1]))
        bstart, cols = encode_groups_core(
            new_group, tbl.column("doc_id").to_numpy(),
            tbl.column("tf").to_numpy(), tbl.column("dl").to_numpy(),
            avgdl, block_size=block_size, codec=codec)
        arrays = [pc.take(term, pa.array(bstart)),
                  pa.array(salts[bstart], pa.int64()),
                  pa.array(cols["block_id"], pa.int32()),
                  pa.array(cols["first_doc_id"], pa.int64()),
                  pa.array(cols["max_doc_id"], pa.int64()),
                  pa.array(cols["n_docs"], pa.int32()),
                  pa.array(cols["max_tf"], pa.int32()),
                  pa.array(cols["sum_tf"], pa.int64()),
                  pa.array(cols["block_max_tfpart"], pa.float64()),
                  pa.array(cols["docids_blob"], pa.binary()),
                  pa.array(cols["tfs_blob"], pa.binary()),
                  pa.array(cols["dls_blob"], pa.binary())]
        return pa.RecordBatch.from_arrays(arrays, schema=out_type)

    def cut_point(tbl: pa.Table) -> int:
        """Index of the first row of the trailing (term, salt) group."""
        n = tbl.num_rows
        term = tbl.column("term")
        salts = tbl.column("salt")
        last_t, last_s = term[n - 1], salts[n - 1]
        in_last = pc.and_(pc.equal(term, last_t),
                          pc.equal(salts, last_s)).to_numpy(
            zero_copy_only=False)
        before = np.flatnonzero(~in_last)
        return int(before[-1]) + 1 if before.size else 0

    def encode_stream(batches):
        buf: list[pa.RecordBatch] = []
        nrows = 0
        for rb in batches:
            if rb.num_rows:
                buf.append(rb)
                nrows += rb.num_rows
            if nrows < flush_rows:
                continue
            whole = pa.Table.from_batches(buf).combine_chunks()
            cut = cut_point(whole)
            if cut:
                yield encode_table(whole.slice(0, cut))
            carry = whole.slice(cut)
            buf = carry.to_batches() if carry.num_rows else []
            nrows = carry.num_rows
        if nrows:
            yield encode_table(pa.Table.from_batches(buf).combine_chunks())

    return dt.mapInArrow(encode_stream, SEGMENT_SCHEMA)


def merge_segments(segments: DataFrame) -> DataFrame:
    """Op 23: merge per-salt runs into the global per-term posting list.

    Doc-range salts are contiguous, disjoint and ordered, so the merged
    global list for a term IS the ordered union of its blocks by
    (salt, block_id) — a sort key, not a re-encode. The only physical work
    is stamping the bucket (partition-pruning) column; block payloads are
    untouched and the result is invariant to build chunking / input order /
    parallelism (BASELINE.md index determinism). A legacy-style merge that
    re-encodes overlapping runs is deliberately unnecessary by construction.
    """
    return segments.withColumn("bucket", term_bucket_col(F.col("term")))


def dictionary_from_segments(segments: DataFrame) -> DataFrame:
    """Term dictionary (df, cf, n_blocks, max tf-part) aggregated from block
    metadata — block-granular, no second pass over postings."""
    return (segments.groupBy("term")
            .agg(F.sum("n_docs").alias("df"),
                 F.sum("sum_tf").alias("cf"),
                 F.count("*").cast("int").alias("n_blocks"),
                 F.max("block_max_tfpart").alias("max_tfpart"))
            .withColumn("bucket", term_bucket_col(F.col("term"))))


def segments_digest(segments: DataFrame) -> tuple[int, int]:
    """Order-independent content digest (row count, xor of row hashes) —
    the BASELINE.md index-determinism check across input order /
    parallelism / partition count."""
    h = F.sha2(F.concat_ws(
        "|", "term", "salt", "block_id", "first_doc_id", "max_doc_id",
        "n_docs", "max_tf", "sum_tf",
        F.format_number(F.col("block_max_tfpart"), 12),
        F.base64("docids_blob"), F.base64("tfs_blob"), F.base64("dls_blob"),
    ), 256)
    row = (segments.select(F.conv(F.substring(h, 1, 15), 16, 10)
                           .cast("long").alias("h"))
           .agg(F.count("*").alias("n"), F.expr("bit_xor(h)").alias("x"))
           .collect()[0])
    return int(row["n"]), int(row["x"] or 0)
