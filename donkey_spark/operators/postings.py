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
from ..kernels.blocks import encode_groups

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
    (term, salt) + sortWithinPartitions, then ONE mapInPandas whose kernel
    (kernels.blocks.encode_groups) encodes every group in a batch in a single
    vectorized pass. groupBy().applyInPandas would invoke Python once per
    (term, salt) group (~2 ms each — measured); at vocab × ranges groups that
    dominates the build, so the per-group dispatch is eliminated instead of
    tuned. Arrow batches can split a group, so a carry-over buffer defers the
    trailing (possibly incomplete) group to the next batch; groups never span
    partitions (hash partitioning), so the flush at end-of-partition is exact.
    """
    spark = doc_terms.sparkSession
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    dt = (doc_terms
          .withColumn("salt", F.expr(f"doc_id DIV {range_size}"))
          .repartition(n_part, "term", "salt")
          .sortWithinPartitions("term", "salt", "doc_id"))

    def encode_stream(batches):
        carry: pd.DataFrame | None = None

        def encode(pdf: pd.DataFrame) -> pd.DataFrame:
            cols = encode_groups(pdf["term"].to_numpy(),
                                 pdf["salt"].to_numpy(),
                                 pdf["doc_id"].to_numpy(),
                                 pdf["tf"].to_numpy(),
                                 pdf["dl"].to_numpy(),
                                 avgdl, block_size=block_size, codec=codec)
            return pd.DataFrame(cols)

        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            t = pdf["term"].to_numpy()
            s = pdf["salt"].to_numpy()
            in_last = (t == t[-1]) & (s == s[-1])
            before = np.flatnonzero(~in_last)
            cut = int(before[-1]) + 1 if before.size else 0
            if cut:
                yield encode(pdf.iloc[:cut])
            carry = pdf.iloc[cut:]
        if carry is not None and len(carry):
            yield encode(carry)

    return dt.mapInPandas(encode_stream, SEGMENT_SCHEMA)


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
