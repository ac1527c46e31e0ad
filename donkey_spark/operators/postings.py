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

import os
import time
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: DONKEY_PROF=1 → each build task appends its Python-side kernel seconds
#: to /tmp/donkey_prof.<stage>.log (dev-only; zero cost when unset)
_PROF = os.environ.get("DONKEY_PROF") == "1"


def _prof_write(stage: str, secs: float, items: int) -> None:
    with open(f"/tmp/donkey_prof.{stage}.log", "a") as f:
        f.write(f"{secs:.3f} {items}\n")

from ..config import BLOCK_SIZE, N_BUCKETS
from ..kernels.blocks import encode_column_pa, encode_groups_core
from ..kernels.varint import varint_decode


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


PARTIAL_SCHEMA = T.StructType([
    T.StructField("term", T.StringType(), False),
    T.StructField("salt", T.LongType(), False),
    T.StructField("n", T.IntegerType(), False),
    T.StructField("docids_blob", T.BinaryType(), False),   # delta+varint
    T.StructField("tfs_blob", T.BinaryType(), False),      # varint
    T.StructField("dls_blob", T.BinaryType(), False),      # varint
])


def build_partial_postings(feat: DataFrame, range_size: int) -> DataFrame:
    """Stage B1 (combiner): per input partition, fold its docs' features
    into compressed partial posting runs — ZERO shuffle.

    Input rows: (doc_id, dl, terms array, tfs array) — the fused extractor
    output, never exploded JVM-side. The kernel flattens the Arrow list
    columns (zero-copy), dictionary-encodes terms to int codes (C-level),
    lexsorts postings by (term_code, salt, doc_id) — integers only, no
    string sorting — and delta+varint-encodes one partial run per
    (term, salt) present in the partition.

    This is what makes the big exchange scale: the shuffle that follows
    moves ~2.5 B/posting of compressed partials instead of ~26 B/posting
    of exploded (doc_id, term, tf, dl) rows (measured 10x fewer bytes and
    ~10x fewer rows), which on this host is the difference between a
    bandwidth-throttled stage and a scaling one — and on a real cluster
    it is the network bill. Partials are always varint (internal format);
    the final block codec is chosen at merge time.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    from pyspark.sql.pandas.types import to_arrow_schema

    out_type = to_arrow_schema(PARTIAL_SCHEMA)

    def gen(batches):
        t_kernel, n_posts = 0.0, 0
        for rb in batches:
            if rb.num_rows == 0:
                continue
            t0 = time.monotonic() if _PROF else 0.0
            tbl = pa.Table.from_batches([rb]).combine_chunks()
            terms_list = tbl.column("terms").chunk(0)
            tfs_list = tbl.column("tfs").chunk(0)
            offs = terms_list.offsets.to_numpy()
            counts = np.diff(offs)
            if counts.sum() == 0:
                continue
            doc_ids = tbl.column("doc_id").to_numpy()
            dls = tbl.column("dl").to_numpy()
            flat_terms = terms_list.flatten()
            flat_tfs = tfs_list.flatten().to_numpy().astype(np.int64)
            doc_rep = np.repeat(doc_ids, counts)
            dl_rep = np.repeat(dls, counts).astype(np.int64)
            salt_rep = doc_rep // range_size
            dict_arr = pc.dictionary_encode(flat_terms)
            codes = dict_arr.indices.to_numpy().astype(np.int64)
            uniq = dict_arr.dictionary
            order = np.lexsort((doc_rep, salt_rep, codes))
            codes_s = codes[order]
            salt_s = salt_rep[order]
            ids_s = doc_rep[order]
            n = ids_s.size
            new_group = np.empty(n, dtype=bool)
            new_group[0] = True
            new_group[1:] = ((codes_s[1:] != codes_s[:-1])
                             | (salt_s[1:] != salt_s[:-1]))
            gstart = np.flatnonzero(new_group)
            gend = np.append(gstart[1:], n)
            ids_u = ids_s.astype(np.uint64)
            delta = ids_u.copy()
            delta[1:] = ids_u[1:] - ids_u[:-1]
            delta[gstart] = ids_u[gstart]
            tfs_s = flat_tfs[order].astype(np.uint64)
            dls_s = dl_rep[order].astype(np.uint64)
            arrays = [
                pc.take(uniq, pa.array(codes_s[gstart])),
                pa.array(salt_s[gstart], pa.int64()),
                pa.array((gend - gstart).astype(np.int32), pa.int32()),
                encode_column_pa(delta, gstart, gend),
                encode_column_pa(tfs_s, gstart, gend),
                encode_column_pa(dls_s, gstart, gend),
            ]
            rb_out = pa.RecordBatch.from_arrays(arrays, schema=out_type)
            if _PROF:
                t_kernel += time.monotonic() - t0
                n_posts += n
            yield rb_out
        if _PROF:
            _prof_write("b1", t_kernel, n_posts)

    return feat.mapInArrow(gen, PARTIAL_SCHEMA)


def _binary_concat(arr) -> memoryview:
    """Zero-copy concatenation of a non-null pa.BinaryArray's values: the
    data buffer sliced to the array's offset span (binary arrays store
    values back-to-back; b''.join(to_pylist()) materializes one Python
    bytes object PER ROW — measured as a top cost of the merge stage)."""
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=np.int32, count=len(arr) + 1,
                         offset=arr.offset * 4)
    return memoryview(bufs[2])[int(offs[0]):int(offs[-1])]


def merge_partials_to_segments(partials: DataFrame, avgdl: float,
                               codec: str = "varint",
                               block_size: int = BLOCK_SIZE,
                               num_partitions: int | None = None,
                               bucket_partition: bool = False
                               ) -> DataFrame:
    """Stage B2: shuffle compressed partials by (term, salt), merge each
    group's sorted runs, and emit final block rows.

    THE big exchange of the build (SURVEY §3.2 stage B) — but it now moves
    partials, not postings. The merge kernel is fully vectorized across
    groups in a flush buffer: one varint decode over the concatenated
    stream, segmented-cumsum reconstruction of absolute doc ids, one
    integer lexsort, then kernels.blocks.encode_groups_core.

    Physical-shape notes (each alternative was measured):
    * groupBy().applyInPandas dispatches Python per group (~2 ms each) —
      fatal at vocab × ranges groups;
    * mapInPandas materializes terms as Python str objects; mapInArrow
      keeps them Arrow end-to-end (boundaries via pc.not_equal, output
      terms via take).
    Arrow batches can split a group, so flushes defer the trailing
    (possibly incomplete) group; groups never span partitions (hash
    partitioning), so the end-of-partition flush is exact.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    spark = partials.sparkSession
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    # r6 (guide §2.2/§6 + event-log evidence): two partitioning regimes.
    # SMALL merges (estimated work ≲ a few tasks) used to run 1-2 fat
    # tasks — each touching ALL n_buckets dirs — so the stage serialized
    # ~the whole merge on one core AND wrote tasks x buckets files.
    # Hashing on the term's BUCKET instead gives up to n_buckets-way
    # parallelism while writing EXACTLY ONE file per bucket dir (a
    # bucket's terms cannot split across tasks). The (term, salt)
    # grouping invariant holds a fortiori: bucket is a function of term.
    # BIG merges keep the full-width (term, salt) hash — bucket hashing
    # would cap parallelism at n_buckets and expose per-bucket skew, and
    # at that scale per-file open cost is amortized anyway. The caller
    # picks the regime from its data-size estimate (bucket_partition).
    if bucket_partition:
        dt = (partials
              .repartition(n_part, term_bucket_col(F.col("term")))
              .sortWithinPartitions("term", "salt"))
    else:
        dt = (partials
              .repartition(n_part, "term", "salt")
              .sortWithinPartitions("term", "salt"))

    out_type = to_arrow_segment_schema()
    flush_postings = 1 << 21      # ≈2M postings per kernel call

    def merge_table(tbl: pa.Table) -> pa.RecordBatch:
        n_rows = tbl.num_rows
        term = tbl.column("term").combine_chunks()
        salts = tbl.column("salt").to_numpy()
        counts = tbl.column("n").to_numpy().astype(np.int64)
        # group id per partial row
        row_new = np.empty(n_rows, dtype=bool)
        row_new[0] = True
        if n_rows > 1:
            neq = pc.not_equal(term.slice(1), term.slice(0, n_rows - 1))
            row_new[1:] = (neq.to_numpy(zero_copy_only=False)
                           | (salts[1:] != salts[:-1]))
        row_gid = np.cumsum(row_new) - 1
        # one decode over the concatenated streams (varint self-delimits);
        # concatenation is a zero-copy buffer slice, not a per-row join
        deltas = varint_decode(_binary_concat(
            tbl.column("docids_blob").combine_chunks()))
        tfs = varint_decode(_binary_concat(
            tbl.column("tfs_blob").combine_chunks())).astype(np.int64)
        dls = varint_decode(_binary_concat(
            tbl.column("dls_blob").combine_chunks())).astype(np.int64)
        # segmented cumsum -> absolute doc ids per partial run
        ends = np.cumsum(counts)
        starts = ends - counts
        g = np.cumsum(deltas, dtype=np.uint64)
        base = np.zeros(len(counts), dtype=np.uint64)
        base[1:] = g[ends[:-1] - 1]
        ids = (g - np.repeat(base, counts)).astype(np.int64)
        gid = np.repeat(row_gid, counts)
        row_of = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
        order = np.lexsort((ids, gid))
        ids, tfs, dls = ids[order], tfs[order], dls[order]
        gid_s, row_s = gid[order], row_of[order]
        new_group = np.empty(ids.size, dtype=bool)
        new_group[0] = True
        new_group[1:] = gid_s[1:] != gid_s[:-1]
        bstart, cols = encode_groups_core(new_group, ids, tfs, dls, avgdl,
                                          block_size=block_size, codec=codec,
                                          pa_blobs=True)
        arrays = [pc.take(term, pa.array(row_s[bstart])),
                  pa.array(salts[row_s[bstart]], pa.int64()),
                  pa.array(cols["block_id"], pa.int32()),
                  pa.array(cols["first_doc_id"], pa.int64()),
                  pa.array(cols["max_doc_id"], pa.int64()),
                  pa.array(cols["n_docs"], pa.int32()),
                  pa.array(cols["max_tf"], pa.int32()),
                  pa.array(cols["sum_tf"], pa.int64()),
                  pa.array(cols["block_max_tfpart"], pa.float64()),
                  cols["docids_blob"],
                  cols["tfs_blob"],
                  cols["dls_blob"]]
        return pa.RecordBatch.from_arrays(arrays, schema=out_type)

    def cut_point(tbl: pa.Table) -> int:
        """Index of the first row of the trailing (term, salt) group."""
        n = tbl.num_rows
        term = tbl.column("term")
        salts = tbl.column("salt")
        in_last = pc.and_(pc.equal(term, term[n - 1]),
                          pc.equal(salts, salts[n - 1])).to_numpy(
            zero_copy_only=False)
        before = np.flatnonzero(~in_last)
        return int(before[-1]) + 1 if before.size else 0

    def merge_stream(batches):
        buf: list[pa.RecordBatch] = []
        nposts = 0
        t_kernel, n_done = 0.0, 0
        for rb in batches:
            if rb.num_rows:
                buf.append(rb)
                nposts += int(pa.Table.from_batches([rb]).column("n")
                              .to_numpy().sum())
            if nposts < flush_postings:
                continue
            t0 = time.monotonic() if _PROF else 0.0
            whole = pa.Table.from_batches(buf).combine_chunks()
            cut = cut_point(whole)
            out = merge_table(whole.slice(0, cut)) if cut else None
            carry = whole.slice(cut)
            buf = carry.to_batches() if carry.num_rows else []
            nposts = (int(carry.column("n").to_numpy().sum())
                      if carry.num_rows else 0)
            if _PROF:
                t_kernel += time.monotonic() - t0
                n_done += nposts
            if out is not None:
                yield out
        if buf:
            t0 = time.monotonic() if _PROF else 0.0
            out = merge_table(pa.Table.from_batches(buf).combine_chunks())
            if _PROF:
                t_kernel += time.monotonic() - t0
            yield out
        if _PROF:
            _prof_write("b2", t_kernel, n_done)

    return dt.mapInArrow(merge_stream, SEGMENT_SCHEMA)


def build_segments(doc_terms: DataFrame, avgdl: float, range_size: int,
                   codec: str = "varint", block_size: int = BLOCK_SIZE,
                   num_partitions: int | None = None) -> DataFrame:
    """Single-stage build from EXPLODED (doc_id, dl, term, tf) rows —
    retained for the streaming path and as the simple reference
    implementation; the batch build uses build_partial_postings +
    merge_partials_to_segments (10x less shuffle)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from pyspark.sql.pandas.types import to_arrow_schema

    spark = doc_terms.sparkSession
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    dt = (doc_terms
          .withColumn("salt", F.expr(f"doc_id DIV {range_size}"))
          .repartition(n_part, "term", "salt")
          .sortWithinPartitions("term", "salt", "doc_id"))

    out_type = to_arrow_schema(SEGMENT_SCHEMA)
    flush_rows = 1 << 18

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
            avgdl, block_size=block_size, codec=codec, pa_blobs=True)
        arrays = [pc.take(term, pa.array(bstart)),
                  pa.array(salts[bstart], pa.int64()),
                  pa.array(cols["block_id"], pa.int32()),
                  pa.array(cols["first_doc_id"], pa.int64()),
                  pa.array(cols["max_doc_id"], pa.int64()),
                  pa.array(cols["n_docs"], pa.int32()),
                  pa.array(cols["max_tf"], pa.int32()),
                  pa.array(cols["sum_tf"], pa.int64()),
                  pa.array(cols["block_max_tfpart"], pa.float64()),
                  cols["docids_blob"],
                  cols["tfs_blob"],
                  cols["dls_blob"]]
        return pa.RecordBatch.from_arrays(arrays, schema=out_type)

    def cut_point(tbl: pa.Table) -> int:
        n = tbl.num_rows
        term = tbl.column("term")
        salts = tbl.column("salt")
        in_last = pc.and_(pc.equal(term, term[n - 1]),
                          pc.equal(salts, salts[n - 1])).to_numpy(
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


def merge_segments(segments: DataFrame,
                   n_buckets: int = N_BUCKETS) -> DataFrame:
    """Op 23: merge per-salt runs into the global per-term posting list.

    Doc-range salts are contiguous, disjoint and ordered, so the merged
    global list for a term IS the ordered union of its blocks by
    (salt, block_id) — a sort key, not a re-encode. The only physical work
    is stamping the bucket (partition-pruning) column; block payloads are
    untouched and the result is invariant to build chunking / input order /
    parallelism (BASELINE.md index determinism). A legacy-style merge that
    re-encodes overlapping runs is deliberately unnecessary by construction.
    """
    return segments.withColumn("bucket",
                               term_bucket_col(F.col("term"), n_buckets))


def dictionary_from_segments(segments: DataFrame,
                             n_buckets: int = N_BUCKETS) -> DataFrame:
    """Term dictionary (df, cf, n_blocks, max tf-part) aggregated from block
    metadata — block-granular, no second pass over postings.

    ``n_buckets``: the INDEX'S bucket count — epoch writers must pass
    the value from meta, not rely on the config default (a changed
    constant would route new postings into dirs readers never probe)."""
    return (segments.groupBy("term")
            .agg(F.sum("n_docs").alias("df"),
                 F.sum("sum_tf").alias("cf"),
                 F.count("*").cast("int").alias("n_blocks"),
                 F.max("block_max_tfpart").alias("max_tfpart"))
            .withColumn("bucket",
                        term_bucket_col(F.col("term"), n_buckets)))


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
