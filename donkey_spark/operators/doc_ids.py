"""Op 9 — deterministic dense doc_id assignment (SURVEY §2.2).

Donkey maps object keys to internal ids at insert `[donkey:src/donkey.cpp —
unverified, SURVEY §0]`; here ids must additionally be **dense and globally
reproducible** (0..N-1 in `(repo, path, commit)` order) because they feed
delta-encoded postings, the doc-range salt, and the rank tie-break.

NOT `monotonically_increasing_id` (partition-layout-dependent). Two-phase,
no single-partition global sort:

  1. range-repartition + sort-within-partitions by the key, persist;
  2. count rows per partition (job 1), prefix-sum the counts on the driver
     (tiny — one int per partition), then a narrow mapInPandas adds
     `offset[pid] + local_rank` (job 2 over the SAME persisted partitions,
     so the sampled range boundaries cannot shift between jobs).

Scale: the only full shuffle is the range partition; the offset table is
O(partitions). The small-scale oracle is `row_number() OVER (ORDER BY keys)`.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark import StorageLevel


def assign_doc_ids(df: DataFrame, keys: tuple[str, ...] = ("repo", "path",
                                                           "commit"),
                   num_partitions: int | None = None,
                   return_count: bool = False,
                   dedupe: bool = False):
    """Add a dense long `doc_id` = global rank by `keys` (0-based).

    With return_count=True also returns the total row count (free — it is
    the sum of the per-partition counts the two-phase pass computes anyway),
    which callers use for duplicate detection without an extra shuffle.

    With dedupe=True the input may contain repeated keys: the range
    partition co-locates equal keys, so the per-partition pass drops the
    repeats (adjacent after the sort) and ranks the distinct keys — the
    whole distinct+count+assign runs on ONE shuffle instead of a hash
    `distinct()` exchange followed by the range exchange. Returns
    (ids, n_distinct_keys, n_input_rows)."""
    spark = df.sparkSession
    if num_partitions:
        n_part = num_partitions
    else:
        # r6: derive the range width from the INPUT's split count, not
        # the core count — a small corpus arriving in 1-2 scan splits
        # pays 3 jobs of 32-task scheduling for a 50k-row sort
        # otherwise (measured ~0.3s/job at local[32]). 4x the splits
        # (keys are narrow; a split's keys sort comfortably even when
        # its content is a fat unsplittable file), floor 8, capped at
        # the session parallelism — at cluster scale splits >= cores
        # and this stays exactly defaultParallelism.
        par = spark.sparkContext.defaultParallelism
        n_part = min(par, max(8, df.rdd.getNumPartitions() * 4))
    part = (df.repartitionByRange(n_part, *[F.col(k) for k in keys])
              .sortWithinPartitions(*keys)
              .withColumn("_pid", F.spark_partition_id())
              .persist(StorageLevel.MEMORY_AND_DISK))
    aggs = [F.count("*").alias("cnt")]
    if dedupe:
        # count_distinct over the BARE columns would drop rows where any key
        # is NULL, while the pandas drop_duplicates pass still emits one row
        # per NULL-keyed group — offsets would understate and doc_id ranges
        # overlap. A struct is itself non-null and groups nulls null-safely,
        # matching drop_duplicates exactly.
        aggs.append(
            F.count_distinct(F.struct(*[F.col(k) for k in keys])).alias("dk"))
    crows = part.groupBy("_pid").agg(*aggs).collect()
    counts = {r["_pid"]: (r["dk"] if dedupe else r["cnt"]) for r in crows}
    n_rows = sum(r["cnt"] for r in crows)
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    b_off = spark.sparkContext.broadcast(offsets)

    out_schema = part.drop("_pid").schema.add("doc_id", "long", False)
    key_list = list(keys)

    def add_ids(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen = 0
        last_key = None                 # dedupe across Arrow batch edges
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["_pid"].iloc[0])
            out = pdf.drop(columns=["_pid"])
            if dedupe:
                out = out.drop_duplicates(subset=key_list)
                if last_key is not None and len(out) and \
                        tuple(out.iloc[0][key_list]) == last_key:
                    out = out.iloc[1:]
                if len(out) == 0:
                    continue
                last_key = tuple(out.iloc[-1][key_list])
            start = b_off.value[pid] + seen                 # sorted in part
            seen += len(out)
            out = out.copy()
            out["doc_id"] = range(start, start + len(out))
            yield out

    result = part.mapInPandas(add_ids, schema=out_schema)
    # the persisted range-partitioned source backs every consumption of
    # `result`; callers that know when they are done with the ids can
    # release it (build_index does at finalize — r6: one build leaked
    # one cached copy of the key frame per invocation before)
    result._donkey_source_cache = part
    if dedupe:
        return result, acc, n_rows
    return (result, acc) if return_count else result
