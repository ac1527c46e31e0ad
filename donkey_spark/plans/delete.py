"""Document deletion — tombstones with compact-time reclamation.

Donkey mutates its corpus through inserts + periodic `reindex`
`[donkey:src/donkey.cpp — unverified, SURVEY §0]`; deletion here follows
the same shape Lucene uses between merges: a tombstone set makes doc ids
INVISIBLE to every query immediately (they can neither rank nor inflate
the scorer's θ / block potentials), while posting blocks, df and avgdl
stay frozen until ``streaming.compact_index`` rebuilds without the
tombstoned documents and clears the set. This is the decontamination
primitive a training-data pipeline needs: drop poisoned/benchmark-leaked
documents from retrieval NOW, reclaim space on the next compaction.

Scale note: the tombstone set between compactions is assumed
driver-manageable (10^8 ids ≈ 800 MB) — the same regime Lucene's
live-docs bitmaps assume per segment. Each scoring task receives only
the set once (closure broadcast) and slices its own range by
searchsorted, so per-range cost is O(|dead ∩ range|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def delete_docs(spark: SparkSession, index_dir: str,
                doc_ids: DataFrame | list[int]) -> int:
    """Add doc ids to the index's tombstone set (idempotent union —
    re-deleting is a no-op). Returns the new tombstone count."""
    from ..fsutil import fs_exists
    if not isinstance(doc_ids, DataFrame):
        doc_ids = spark.createDataFrame([(int(d),) for d in doc_ids],
                                        "doc_id long")
    new = doc_ids.select(F.col("doc_id").cast("long").alias("doc_id"))
    tomb_dir = f"{index_dir}/tombstones"
    if fs_exists(spark, tomb_dir):
        new = new.unionByName(spark.read.parquet(tomb_dir))
    merged = new.distinct()
    # write-then-swap would need a rename; a plain overwrite is safe here
    # because a torn write only UNDER-deletes until the retry, never
    # corrupts the index itself
    merged.persist()
    n = merged.count()
    merged.coalesce(1).write.mode("overwrite").parquet(tomb_dir)
    merged.unpersist()
    return int(n)


def load_tombstones(spark: SparkSession, index_dir: str):
    """Sorted int64 numpy array of tombstoned doc ids ([] if none)."""
    import numpy as np
    from ..fsutil import fs_exists
    tomb_dir = f"{index_dir}/tombstones"
    if not fs_exists(spark, tomb_dir):
        return np.empty(0, dtype=np.int64)
    ids = np.array([r["doc_id"] for r in
                    spark.read.parquet(tomb_dir).collect()], dtype=np.int64)
    ids.sort()
    return ids
