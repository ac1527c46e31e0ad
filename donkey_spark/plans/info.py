"""Index introspection — the ops report every serving engine exposes
(donkey prints db stats on load `[donkey:src — unverified, SURVEY §0]`;
the Lucene lineage has _stats / CheckIndex). One bounded call answers
"what is this index": format/stats from meta, per-table bytes and chunk
layout from FS listings, tombstone count, and the journal breakdown by
writer (stream epochs / upserts / facet backfills).

Cost shape: meta + journal reads are O(1)/O(epochs) tiny parquet reads;
sizes come from getContentSummary (namenode-side on HDFS, a file walk
locally); NOTHING touches postings — safe against a 100 TB index.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def index_info(spark: SparkSession, index_dir: str) -> dict:
    """A JSON-serializable report over an index directory."""
    from ..fsutil import chunk_dirs, fs_exists, hadoop_fs
    from ..streaming.ingest import (active_dictionary_chunks,
                                    dictionary_chunks, journal_df,
                                    split_facets)
    if not fs_exists(spark, f"{index_dir}/meta"):
        raise ValueError(f"{index_dir} is not an index (no meta)")
    m = spark.read.parquet(f"{index_dir}/meta").collect()[0].asDict()
    from .positions import POSITIONS_VERSION
    out = {
        "index_dir": index_dir,
        "version": int(m.get("version", 0)),
        "positions": int(m.get("version", 0)) >= POSITIONS_VERSION,
        "n_docs": int(m["n_docs"]),
        "avgdl": float(m["avgdl"]),
        "n_postings": int(m["n_postings"]),
        "range_size": int(m["range_size"]),
        "block_size": int(m["block_size"]),
        "codec": m["codec"],
        "n_buckets": int(m["n_buckets"]),
        "facets": list(split_facets(m, "facets")),
        "range_facets": list(split_facets(m, "range_facets")),
    }

    tables = {}
    for tbl in ("docs", "segments", "dictionary", "positions",
                "manifest", "manifest_stream", "tombstones"):
        d = f"{index_dir}/{tbl}"
        if not fs_exists(spark, d):
            continue
        fs, p = hadoop_fs(spark, d)
        s = fs.getContentSummary(p)
        entry = {"bytes": int(s.getLength()),
                 "files": int(s.getFileCount())}
        chunks = chunk_dirs(spark, d)
        if chunks:
            entry["n_chunks"] = len(chunks)
        tables[tbl] = entry
    out["tables"] = tables

    dchunks = dictionary_chunks(spark, index_dir)
    if dchunks:
        active = set(active_dictionary_chunks(dchunks))
        out["dictionary_chunks"] = {
            "active": sorted(active),
            # superseded by a merge, awaiting the next call's GC
            "superseded": sorted(set(dchunks) - active),
        }

    j = journal_df(spark, index_dir)
    if j is not None:
        rows = j.select("epoch", "status").collect()
        out["journal"] = {
            # classify by the status each writer stamps — epoch parity
            # alone misreads legacy facet rows at even negatives (and
            # legacy upserts, stamped "stream" at positive epochs, are
            # indistinguishable from stream epochs by design)
            "stream_epochs": sum(1 for r in rows
                                 if str(r["status"]) == "stream"),
            "upserts": sum(1 for r in rows
                           if str(r["status"]) == "upsert"),
            # both kinds: equality (facet:<col>) and range (rfacet:<col>)
            "facet_backfills": sum(
                1 for r in rows
                if str(r["status"]).startswith(("facet:", "rfacet:"))),
        }

    from .delete import tombstone_keys
    t = tombstone_keys(spark, index_dir)
    out["n_tombstones"] = int(t.count()) if t is not None else 0
    return out
