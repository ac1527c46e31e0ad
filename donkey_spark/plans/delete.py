"""Document deletion — tombstones with compact-time reclamation.

Donkey mutates its corpus through inserts + periodic `reindex`
`[donkey:src/donkey.cpp — unverified, SURVEY §0]`; deletion here follows
the same shape Lucene uses between merges: a tombstone set makes
documents INVISIBLE to every query immediately (they can neither rank
nor inflate the scorer's θ / block potentials), while posting blocks,
df and avgdl stay frozen until ``streaming.compact_index`` rebuilds
without the tombstoned documents. This is the decontamination primitive
a training-data pipeline needs: drop poisoned/benchmark-leaked documents
from retrieval NOW, reclaim space on the next compaction.

Durability design:

* Tombstones store the corpus PRIMARY KEYS (repo, path, commit), not doc
  ids — ids are index-generation-specific, so a key set stays correct
  across rebuilds: after a compact the keys simply resolve to no ids,
  and a crash anywhere in the compact can never remap a tombstone onto
  a different live document. Each Index resolves keys → current doc ids
  once at construction (one bounded semi-join against the docs table).
* The set is committed by write-to-staging + atomic rename, so a torn
  write can never lose previously committed tombstones; the reader
  falls back to the staging dir if a crash landed between delete and
  rename (the staging copy is always the full merged set).

Scale note: the tombstone set between compactions is assumed
driver-manageable (10^8 ids ≈ 800 MB resolved) — the live-docs-bitmap
regime Lucene assumes per segment. The resolved id array ships to
executors once per Index via a Spark broadcast; each scoring task
slices its own range by searchsorted — O(|dead ∩ range|) per range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_KEY_COLS = ["repo", "path", "commit"]


def _dirs(index_dir: str) -> tuple[str, str]:
    return f"{index_dir}/tombstones", f"{index_dir}/tombstones_staging"


def _restore_swap_invariant(spark: SparkSession, index_dir: str) -> None:
    """If a prior swap crashed between delete and rename, the committed
    set lives ONLY in staging — promote it back before anything may
    overwrite staging (shared by every tombstone writer)."""
    from ..fsutil import fs_exists, hadoop_fs
    tomb_dir, staging = _dirs(index_dir)
    fs, tpath = hadoop_fs(spark, tomb_dir)
    _, spath = hadoop_fs(spark, staging)
    if not fs_exists(spark, tomb_dir) and fs_exists(spark, staging):
        if not fs.rename(spath, tpath):
            raise IOError(f"could not promote {staging} to {tomb_dir}")


def _commit_swap(spark: SparkSession, index_dir: str, keys: DataFrame,
                 n: int | None = None) -> None:
    """Commit a FULL key set: write to staging, delete the old dir,
    rename staging in. A torn staging write leaves the committed set
    untouched; a crash between delete and rename is covered by the
    reader's staging fallback (re-promoted by _restore_swap_invariant
    on the next writer). One file keeps small sets tidy; past ~5M keys
    the single write task would serialize the commit, so large sets
    fan out in ~5M-key files (ceil division — a 9M-key set gets 2
    files, not the single task floor division gave it)."""
    from ..fsutil import fs_exists, hadoop_fs
    tomb_dir, staging = _dirs(index_dir)
    fs, tpath = hadoop_fs(spark, tomb_dir)
    _, spath = hadoop_fs(spark, staging)
    nparts = max(1, -(-int(n) // 5_000_000)) if n else 1
    (keys.coalesce(1) if nparts == 1 else keys.repartition(nparts)) \
        .write.mode("overwrite").parquet(staging)
    if fs_exists(spark, tomb_dir) and not fs.delete(tpath, True):
        raise IOError(f"could not clear {tomb_dir} for the swap")
    if not fs.rename(spath, tpath):
        raise IOError(f"tombstone swap failed: rename {staging} -> "
                      f"{tomb_dir} returned false; the full set is "
                      f"intact in {staging} (reader falls back to it)")


def delete_docs(spark: SparkSession, index_dir: str,
                docs: DataFrame | list[int]) -> int:
    """Tombstone documents (idempotent union — re-deleting is a no-op).

    ``docs``: a DataFrame with either the key columns (repo, path,
    commit) or a doc_id column (resolved to keys through the index's
    docs table), or a plain list of doc ids. Returns the new tombstone
    count."""
    if not isinstance(docs, DataFrame):
        docs = spark.createDataFrame([(int(d),) for d in docs],
                                     "doc_id long")
    if "doc_id" in docs.columns and not set(_KEY_COLS) <= set(docs.columns):
        docs = (spark.read.parquet(f"{index_dir}/docs")
                .join(docs.select("doc_id"), "doc_id"))
    new = docs.select(*_KEY_COLS)
    _restore_swap_invariant(spark, index_dir)
    existing = _read_tombstone_keys(spark, index_dir)
    if existing is not None:
        new = new.unionByName(existing)
    merged = new.distinct().persist()
    n = merged.count()
    _commit_swap(spark, index_dir, merged, n)
    merged.unpersist()
    return int(n)


def delete_by_query(spark: SparkSession, index_dir: str, text: str,
                    mode: str = "or",
                    filters: dict | None = None) -> int:
    """Tombstone EVERY document matching a query — the takedown /
    GDPR-erasure shape ("remove everything mentioning X", optionally
    under facet/range filters). Match semantics are exactly search's
    (or/and modes — and mode="pattern", where prefix/fuzzy/wildcard/
    regexp atoms expand against the dictionary first: "delete
    everything matching /v[0-9]+_tmp/" — the full filter grammar,
    already-tombstoned docs unaffected), computed by the same
    per-salt kernel the total-hits
    count uses (plans/facet_counts.match_ids): the match set flows as
    a DISTRIBUTED (doc_id) DataFrame into the ordinary key-resolving
    delete — ids never gather on the driver. Idempotent like every
    delete; returns the new tombstone count."""
    from .facet_counts import match_ids
    from .query import Index
    ids = match_ids(Index(spark, index_dir), text, mode=mode,
                    filters=filters)
    return delete_docs(spark, index_dir, ids)


def revive_docs(spark: SparkSession, index_dir: str,
                docs: DataFrame) -> int:
    """Remove keys from the tombstone set — the delete inverse: docs
    matching (repo, path, commit) become visible again (idempotent;
    keys not in the set are ignored). Returns the remaining tombstone
    count. The caller that needs this is upsert_docs: re-upserting a
    previously REPLACED version (a revert to an old commit) finds the
    triple already present in docs but tombstoned — without revival the
    replay-skip leaves it dead while the delete half kills the current
    version too, and the document vanishes from every query (r5 third
    review)."""
    _restore_swap_invariant(spark, index_dir)
    existing = _read_tombstone_keys(spark, index_dir)
    if existing is None:
        return 0
    n_before = existing.count()
    keep = existing.join(docs.select(*_KEY_COLS), _KEY_COLS,
                         "left_anti").persist()
    n = keep.count()
    if n != n_before:       # rewrite only when something actually revived
        _commit_swap(spark, index_dir, keep, n)
    keep.unpersist()
    return int(n)


def _read_tombstone_keys(spark: SparkSession,
                         index_dir: str) -> DataFrame | None:
    """The committed key set (staging fallback covers a crashed swap).
    A set written by the pre-r3 doc_id format migrates transparently by
    resolving the ids through the docs table."""
    from ..fsutil import fs_exists
    tomb_dir, staging = _dirs(index_dir)
    for d in (tomb_dir, staging):
        if fs_exists(spark, d):
            t = spark.read.parquet(d)
            if not set(_KEY_COLS) <= set(t.columns):
                t = (spark.read.parquet(f"{index_dir}/docs")
                     .join(t.select("doc_id"), "doc_id"))
            return t.select(*_KEY_COLS)
    return None


def tombstone_keys(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """Public reader (compact_index's reclamation input)."""
    return _read_tombstone_keys(spark, index_dir)


def migrate_legacy_tombstones(spark: SparkSession, index_dir: str) -> None:
    """Rewrite a legacy (pre-r3, doc_id-only) tombstone set in the key
    format, resolving ids through the CURRENT docs table.

    MUST run before a fresh rebuild reassigns doc ids: ids are
    index-generation-specific, so an id-format set surviving into a
    rebuilt index would resolve against the NEW docs table and silently
    hide arbitrary wrong documents. (Key-format sets are what make
    tombstones rebuild-safe in the first place; this is the one-time
    on-ramp for old indexes — build_index calls it on every fresh
    build, where it is a no-op unless an id-format set exists.)"""
    from ..fsutil import fs_exists
    tomb_dir, _staging = _dirs(index_dir)
    # promote a staging-only committed set FIRST: the rewrite below
    # overwrites staging, and a crash mid-overwrite must never destroy
    # the only copy of the set
    _restore_swap_invariant(spark, index_dir)
    if not fs_exists(spark, tomb_dir):
        return
    src = tomb_dir
    t = spark.read.parquet(src)
    if set(_KEY_COLS) <= set(t.columns):
        return                              # already key-format
    if not fs_exists(spark, f"{index_dir}/docs"):
        raise ValueError(
            f"{src} holds a legacy doc_id-format tombstone set but "
            f"{index_dir}/docs is missing, so the ids cannot be resolved "
            f"to keys; clear the set manually before rebuilding")
    # bounded (the legacy format predates the large-set support) —
    # collect so the rewrite never holds a lazy plan over the dirs it
    # replaces
    rows = (spark.read.parquet(f"{index_dir}/docs")
            .join(t.select("doc_id"), "doc_id")
            .select(*_KEY_COLS).distinct().collect())
    keys = spark.createDataFrame(
        rows or [], "repo string, path string, commit string")
    _commit_swap(spark, index_dir, keys)


def clear_tombstones(spark: SparkSession, index_dir: str) -> None:
    from ..fsutil import fs_exists, hadoop_fs
    for d in _dirs(index_dir):
        if fs_exists(spark, d):
            fs, p = hadoop_fs(spark, d)
            fs.delete(p, True)


def load_tombstones(spark: SparkSession, index_dir: str):
    """Sorted int64 numpy array of the CURRENT index's tombstoned doc
    ids ([] if none): keys resolved through the docs table, so a set
    surviving a rebuild yields exactly the ids that still exist."""
    import numpy as np
    keys = _read_tombstone_keys(spark, index_dir)
    if keys is None:
        return np.empty(0, dtype=np.int64)
    ids = (spark.read.parquet(f"{index_dir}/docs")
           .join(keys, _KEY_COLS)
           .select("doc_id").toPandas()["doc_id"]
           .to_numpy(dtype=np.int64))
    ids.sort()
    return ids
