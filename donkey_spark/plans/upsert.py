"""Document upsert — replace-by-key, completing the index CRUD story
(build → stream-append → delete → UPDATE).

Donkey rebuilds its database to change a document `[donkey:reindex —
unverified, SURVEY §0]`; Lucene-lineage engines instead model an update
as delete-old + add-new between merges. This module takes the Lucene
shape, composed ENTIRELY from the engine's existing primitives:

* the new versions are appended as one stream-style epoch
  (streaming/ingest._append_epoch — O(batch) cost, idempotent,
  facet-preserving, and on positional v3 indexes it writes the
  epoch's positions chunk too, so upserted docs answer phrase
  queries immediately);
* every LIVE older version of an upserted (repo, path) is then
  tombstoned by key (plans/delete.py — frozen-stats semantics until
  the next compact_index reclaims).

Version identity is the ``commit`` column: a row whose full
(repo, path, commit) triple is already in the index is assumed
identical and skipped — changed content MUST come with a new commit
(the corpus contract: content is a function of the triple, enforced
corpus-wide by check_sha256). That skip is what makes retries converge:

  crash after append, before tombstone  → both versions visible;
  re-running the same upsert skips the append (triples present) and
  completes the tombstone — exactly-once by replay, the same recipe
  as the streaming manifest journal.

Ordering of the two steps is deliberate: append THEN tombstone means a
torn upsert shows a duplicate (old + new both ranked) rather than a
vanished document — the recoverable failure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: the replace key — versions of the same file share it
_FILE_KEY = ["repo", "path"]
_VERSION_KEY = ["repo", "path", "commit"]


def upsert_docs(spark: SparkSession, index_dir: str,
                new_docs: DataFrame) -> dict:
    """Replace documents by (repo, path). ``new_docs`` is corpus-schema
    (repo, path, commit, lang, content), one row per file. Returns
    {"n_appended", "n_tombstones", "epoch"}: rows newly appended, the
    index's TOTAL tombstone count after the call (delete_docs contract),
    and the epoch id used (None when every row was already applied).

    After an upsert, queries see exactly the new versions; corpus-wide
    stats stay frozen (tombstone contract) until compact_index. The
    target must be an existing chunk-layout index (positional v3
    included — the epoch writes its positions chunk; only the early
    flat positions layout is refused, matching streaming ingest).
    """
    from ..fsutil import fs_exists
    from ..streaming.ingest import _append_epoch
    from .delete import delete_docs
    if not fs_exists(spark, f"{index_dir}/meta"):
        raise ValueError(f"{index_dir} is not an index (no meta) — "
                         f"build_index first; upsert only updates")
    m = spark.read.parquet(f"{index_dir}/meta").collect()[0].asDict()

    new_docs = new_docs.select("repo", "path", "commit", "lang", "content")
    dup = (new_docs.groupBy(*_FILE_KEY).count()
           .where(F.col("count") > 1).limit(5).collect())
    if dup:
        raise ValueError(
            "upsert_docs: multiple rows per (repo, path) — each would "
            "tombstone the other; first offenders: "
            + ", ".join(f"({r['repo']}, {r['path']})" for r in dup))

    docs = spark.read.parquet(f"{index_dir}/docs")
    # idempotent replay: rows whose version triple is already indexed
    # were applied by a previous (possibly torn) run of this upsert
    fresh = new_docs.join(
        docs.select(*_VERSION_KEY), _VERSION_KEY, "left_anti").persist()
    n_new = fresh.count()
    epoch = None
    if n_new:
        epoch = 0
        if fs_exists(spark, f"{index_dir}/manifest_stream"):
            prev = (spark.read.parquet(f"{index_dir}/manifest_stream")
                    .agg(F.max("epoch")).collect()[0][0])
            epoch = int(prev) + 1 if prev is not None else 0
        _append_epoch(fresh, epoch, index_dir,
                      codec=m["codec"], block_size=int(m["block_size"]))
    fresh.unpersist()

    # tombstone every older version of an upserted file — computed from
    # the FULL new_docs (not `fresh`), so a replay whose append was
    # already committed still finishes the delete half
    old = (docs.alias("d")
           .join(new_docs.select(*_FILE_KEY, "commit").alias("n"),
                 _FILE_KEY)
           .where(F.col("d.commit") != F.col("n.commit"))
           .select(*[F.col(f"d.{c}").alias(c) for c in _VERSION_KEY]))
    n_tomb = delete_docs(spark, index_dir, old) if not old.isEmpty() else 0
    return {"n_appended": int(n_new), "n_tombstones": int(n_tomb),
            "epoch": epoch}
