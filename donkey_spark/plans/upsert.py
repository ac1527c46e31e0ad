"""Document upsert — replace-by-key, completing the index CRUD story
(build → stream-append → delete → UPDATE).

Donkey rebuilds its database to change a document `[donkey:reindex —
unverified, SURVEY §0]`; Lucene-lineage engines instead model an update
as delete-old + add-new between merges. This module takes the Lucene
shape, composed ENTIRELY from the engine's existing primitives:

* the new versions are appended as one stream-style epoch
  (streaming/ingest._append_epoch — O(batch) cost, facet-preserving,
  and on positional v3 indexes it writes the epoch's positions chunk
  too, so upserted docs answer phrase queries immediately);
* every LIVE older version of an upserted (repo, path) is then
  tombstoned by key (plans/delete.py — frozen-stats semantics until
  the next compact_index reclaims).

Version identity is the ``commit`` column: a row whose full
(repo, path, commit) triple is already in the index is assumed
identical and skipped — changed content MUST come with a new commit
(the corpus contract: content is a function of the triple, enforced
corpus-wide by check_sha256).

Epoch identity (r5 review — two crash/concurrency findings): upsert
epochs do NOT share the stream<e> namespace. A paused stream's
checkpoint holds its own batch counter, so "max journal epoch + 1"
could collide with the stream's NEXT micro-batch id, whose epoch-keyed
overwrite would then silently replace the upserted documents. Instead
an upsert writes ``chunk=u<k>`` dirs (k = 1 + highest existing u-chunk,
read from the docs table's directory listing) journaled at epoch
``−2k`` — even negatives; facet backfills (plans/add_facet.py) take the
odd negatives, stream checkpoints the non-negatives. No writer can
collide with another by construction.

Replay convergence: the manifest_stream journal row is the COMMIT
POINT of the append (it is written after the segments/docs/dictionary/
positions chunks). A re-run first garbage-collects any u-chunk whose
journal row never landed (a torn append — its half-written chunks and
to-be-reused doc ids must not survive), then re-applies exactly the
rows whose triples are missing from the (committed) docs table, and
finally reconciles the meta file from base + journal (covering a crash
between the journal write and the meta write). The append-then-
tombstone order makes every torn state visible as a duplicate — never
a vanished document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: the replace key — versions of the same file share it
_FILE_KEY = ["repo", "path"]
_VERSION_KEY = ["repo", "path", "commit"]

#: tables that carry per-chunk dirs an upsert epoch writes
_CHUNKED_TABLES = ("docs", "segments", "dictionary", "positions")


def _upsert_epoch(k: int) -> int:
    """Journal epoch of upsert chunk u<k> — the even negatives (facet
    backfill rows are odd negatives, stream epochs non-negative)."""
    return -2 * k


def _gc_torn_chunks(spark: SparkSession, index_dir: str,
                    upsert_epochs: set[int]) -> list[str]:
    """Delete every u<k> chunk dir whose journal row never committed —
    a torn previous upsert. Its docs rows would otherwise (a) make the
    replay skip the append forever and (b) collide with the doc ids the
    redo will assign (the torn chunk is invisible to id allocation
    precisely because it is unjournaled). ``upsert_epochs`` must hold
    only the epochs whose journal row carries status == "upsert" — a
    legacy facet-backfill row parked at the same even negative does NOT
    commit a u-chunk (second review: epoch membership alone would have
    kept a torn chunk alive behind such a row, leaving its documents in
    docs but never in segments — present yet unsearchable, forever)."""
    from ..fsutil import chunk_dirs, fs_exists, hadoop_fs
    from ..streaming.ingest import _is_upsert_chunk
    torn = [c for c in chunk_dirs(spark, f"{index_dir}/docs")
            if _is_upsert_chunk(c)
            and _upsert_epoch(int(c[1:])) not in upsert_epochs]
    for c in torn:
        for tbl in _CHUNKED_TABLES:
            d = f"{index_dir}/{tbl}/chunk={c}"
            if fs_exists(spark, d):
                fs, p = hadoop_fs(spark, d)
                fs.delete(p, True)
    return torn


def upsert_docs(spark: SparkSession, index_dir: str,
                new_docs: DataFrame) -> dict:
    """Replace documents by (repo, path). ``new_docs`` is corpus-schema
    (repo, path, commit, lang, content), one row per file. Returns
    {"n_appended", "n_tombstones", "epoch"}: rows newly appended, the
    index's TOTAL tombstone count after the call (delete_docs contract),
    and the journal epoch id used (None when every row was already
    applied).

    After an upsert, queries see exactly the new versions; corpus-wide
    stats stay frozen (tombstone contract) until compact_index. The
    target must be an existing chunk-layout index (positional v3
    included — the epoch writes its positions chunk; only the early
    flat positions layout is refused, matching streaming ingest).

    Do not run concurrently with a live stream epoch's write — the
    torn-chunk GC cannot distinguish a mid-write stream chunk from a
    crashed one (upserts against a stream-fed index belong between
    trigger intervals, exactly like compact_index).
    """
    from ..fsutil import chunk_dirs, fs_exists
    from ..streaming.ingest import (_append_epoch, _is_stream_chunk,
                                    _is_upsert_chunk, journal_df)
    from .delete import delete_docs, revive_docs, tombstone_keys
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

    journal = journal_df(spark, index_dir)
    by_epoch: dict[int, str] = {} if journal is None else {
        int(r["epoch"]): str(r["status"])
        for r in journal.select("epoch", "status").collect()}
    journaled = set(by_epoch)
    # refuse while an UNJOURNALED stream chunk exists (a stream epoch
    # mid-write or crashed before its journal row): its doc ids are
    # invisible to id allocation, so the u-chunk would reuse them and
    # two different documents would share ids until the stream replays
    # (r5 third review — the docstring's "don't run concurrently" rule,
    # now enforced for the crashed-stream case too)
    torn_stream = sorted(
        c for c in chunk_dirs(spark, f"{index_dir}/docs")
        if _is_stream_chunk(c) and int(c[len("stream"):]) not in journaled)
    if torn_stream:
        raise ValueError(
            f"docs table holds unjournaled stream chunk(s) "
            f"{torn_stream} — a stream epoch is mid-write or crashed "
            f"before committing; restart the stream (its checkpoint "
            f"replays the epoch) before upserting, or the upsert's doc "
            f"ids would collide with the torn chunk's")
    # a u-chunk is committed ONLY by its own "upsert" row — a legacy
    # facet row at the same even negative must not shield a torn chunk
    _gc_torn_chunks(spark, index_dir,
                    {e for e, s in by_epoch.items() if s == "upsert"})

    docs = spark.read.parquet(f"{index_dir}/docs")
    # idempotent replay: rows whose version triple is already in the
    # COMMITTED docs table (torn chunks were just GC'd) were applied by
    # a previous run of this upsert
    fresh = new_docs.join(
        docs.select(*_VERSION_KEY), _VERSION_KEY, "left_anti").persist()
    n_new = fresh.count()
    epoch = None
    if n_new:
        k = 1 + max((int(c[1:]) for c in
                     chunk_dirs(spark, f"{index_dir}/docs")
                     if _is_upsert_chunk(c)), default=0)
        # legacy facet-backfill rows (pre-parity allocation) may occupy
        # even negatives — never overwrite a journal row another writer
        # owns (r5 second review)
        while _upsert_epoch(k) in journaled:
            k += 1
        epoch = _upsert_epoch(k)
        _append_epoch(fresh, epoch, index_dir,
                      codec=m["codec"], block_size=int(m["block_size"]),
                      chunk_name=f"u{k}", status="upsert")
    else:
        # nothing to append — but a previous run may have died between
        # its journal write and its meta write; make meta catch up
        from ..streaming.ingest import reconcile_meta
        reconcile_meta(spark, index_dir)
    fresh.unpersist()

    # revive the target triples: re-upserting a previously REPLACED
    # version (a revert to an old commit) finds it already in docs but
    # tombstoned — without revival the replay-skip leaves it dead while
    # the delete half below kills the current version too, vanishing
    # the document from every query (r5 third review). Idempotent; a
    # no-op when no target triple is tombstoned.
    revive_docs(spark, index_dir, new_docs)

    # tombstone every older version of an upserted file — computed from
    # the FULL new_docs (not `fresh`), so a replay whose append was
    # already committed still finishes the delete half
    old = (docs.alias("d")
           .join(new_docs.select(*_FILE_KEY, "commit").alias("n"),
                 _FILE_KEY)
           .where(F.col("d.commit") != F.col("n.commit"))
           .select(*[F.col(f"d.{c}").alias(c) for c in _VERSION_KEY]))
    if not old.isEmpty():
        n_tomb = delete_docs(spark, index_dir, old)
    else:
        # the contract is the index's TOTAL count (delete_docs return),
        # not "how many this call added" (r5 review)
        t = tombstone_keys(spark, index_dir)
        n_tomb = t.count() if t is not None else 0
    return {"n_appended": int(n_new), "n_tombstones": int(n_tomb),
            "epoch": epoch}
