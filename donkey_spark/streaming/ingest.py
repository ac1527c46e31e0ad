"""Streaming ingest — donkey's continuous insert + journal analog
(SURVEY §2.10).

Donkey ingests via an `insert` RPC, appends to a write-ahead journal, and
periodically rebuilds the index (`reindex`) `[donkey:src/donkey.cpp —
unverified, SURVEY §0]`. The Structured-Streaming re-expression:

  insert RPC stream   → file-source readStream over the corpus directory
  journal append      → foreachBatch: each epoch builds its own segment
                        chunk dir (chunk=stream<epoch>), docs chunk dir,
                        dictionary PARTIAL and manifest row — ALL
                        epoch-keyed overwrites. The running (n_docs,
                        sum_dl, n_postings) state = a once-per-run batch
                        base + the tiny per-epoch manifest_stream journal
                        (this epoch's row excluded), never the mutable
                        meta file; re-delivered batches therefore converge
                        to the identical index (exactly-once effect), and
                        per-epoch cost is O(epoch) — nothing rescans the
                        accumulated docs/segments/dictionary (r2 rewrote
                        the full dictionary every epoch)
  periodic reindex    → compact_index(): canonical batch rebuild over the
                        accumulated docs table (restores dense global ids
                        and a single avgdl)
  duplicate inserts   → per-batch dropDuplicates on (repo, path, commit)

Streaming constraints, stated honestly: within an epoch, doc ids are dense
from the running count in meta, but avgdl / df are frozen at their values
when each chunk was built, so BM25 scores from a streamed index are
approximate until compact_index() runs — exactly like donkey serving
between journal replays and reindexes. The north_rule requires the
checkpoint-resumable BATCH build (plans/build.py); this module is the
capability mapping for continuous ingest on top of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import BLOCK_SIZE, default_range_size
from ..functions.tokenize import doc_features_udf
from ..operators.postings import build_segments, merge_segments
from ..sources.corpus import CORPUS_SCHEMA


def _base_state(spark: SparkSession, index_dir: str) -> dict:
    """Committed BATCH state (docs/dl/postings of every non-stream chunk) —
    static while a stream runs, so stream_ingest computes it once per run
    and every epoch reuses it (the memo). Per-epoch state then comes from
    the tiny manifest_stream journal (one row per epoch), never from a
    scan of the whole docs table — per-epoch cost is O(epoch), not
    O(index)."""
    from ..fsutil import fs_exists
    from ..plans.build import _check_dictionary_layout
    # epochs append chunk=* dictionary partials — refuse to mix them into
    # a pre-chunked (flat bucket=*) dictionary root (memoized per run)
    _check_dictionary_layout(spark, index_dir)
    from ..config import N_BUCKETS
    from ..operators.ranges import RANGE_STEP
    base = {"n": 0, "dl": 0.0, "p": 0, "rsize": None, "facets": (),
            "range_facets": (), "range_step": int(RANGE_STEP),
            "positions": False, "n_buckets": int(N_BUCKETS)}
    if fs_exists(spark, f"{index_dir}/docs"):
        # exclude every JOURNALED chunk (stream<e> epochs AND u<k> upsert
        # epochs — plans/upsert.py): their docs/dl are carried by their
        # manifest_stream rows; counting them here too would double them
        batch_docs = (spark.read.parquet(f"{index_dir}/docs")
                      .where(~F.col("chunk").cast("string")
                             .rlike("^(stream|u)[0-9]+$")))
        agg = batch_docs.agg(F.count("*").alias("n"),
                             F.sum("dl").alias("s")).collect()[0]
        base["n"], base["dl"] = int(agg["n"]), float(agg["s"] or 0.0)
    if fs_exists(spark, f"{index_dir}/manifest"):
        base["p"] = int(spark.read.parquet(f"{index_dir}/manifest")
                        .where(F.col("status") == "done")
                        .agg(F.coalesce(F.sum("n_postings"), F.lit(0)))
                        .collect()[0][0])
    if fs_exists(spark, f"{index_dir}/meta"):
        m = spark.read.parquet(f"{index_dir}/meta").collect()[0].asDict()
        from ..plans.positions import (POSITIONS_VERSION,
                                       check_positions_layout)
        if int(m.get("version", 0)) >= POSITIONS_VERSION:
            # epochs extend the positions side table with their own
            # chunk=stream<e> dir (r5; positions chunks partition the
            # doc space, so readers just union them) — but refuse the
            # early flat layout, which chunk dirs would corrupt
            check_positions_layout(spark, index_dir)
            base["positions"] = True
        base["rsize"] = int(m["range_size"])
        # epochs over a facet-enabled batch index keep indexing the same
        # facets, so filtered queries stay correct across the stream
        base["facets"] = split_facets(m, "facets")
        # range facets (and the trie step — a LAYOUT property like
        # n_buckets: epoch tags must split where the build's did) carry
        # across the stream the same way
        base["range_facets"] = split_facets(m, "range_facets")
        base["range_step"] = int(m.get("range_step") or RANGE_STEP)
        # the bucket count is a LAYOUT property fixed at build time —
        # meta rewrites must carry the index's own value, never the
        # current config constant (third review: a changed constant
        # would silently re-route term probes into the wrong dirs)
        base["n_buckets"] = int(m["n_buckets"])
    return base


def _is_m_chunk(c: str) -> bool:
    return c.startswith("m") and c[1:].isdigit()


def _is_stream_chunk(c: str) -> bool:
    return c.startswith("stream") and c[6:].isdigit()


#: the ONE meta schema — every writer goes through write_meta (r5
#: second review: three hand-built copies had already diverged in
#: n_chunks handling)
META_DDL = ("version int, n_docs long, avgdl double, n_postings long, "
            "range_size long, block_size int, codec string, "
            "n_buckets int, n_chunks int, facets string, "
            "range_facets string, range_step int")


def split_facets(m: dict, key: str) -> tuple[str, ...]:
    """Decode one of meta's comma-joined facet-list columns ("facets" /
    "range_facets") from a collected meta row dict — the ONE reader of
    the format write_meta/check_facet_kinds own, tolerant of metas that
    predate the column (fourth review: the inline idiom had spread to
    seven call sites across four modules)."""
    return tuple(f for f in (m.get(key) or "").split(",") if f)


def check_facet_kinds(facets, range_facets) -> None:
    """A column is ONE kind of facet. Enforced at every meta writer
    (build_index validates pre-work too, for a fast user-facing error):
    a dual registration would leave the column unservable by BOTH
    histogram surfaces and make a streaming epoch carrying it project
    it twice (ambiguous-column analysis error)."""
    both = sorted(set(facets) & set(range_facets))
    if both:
        raise ValueError(
            f"column(s) {both} appear in BOTH facets and range_facets "
            f"— a column is one kind of facet, not both")


def write_meta(spark: SparkSession, index_dir: str, *, version: int,
               n_docs: int, avgdl: float, n_postings: int,
               range_size: int, block_size: int, codec: str,
               facets, n_buckets: int, n_chunks: int = -1,
               range_facets=(), range_step: int | None = None) -> None:
    """Overwrite the 1-row meta table (n_chunks=-1 = epoch-fed, the
    batch build records its real chunk plan). ``n_buckets`` is the
    INDEX'S OWN bucket count (a layout property fixed at build time) —
    callers pass the existing meta's value, never config.N_BUCKETS
    (third review: stamping the constant would re-route every term
    probe into the wrong dirs if the constant ever changes)."""
    from ..operators.ranges import RANGE_STEP
    check_facet_kinds(facets, range_facets)
    (spark.createDataFrame(
        [(int(version), int(n_docs), float(avgdl), int(n_postings),
          int(range_size), int(block_size), codec, int(n_buckets),
          int(n_chunks), ",".join(facets), ",".join(range_facets),
          int(RANGE_STEP if range_step is None else range_step))],
        META_DDL)
        .write.mode("overwrite").parquet(f"{index_dir}/meta"))


def reconcile_meta(spark: SparkSession, index_dir: str,
                   add_facets: tuple = (),
                   add_range_facets: tuple = ()) -> None:
    """Recompute meta's running stats (n_docs, avgdl, n_postings) from
    the batch base + the FULL journal and overwrite meta when stale —
    the journal row is each epoch's commit point and meta is written
    after it, so a crash between the two leaves meta behind; every
    replaying writer (upsert, facet backfill) converges meta through
    this ONE helper. ``add_facets``/``add_range_facets`` append columns
    to the facet lists (the backfills' meta commits)."""
    base = _base_state(spark, index_dir)
    n, dl, p = base["n"], base["dl"], base["p"]
    j = journal_df(spark, index_dir)
    if j is not None:
        agg = (j.agg(F.coalesce(F.sum("n_docs"), F.lit(0)).alias("n"),
                     F.coalesce(F.sum("sum_dl"), F.lit(0)).alias("s"),
                     F.coalesce(F.sum("n_postings"), F.lit(0)).alias("p"))
               .collect()[0])
        n += int(agg["n"])
        dl += float(agg["s"])
        p += int(agg["p"])
    m = spark.read.parquet(f"{index_dir}/meta").collect()[0].asDict()
    facets = tuple(base["facets"]) + tuple(
        f for f in add_facets if f and f not in base["facets"])
    range_facets = tuple(base["range_facets"]) + tuple(
        f for f in add_range_facets if f and f not in base["range_facets"])
    avgdl = (dl / n) if n else 0.0
    if (int(m["n_docs"]) == n and int(m["n_postings"]) == p
            and abs(float(m["avgdl"]) - avgdl) < 1e-9
            and (m.get("facets") or "") == ",".join(facets)
            and (m.get("range_facets") or "") == ",".join(range_facets)):
        return
    from ..plans.positions import meta_version
    write_meta(spark, index_dir,
               version=meta_version(base["positions"]), n_docs=n,
               avgdl=avgdl, n_postings=p, range_size=int(base["rsize"]),
               block_size=int(m["block_size"]), codec=m["codec"],
               facets=facets, n_buckets=int(m["n_buckets"]),
               n_chunks=int(m.get("n_chunks", -1)),
               range_facets=range_facets,
               range_step=base["range_step"])


def journal_df(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """The manifest_stream journal as a DataFrame, or None when it does
    not exist OR holds no epoch partitions — an empty root dir (left by
    a torn-epoch GC) would otherwise fail the parquet read with
    UNABLE_TO_INFER_SCHEMA (r5 review)."""
    from ..fsutil import fs_exists, hadoop_fs
    d = f"{index_dir}/manifest_stream"
    if not fs_exists(spark, d):
        return None
    fs, p = hadoop_fs(spark, d)
    if not any(st.isDirectory()
               and st.getPath().getName().startswith("epoch=")
               for st in fs.listStatus(p)):
        return None
    return spark.read.parquet(d)


def _is_upsert_chunk(c: str) -> bool:
    """chunk=u<k> — an upsert epoch (plans/upsert.py; journal epoch
    −2k). Distinct from stream<e> so a paused stream's checkpoint
    counter can never collide with an upsert's allocation."""
    return c.startswith("u") and c[1:].isdigit()


def dictionary_chunks(spark: SparkSession, index_dir: str) -> list[str]:
    """The dictionary's chunk partition values — one FS listing, no job."""
    from ..fsutil import chunk_dirs
    return chunk_dirs(spark, f"{index_dir}/dictionary")


def active_dictionary_chunks(chunks: list[str]) -> list[str]:
    """Reader rule for merged dictionaries: a chunk=m<E> partial (written
    by merge_dictionary_partials) SUPERSEDES every chunk=stream<e> partial
    with e <= E and every older m-chunk. Readers must sum only the active
    chunks; the superseded dirs are garbage awaiting GC. This rule — not
    the GC — is what makes the merge crash-safe: the merged partial
    commits by rename BEFORE its sources are deleted, and a crash in
    between leaves both on disk without double-counting."""
    m_eids = [int(c[1:]) for c in chunks if _is_m_chunk(c)]
    top = max(m_eids, default=-1)
    out = []
    for c in chunks:
        if _is_m_chunk(c):
            if int(c[1:]) == top:
                out.append(c)
        elif _is_stream_chunk(c):
            if int(c[6:]) > top:
                out.append(c)
        else:                       # batch / compacted chunks: always live
            out.append(c)
    return out


def merge_dictionary_partials(spark: SparkSession, index_dir: str,
                              before_epoch: int | None = None,
                              min_partials: int = 2) -> int:
    """Dictionary-only compaction: fold the committed stream partials
    (and any previous merged partial) into ONE chunk=m<E> partial, so a
    per-term probe over a long-running stream reads O(buckets) files
    instead of O(epochs) — without touching segments (the full
    compact_index remains the segment-level reclaimer).

    Protocol: sum df/cf/n_blocks + max tf-part per (bucket, term) over
    the source chunks, write to a staging dir, RENAME into
    dictionary/chunk=m<E> (E = highest folded epoch; E > any previous
    m-chunk by construction, so the target never pre-exists), then
    delete the sources best-effort. Readers apply
    ``active_dictionary_chunks`` so the commit point is the rename;
    a crash before it changes nothing, a crash after it leaves
    superseded dirs that are ignored and GC'd on the next call.

    ``before_epoch``: fold only stream epochs < this id — pass the
    current epoch id when calling from inside a running stream: a
    foreachBatch retry re-delivers only the current epoch, so folding
    strictly older (committed) epochs can never double-count a replay.
    When omitted it is DERIVED from the manifest_stream journal (fold
    only journaled epochs): an epoch whose dictionary partial exists but
    whose manifest row hasn't committed yet is mid-write — folding it
    would freeze a partial rewrite into m<E> and permanently understate
    df/cf. Callers can no longer hit that window by forgetting the
    argument.

    Superseded source dirs are NOT deleted in the same call that
    supersedes them: a live Index created before this merge may still
    hold memoized dataset handles over them, and the reader rule already
    ignores them. They are reclaimed at the START of the NEXT merge call
    — a one-merge grace period. (A reader created before TWO merges ago
    must be re-created; Index objects are cheap and serving loops
    re-plan per batch anyway.)

    Returns the number of partials folded (0 = no-op)."""
    from ..fsutil import hadoop_fs
    chunks = dictionary_chunks(spark, index_dir)
    if not chunks:
        return 0
    if before_epoch is None and any(_is_stream_chunk(c) for c in chunks):
        j = journal_df(spark, index_dir)
        journaled = (int(j.agg(F.coalesce(F.max("epoch"), F.lit(-1)))
                     .collect()[0][0]) if j is not None else -1)
        before_epoch = journaled + 1
    fs, _ = hadoop_fs(spark, f"{index_dir}/dictionary")
    active = set(active_dictionary_chunks(chunks))
    for c in chunks:        # deferred GC: dirs superseded by a PRIOR call
        if c not in active:  # (grace period) or left by a prior crash
            _, p = hadoop_fs(spark, f"{index_dir}/dictionary/chunk={c}")
            fs.delete(p, True)
    top = max((int(c[1:]) for c in chunks if _is_m_chunk(c)), default=-1)
    cands = sorted(int(c[6:]) for c in chunks
                   if _is_stream_chunk(c) and c in active
                   and int(c[6:]) > top
                   and (before_epoch is None or int(c[6:]) < before_epoch))
    n_src = len(cands) + (1 if top >= 0 else 0)
    if not cands or n_src < min_partials:
        return 0
    new_top = max(cands)
    src_dirs = [f"{index_dir}/dictionary/chunk=stream{e}" for e in cands]
    if top >= 0:
        src_dirs.append(f"{index_dir}/dictionary/chunk=m{top}")
    from ..config import N_BUCKETS
    merged = (spark.read.option("basePath", f"{index_dir}/dictionary")
              .parquet(*src_dirs)
              .groupBy("bucket", "term")
              .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"),
                   F.sum("n_blocks").cast("int").alias("n_blocks"),
                   F.max("max_tfpart").alias("max_tfpart"))
              .select("term", "df", "cf", "n_blocks", "max_tfpart",
                      "bucket"))
    staging = f"{index_dir}/dictionary_merge_staging"
    (merged.repartitionByRange(max(1, N_BUCKETS // 4), "bucket", "term")
        .sortWithinPartitions("bucket", "term")
        .write.mode("overwrite").partitionBy("bucket").parquet(staging))
    sfs, spath = hadoop_fs(spark, staging)
    _, tpath = hadoop_fs(spark,
                         f"{index_dir}/dictionary/chunk=m{new_top}")
    if not sfs.rename(spath, tpath):
        raise IOError(f"dictionary merge commit failed: rename {staging} "
                      f"-> chunk=m{new_top} returned false")
    # src_dirs are now superseded — readers ignore them (reader rule) and
    # the NEXT merge call's GC loop reclaims them, so a live Index holding
    # memoized handles over them keeps working through this merge
    return n_src


def _append_epoch(batch_df: DataFrame, epoch_id: int, index_dir: str,
                  codec: str, block_size: int,
                  memo: dict | None = None,
                  chunk_name: str | None = None,
                  status: str = "stream") -> None:
    spark = batch_df.sparkSession
    # Derive the committed state from the batch base (memoized per stream
    # run) plus the per-epoch manifest_stream journal — NEVER from the
    # mutable meta file: a foreachBatch retry that died after the meta
    # write would otherwise re-read the already-bumped n_docs and assign
    # shifted doc_ids. This very epoch's earlier (failed) attempt is
    # excluded by its epoch key, so replay is idempotent end to end. An
    # epoch whose docs chunk committed but whose manifest row didn't is
    # excluded too — correct, because the checkpoint replays THAT epoch
    # first (in order) and its chunk dirs are overwritten in place.
    this_chunk = chunk_name or f"stream{epoch_id}"
    # ONLY path-absence may mean "empty index": a transient FS/schema error
    # reading committed state must fail the micro-batch (the checkpoint
    # retries) rather than silently restart doc_ids at 0 over already
    # committed epochs.
    if memo is None or "base" not in memo:
        base = _base_state(spark, index_dir)
        if memo is not None:
            memo["base"] = base
    else:
        base = memo["base"]
        # a facet backfilled MID-STREAM (plans/add_facet.py commits meta
        # with the new column between micro-batches) must not be erased
        # by this epoch's meta rewrite from the stale memo — merge the
        # CURRENT meta facet lists in. Facets are append-only, so the
        # union is replay-safe. A backfill is the ONLY writer that can
        # extend meta's facet lists mid-stream and it always leaves a
        # [r]facet_<col> segments chunk, so a driver-side FS listing
        # (no Spark job) gates the 1-row meta read: steady-state epochs
        # pay a listStatus, never a read job.
        from ..fsutil import chunk_dirs, fs_exists
        backfilled = {c.split("_", 1)[1]
                      for c in chunk_dirs(spark, f"{index_dir}/segments")
                      if c.startswith(("facet_", "rfacet_"))}
        known = set(base["facets"]) | set(base["range_facets"])
        if (backfilled - known) and fs_exists(spark, f"{index_dir}/meta"):
            cur = (spark.read.parquet(f"{index_dir}/meta")
                   .collect()[0].asDict())
            for key in ("facets", "range_facets"):
                extra = tuple(f for f in split_facets(cur, key)
                              if f not in base[key])
                if extra:
                    base[key] = tuple(base[key]) + extra
    n_before, sum_dl = base["n"], base["dl"]
    postings_before = base["p"]
    rsize = base["rsize"]
    j = journal_df(spark, index_dir)
    if j is not None:
        prev = (j.where(F.col("epoch") != int(epoch_id))
                .agg(F.count("*").alias("e"),
                     F.coalesce(F.sum("n_docs"), F.lit(0)).alias("n"),
                     F.coalesce(F.sum("sum_dl"), F.lit(0)).alias("s"),
                     F.coalesce(F.sum("n_postings"), F.lit(0)).alias("p"))
                .collect()[0])
        n_before += int(prev["n"])
        sum_dl += float(prev["s"])
        postings_before += int(prev["p"])

    # dense ids within the micro-batch (key order, offset by the running
    # count). Two assignment paths with IDENTICAL results (digest-tested):
    # steady-state batches use a single-partition window (one tiny sort);
    # a catch-up/bootstrap epoch over a backlog (> STREAM_ID_GATE_ROWS)
    # switches to the batch build's two-phase range assignment so the
    # whole backlog never funnels through one partition. The gate needs
    # only "is it above the threshold", so it counts a LIMITed slice —
    # a bounded scan even over a 10^8-row backlog (r5 review), not a
    # full pass the epoch would then repeat.
    from ..config import STREAM_ID_GATE_ROWS
    feats = ["repo", "path", "commit", "lang",
             F.sha2(F.col("content"), 256).alias("sha256"),
             doc_features_udf(F.col("content")).alias("f")]
    if base["positions"]:
        # the epoch's positions chunk needs (doc_id, content) AFTER id
        # assignment — carry content through (O(epoch) extra persist)
        feats.append("content")
    # facet columns the batch carries ride the projection (skip-if-
    # absent — NULL semantics; a column backfilled from caller values
    # is not in the corpus schema). Equality columns cast to string —
    # the SAME rendering their presence tags use (r5 third review: the
    # fpresent check below could never succeed for a custom column
    # because nothing projected it)
    feats += [F.col(c).cast("string").alias(c)
              for c in base["facets"]
              if c in batch_df.columns
              and c not in ("repo", "path", "commit", "lang")]
    feats += [F.col(c).cast("long").alias(c)
              for c in base["range_facets"] if c in batch_df.columns]
    if (batch_df.select("repo").limit(STREAM_ID_GATE_ROWS + 1).count()
            > STREAM_ID_GATE_ROWS):
        from ..operators.doc_ids import assign_doc_ids
        # dedupe=True fuses distinct(repo,path,commit) + count + rank
        # into the ONE range shuffle (operators/doc_ids.py); the
        # two-phase pass persists its ranged partitions for the
        # duration of the epoch (per-run cost bounded: catch-up fires
        # once per stream bootstrap, steady state never hits the gate)
        ids, n_batch, _ = assign_doc_ids(
            batch_df.select(*feats), dedupe=True)
        rows = (ids.withColumn("doc_id", F.col("doc_id") + F.lit(n_before))
                .persist())
        rows.count()
        # rows is materialized; release the id pass's persisted ranged
        # key frame now instead of leaking one copy per catch-up epoch
        _ids_src = getattr(ids, "_donkey_source_cache", None)
        if _ids_src is not None:
            _ids_src.unpersist()
    else:
        batch = batch_df.dropDuplicates(["repo", "path", "commit"])
        rows = (batch.select(*feats)
                .withColumn("doc_id",
                            F.row_number().over(
                                Window.orderBy("repo", "path", "commit"))
                            + F.lit(n_before - 1))
                .persist())
        n_batch = rows.count()
    if n_batch == 0:
        rows.unpersist()
        return
    batch_dl = int(rows.agg(F.sum("f.dl")).collect()[0][0] or 0)
    n_docs = n_before + n_batch
    avgdl_new = (sum_dl + batch_dl) / n_docs
    rsize = rsize or default_range_size(n_docs)
    base["rsize"] = int(rsize)   # pin in the memo: the range salt must be
    #                              identical across every epoch of the run

    from ..operators.facets import append_facet_terms
    # only facet columns the batch actually CARRIES can be indexed for
    # its docs: a column backfilled from caller values (add_facet
    # values=) is not in the corpus schema, and referencing it here
    # would fail every future epoch (r5 review). Skipping it gives the
    # epoch's docs no presence posting — exactly the NULL-value
    # semantics — and a later add_facet refresh covers them.
    fpresent = tuple(f for f in base["facets"] if f in rows.columns)
    fterms, ftfs = append_facet_terms(F.col("f.terms"), F.col("f.tfs"),
                                      fpresent)
    from ..operators.ranges import append_range_terms
    rpresent = tuple(f for f in base["range_facets"] if f in rows.columns)
    fterms, ftfs = append_range_terms(fterms, ftfs, rpresent,
                                      step=int(base["range_step"]))
    dt = (rows.select("doc_id", F.col("f.dl").alias("dl"),
                      F.explode(F.arrays_zip(fterms.alias("terms"),
                                             ftfs.alias("tfs"))).alias("e"))
          .select("doc_id", "dl", F.col("e.terms").alias("term"),
                  F.col("e.tfs").alias("tf")))
    seg = merge_segments(build_segments(dt, avgdl_new, rsize, codec=codec,
                                        block_size=block_size),
                         n_buckets=int(base["n_buckets"]))
    # idempotent per epoch: every epoch-scoped artifact is an overwrite of
    # an epoch-keyed directory (segments chunk dir, docs chunk dir,
    # dictionary partial, manifest row), so re-delivery of a batch
    # converges to the same state. Everything below touches ONLY this
    # epoch's data — O(epoch) per epoch, flat as the index grows.
    from pyspark.sql import Observation
    obs = Observation(f"stream{epoch_id}")
    seg = seg.observe(obs, F.coalesce(F.sum("n_docs"), F.lit(0)).alias("p"))
    (seg.write.mode("overwrite").partitionBy("bucket")
        .parquet(f"{index_dir}/segments/chunk={this_chunk}"))
    epoch_postings = int(obs.get["p"])
    (rows.select("doc_id", "repo", "path", "commit", "lang",
                 F.col("f.dl").alias("dl"), "sha256")
        .write.mode("overwrite")
        .parquet(f"{index_dir}/docs/chunk={this_chunk}"))
    if base["positions"]:
        # epoch-keyed overwrite like every other artifact: replay of this
        # epoch converges; phrase queries see streamed docs immediately
        from ..plans.positions import write_positions
        write_positions(spark, rows.select("doc_id", "content"),
                        index_dir, chunk=this_chunk,
                        n_buckets=int(base["n_buckets"]))
    # per-epoch dictionary PARTIAL (readers sum df/cf per term across
    # chunk partials) — replaces the r2 full-dictionary rewrite that
    # rescanned every segment each epoch; read back this epoch's chunk
    # (already in page cache) rather than recompute the segment plan
    if epoch_postings:
        from ..operators.postings import dictionary_from_segments
        seg_chunk = spark.read.parquet(
            f"{index_dir}/segments/chunk={this_chunk}")
        (dictionary_from_segments(seg_chunk,
                                  n_buckets=int(base["n_buckets"]))
            .write.mode("overwrite").partitionBy("bucket")
            .parquet(f"{index_dir}/dictionary/chunk={this_chunk}"))
    else:
        # an epoch whose docs yield ZERO postings (every token under
        # MIN length, no facet values) wrote a segments dir holding
        # only _SUCCESS — reading it back raises UNABLE_TO_INFER_SCHEMA
        # and, being before the journal row, would wedge the stream in
        # a permanent retry loop (r5 third review). Remove the empty
        # dirs and journal the epoch with n_postings=0: the docs chunk
        # stays (the documents exist, they are just unsearchable).
        from ..fsutil import fs_exists, hadoop_fs
        for tbl in ("segments", "dictionary"):
            d = f"{index_dir}/{tbl}/chunk={this_chunk}"
            if fs_exists(spark, d):
                fs, p = hadoop_fs(spark, d)
                fs.delete(p, True)
    # cap probe cost: once enough committed stream partials accumulate,
    # fold them (dictionary-only, cheap — the dictionary is O(vocab), not
    # O(postings)) so per-term probes stay O(buckets) on a long-running
    # stream. before_epoch=this epoch keeps the fold replay-safe: a
    # foreachBatch retry re-delivers only THIS epoch, never a folded one.
    from ..config import DICT_MERGE_MIN_PARTIALS
    n_stream_partials = sum(
        1 for c in active_dictionary_chunks(
            dictionary_chunks(spark, index_dir)) if _is_stream_chunk(c))
    if n_stream_partials > DICT_MERGE_MIN_PARTIALS:
        merge_dictionary_partials(spark, index_dir,
                                  before_epoch=int(epoch_id))
    (spark.createDataFrame(
        [(status, n_batch, batch_dl, epoch_postings)],
        "status string, n_docs long, sum_dl long, n_postings long")
        .write.mode("overwrite")
        .parquet(f"{index_dir}/manifest_stream/epoch={int(epoch_id)}"))
    from ..plans.positions import meta_version
    write_meta(spark, index_dir,
               version=meta_version(base["positions"]), n_docs=n_docs,
               avgdl=float(avgdl_new),
               n_postings=postings_before + epoch_postings,
               range_size=int(rsize), block_size=int(block_size),
               codec=codec, facets=base["facets"],
               n_buckets=int(base["n_buckets"]),
               range_facets=base["range_facets"],
               range_step=base["range_step"])
    rows.unpersist()


def stream_ingest(spark: SparkSession, source_dir: str, index_dir: str,
                  checkpoint_dir: str, codec: str = "varint",
                  block_size: int = BLOCK_SIZE,
                  trigger_once: bool = True):
    """Start (or run-once) the ingest stream over a corpus directory."""
    stream = (spark.readStream.schema(CORPUS_SCHEMA)
              .option("maxFilesPerTrigger", 8)
              .parquet(source_dir))
    memo: dict = {}        # per-run batch-base state (computed once,
    #                        epochs add deltas from manifest_stream)
    writer = (stream.writeStream
              .foreachBatch(lambda df, eid: _append_epoch(
                  df, eid, index_dir, codec, block_size, memo=memo))
              .option("checkpointLocation", checkpoint_dir))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_index(spark: SparkSession, corpus: DataFrame,
                  index_dir: str, **build_opts) -> dict:
    """The `reindex` analog: canonical batch rebuild (dense global ids,
    single global avgdl/df) over the full corpus. Tombstoned documents
    (plans/delete.py) are reclaimed here: their (repo, path, commit)
    keys are SNAPSHOTTED to a side parquet first — the rebuild must not
    hold a lazy plan over directories it overwrites, and the snapshot
    gives that safety WITHOUT round-tripping the key set through the
    driver (r4; the old path collect()ed it). The anti-join broadcasts
    only while the snapshot is small (file-size gate); at the 10^8-key
    budget bound it falls back to a shuffle join. The key set is cleared
    only after the build commits — and because tombstones are keys, not
    ids, a crash leaving a stale set behind is harmless: the keys no
    longer resolve to any document in the rebuilt index."""
    from ..fsutil import fs_exists, hadoop_fs
    from ..plans.build import build_index
    from ..plans.delete import clear_tombstones, tombstone_keys
    # a compaction keeps the index's facet schema unless the caller
    # explicitly overrides it — otherwise the first reindex would
    # silently stop indexing filter postings
    if fs_exists(spark, f"{index_dir}/meta"):
        m = spark.read.parquet(f"{index_dir}/meta").collect()[0].asDict()
        if "facets" not in build_opts:
            build_opts["facets"] = split_facets(m, "facets")
        if "range_facets" not in build_opts:
            build_opts["range_facets"] = split_facets(m, "range_facets")
        if "positions" not in build_opts:
            # a compaction keeps phrase support too (format version 3)
            from ..plans.positions import POSITIONS_VERSION
            build_opts["positions"] = (
                int(m.get("version", 0)) >= POSITIONS_VERSION)
    keys = tombstone_keys(spark, index_dir)
    snap = f"{index_dir}/_tombstone_snapshot"
    sfs, spath = hadoop_fs(spark, snap)
    if keys is not None:
        keys.write.mode("overwrite").parquet(snap)
        dead = spark.read.parquet(snap).select("repo", "path", "commit")
        # ~40 B/key on disk → the gate admits ~10^6-key sets to the
        # executor-memory broadcast; beyond that SMJ is the right plan
        if sfs.getContentSummary(spath).getLength() <= 64 << 20:
            dead = F.broadcast(dead)
        corpus = corpus.join(dead, ["repo", "path", "commit"], "left_anti")
    info = build_index(spark, corpus, index_dir, **build_opts)
    clear_tombstones(spark, index_dir)
    if sfs.exists(spath):
        sfs.delete(spath, True)
    return info
