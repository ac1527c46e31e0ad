"""Entry point A — index build (SURVEY §3.2).

Donkey's lifecycle analog: journal replay → Index::rebuild → persist
`[donkey:src/donkey.cpp — unverified, SURVEY §0]`, re-expressed as a
three-stage Catalyst pipeline:

  scan → sha256-check → dedupe → assign_doc_ids → tokenize (Arrow UDF,
  content dropped immediately) → doc_terms (vectorized tf) →
  groupBy(term, salt).applyInPandas build → bucket-partitioned parquet
  + dictionary + meta + manifest/metrics.

Checkpoint-resume (north_rule): the corpus is cut into contiguous doc-id
chunks (chunk boundaries are multiples of the range salt, so chunk outputs
are disjoint (term, salt) sets and the final index is their plain union).
Each chunk writes to its own directory, idempotently (overwrite), and a
manifest row with per-partition lineage + metrics commits it. Resume =
anti-join of chunk ids against manifest status='done' (SURVEY op 29).

Index layout:
  out/docs/        doc_id, repo, path, commit, lang, dl, sha256
  out/segments/    chunk=<c>/bucket=<b>/*.parquet   (block rows)
  out/dictionary/  chunk=<c>/bucket=<b>/*.parquet   (per-chunk partials;
                   readers SUM df/cf per term — batch builds write one
                   chunk, streaming epochs append theirs)
  out/meta/        1-row parquet (n_docs, avgdl, range_size, codec, ...)
  out/manifest/    chunk lineage + metrics (append-only journal analog)
"""

from __future__ import annotations

import math
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark import StorageLevel

from ..config import BLOCK_SIZE, META_VERSION, N_BUCKETS, default_range_size
from ..fsutil import hadoop_fs
from ..functions.tokenize import (FEATURES_STRUCT_DDL, doc_features_arrow,
                                  doc_features_udf)
from ..operators.doc_ids import assign_doc_ids
from ..operators.postings import (build_partial_postings,
                                  dictionary_from_segments,
                                  merge_partials_to_segments, merge_segments)
from ..sources.corpus import check_sha256


def _write_small(spark: SparkSession, rows: list[tuple], schema: str,
                 path: str, mode: str, name: str) -> None:
    """Write a tiny table (manifest row, meta) without a Spark job when the
    target RESOLVES to the local filesystem (fsutil.fs_is_local — never a
    path-string guess) — each saved job is pure serial driver time in the
    build's critical path. Cluster URIs (hdfs://, s3://...) fall back to
    the normal Spark write."""
    from ..fsutil import fs_is_local, local_path
    if not fs_is_local(spark, path):
        spark.createDataFrame(rows, schema).write.mode(mode).parquet(path)
        return
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os
    import shutil
    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import StructType
    p = local_path(path)
    if mode == "overwrite" and os.path.isdir(p):
        shutil.rmtree(p)
    os.makedirs(p, exist_ok=True)
    arrow_schema = to_arrow_schema(StructType.fromDDL(schema))
    cols = list(zip(*rows)) if rows else [[] for _ in arrow_schema]
    tbl = pa.Table.from_arrays(
        [pa.array(c, type=f.type) for c, f in zip(cols, arrow_schema)],
        schema=arrow_schema)
    pq.write_table(tbl, os.path.join(p, f"part-{name}.parquet"))


def _manifest_postings_total(spark: SparkSession, manifest_dir: str) -> int:
    """Sum of n_postings over committed chunks. The manifest is a handful
    of rows the build itself wrote with `_write_small` — when it lives on
    the LOCAL filesystem (fsutil.fs_is_local, same gate as the writer)
    read it back with pyarrow instead of paying a whole Spark job in the
    build's serial finalize path (r6, guide §5 "the driver should do
    almost no data work" — this IS driver-sized work). Cluster URIs keep
    the Spark read."""
    from ..fsutil import fs_is_local, local_path
    if fs_is_local(spark, manifest_dir):
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        tbl = pq.read_table(local_path(manifest_dir),
                            columns=["status", "n_postings"])
        done = tbl.filter(pc.equal(tbl["status"], "done"))
        return int(pc.sum(done["n_postings"]).as_py() or 0)
    return int(spark.read.parquet(manifest_dir)
               .where(F.col("status") == "done")
               .agg(F.coalesce(F.sum("n_postings"), F.lit(0)))
               .collect()[0][0])


def _check_dictionary_layout(spark: SparkSession, out_dir: str) -> None:
    """Fail fast on a pre-chunked (meta version 1) dictionary layout.

    r3 moved the dictionary to per-chunk partials (dictionary/chunk=<c>/
    bucket=<b>); the old layout had bucket=<b> dirs at the root. A
    resume=True build or a streaming epoch over an old index would write
    chunk=* dirs BESIDE the old bucket=* dirs, breaking Hive partition
    discovery for every later dictionary read — refuse instead and point
    at the (cheap) migration: a fresh rebuild rewrites the dictionary in
    the current layout."""
    fs, jpath = hadoop_fs(spark, f"{out_dir}/dictionary")
    if not fs.exists(jpath):
        return
    flat = [st.getPath().getName() for st in fs.listStatus(jpath)
            if st.isDirectory()
            and st.getPath().getName().startswith("bucket=")]
    if flat:
        raise ValueError(
            f"{out_dir}/dictionary has a flat bucket=* layout (pre-chunked "
            f"index format, meta version 1); mixing chunk=* partials beside "
            f"it would corrupt dictionary reads — rebuild the index with "
            f"resume=False (or compact_index) to migrate")


def _manifest_state(spark: SparkSession,
                    manifest_dir: str) -> tuple[set[int], dict[int, int]]:
    """(committed chunk ids, max attempt ever journaled per chunk).

    'start' rows journal an attempt BEFORE the chunk builds, so a run that
    dies between the segment write and the 'done' commit still leaves its
    attempt number behind — the resume's rebuild of that chunk is then
    visibly attempt N+1 in the lineage (SURVEY op 4)."""
    from ..fsutil import fs_exists
    if not fs_exists(spark, manifest_dir):
        return set(), {}
    rows = (spark.read.parquet(manifest_dir)
            .groupBy("chunk")
            .agg(F.max("attempt").alias("att"),
                 F.max(F.when(F.col("status") == "done", 1).otherwise(0))
                 .alias("done"))
            .collect())
    done = {r["chunk"] for r in rows if r["done"]}
    return done, {r["chunk"]: int(r["att"]) for r in rows}


def build_index(spark: SparkSession, corpus: DataFrame, out_dir: str, *,
                codec: str = "varint", range_size: int | None = None,
                block_size: int = BLOCK_SIZE, n_chunks: int = 1,
                resume: bool = False, ref_hashes: DataFrame | None = None,
                job_id: str = "job-0", extractor: str = "python",
                facets: tuple[str, ...] = (),
                range_facets: tuple[str, ...] = (),
                positions: bool = False) -> dict:
    """Build the full inverted index; returns build info/metrics dict.

    ``positions=True`` additionally writes the positions side table
    (plans/positions.py) enabling ``Index.search_phrase`` — one extra
    content pass, meta version 3 (pre-r5 readers refuse it cleanly;
    plain indexes keep version 2).

    ``facets``: metadata columns (e.g. ("lang",)) indexed as synthetic
    presence terms "\\x01<col>=<value>" with tf=1 — the scale-correct
    field-filter design: filter postings co-locate with content postings
    in the same (term, salt) layout, so a filtered query is one extra
    posting-list intersection with NO side lookup, NO docs-table join,
    and NO change to BM25 stats (dl excludes facet terms; facet idf is
    forced to 0 at query time). The \\x01 prefix cannot collide with §T
    tokens. Off by default (keeps indexes byte-identical to r2).

    ``range_facets``: INTEGRAL metadata columns indexed for numeric
    range filters (`{'col': {'range': [lo, hi]}}`) as trie presence
    terms — 64/RANGE_STEP tags per doc per column (operators/ranges.py,
    the Lucene NumericRangeQuery design), so a range query is a bounded
    OR of node postings regardless of the column's value cardinality.
    Same co-located-posting properties as ``facets``; values are cast
    to long (declare only integral columns)."""
    from ..streaming.ingest import check_facet_kinds
    check_facet_kinds(facets, range_facets)   # fail before any work
    t0 = time.monotonic()
    if resume:
        # fail fast (before the expensive extract phase): resuming must
        # not write chunk=* dictionary partials beside a pre-chunked
        # (flat bucket=*) dictionary root
        _check_dictionary_layout(spark, out_dir)
    else:
        # tombstones survive fresh rebuilds (see the cleanup note below),
        # which is only safe in the KEY format — a legacy id-only set
        # must resolve through the OLD docs table before this build
        # reassigns ids, or the stale ids would remap onto wrong docs
        from .delete import migrate_legacy_tombstones
        migrate_legacy_tombstones(spark, out_dir)
    phases: dict[str, float] = {}
    _last = [t0]

    def _mark(name: str) -> None:
        now = time.monotonic()
        phases[name] = round(phases.get(name, 0.0) + now - _last[0], 2)
        _last[0] = now

    if ref_hashes is not None:
        check_sha256(corpus, ref_hashes)          # op 2, fails on mismatch
        _mark("sha_check")

    # ops 21 + 9 fused on the NARROW key frame: ONE range shuffle yields the
    # dense ids, the unique-key count AND the raw row count (dedupe=True
    # drops repeated keys adjacently inside the sorted partitions — no
    # separate hash-distinct exchange, no corpus.count() job); the
    # full-content dropDuplicates shuffle runs only when duplicates actually
    # exist. The payload never range-shuffles or round-trips Arrow for id
    # assignment; it joins back JVM-side (the id table broadcasts at small
    # scale, SMJ at 10^12).
    if extractor not in ("python", "arrow"):
        # validated BEFORE the concurrent id jobs are submitted — a
        # late ValueError used to leak the running jobs and their
        # persisted key frame (review r6)
        raise ValueError(f"unknown extractor {extractor!r} "
                         "(expected 'python' or 'arrow')")
    pk = corpus.select("repo", "path", "commit")
    # r6 (guide §2.6 + §8): the id machinery is 3 small jobs over the
    # NARROW key frame and the extractor pass only needs content — they
    # share no data until the attach, so the id jobs run on a driver
    # thread CONCURRENTLY with the extract job (the extract's task tail
    # back-fills the cores the id jobs leave idle and vice versa).
    # Ids then attach to the extracted FEATURES, not to the content:
    # at cluster scale the attach join's worst case (SMJ at 10^12 docs)
    # now shuffles ~(keys + unique-term arrays) per doc instead of the
    # raw payload — move heavy bytes once, decide on light rows.
    from concurrent.futures import ThreadPoolExecutor
    _ids_pool = ThreadPoolExecutor(max_workers=1)
    ids_future = _ids_pool.submit(assign_doc_ids, pk, dedupe=True)

    def _release_ids_on_failure() -> None:
        """Best-effort cleanup when the main thread fails while the id
        jobs are in flight: wait them out, drop their persisted key
        frame, shut the pool — a long-lived session (serving, notebook)
        must not accumulate one cached key frame per failed build."""
        try:
            r = ids_future.result()
            src = getattr(r[0], "_donkey_source_cache", None)
            if src is not None:
                src.unpersist()
        except Exception:
            pass
        _ids_pool.shutdown()

    # r6 (guide §2.5): the extractor UDF and the B1 partials combiner
    # inherit the corpus SCAN's partitioning — a corpus arriving in
    # fewer splits than cores (one small parquet file / one row group /
    # a few unsplittable files) would run the whole per-doc pipeline
    # nearly serially. Deterministic PK-hash spread; a no-op at cluster
    # scale (scan splits >= cores).
    par = spark.sparkContext.defaultParallelism
    spread = corpus
    if spread.rdd.getNumPartitions() < par:
        spread = spread.repartition(par, "repo", "path", "commit")

    # ops 8/10/11 fused: content crosses Arrow exactly once and is dropped
    # in the same projection; unique (term, tf) pairs — never raw tokens —
    # are all that flows toward the big shuffle. Two tested-equal
    # extractors: 'python' (per-doc C regex + Counter — measured default on
    # this host) and 'arrow' (fully-vectorized LUT/dictionary-encode kernel,
    # kernels/exttok.py — the bet on bandwidth-healthy hardware).
    # range-facet columns ride the same projection (cast long here so a
    # bad column type fails the build, not every future query); the
    # arrow extractor passes non-content columns through untouched
    rcols = [F.col(c).cast("long").alias(c) for c in range_facets]
    rddl = "".join(f"{c} long, " for c in range_facets)
    # equality-facet columns beyond the fixed doc schema ride the same
    # projection (cast to string here — the SAME rendering the presence
    # tags use, so e.g. a boolean column tags as "true"/"false"); a
    # facet naming a missing corpus column fails the build right here
    extra_f = [c for c in facets
               if c not in ("doc_id", "repo", "path", "commit",
                            "lang", "sha256")]
    fcols = [F.col(c).cast("string").alias(c) for c in extra_f]
    fddl = "".join(f"{c} string, " for c in extra_f)
    pre = spread.select("repo", "path", "commit", "lang",
                        F.sha2(F.col("content"), 256).alias("sha256"),
                        *fcols, *rcols, "content")
    if extractor == "arrow":
        feats_u = pre.mapInArrow(
            doc_features_arrow,
            "repo string, path string, commit string, "
            "lang string, sha256 string, " + fddl + rddl
            + FEATURES_STRUCT_DDL)
    else:
        feats_u = pre.select(
            "repo", "path", "commit", "lang", "sha256",
            *extra_f, *range_facets,
            doc_features_udf(F.col("content")).alias("f"))
    feats_u = feats_u.persist(StorageLevel.MEMORY_AND_DISK)
    # materialize the cache AND collect the corpus stats in the SAME
    # job, still overlapping the id jobs (r6: this used to be a bare
    # count() followed by a SERIAL stats agg after the ids attach — one
    # whole extra job on the critical path; the agg is the same cache-
    # filling pass and the stats are free map-side aggregates). The
    # null-PK count guards the deferred fast path below: the attach
    # join's null-unsafe equality would drop null-keyed rows, so stats
    # taken on THIS side are only valid when no PK field is null.
    try:
        stats = feats_u.agg(
            F.count("*").alias("n"),
            F.sum("f.dl").alias("sum_dl"),
            F.count_if(F.col("repo").isNull() | F.col("path").isNull()
                       | F.col("commit").isNull()).alias("null_pk")
        ).collect()[0]
    except BaseException:
        _release_ids_on_failure()
        feats_u.unpersist()
        raise
    _mark("extract_persist")

    ids, n_keys, n_rows = ids_future.result()
    _ids_pool.shutdown()
    # dedupe on the FEATURES (light rows) when the key count says the
    # corpus has repeated PKs — extraction of the (rare-by-contract)
    # duplicate rows is wasted work, traded for never serializing the
    # extract behind the id jobs' count on the common clean path
    feats = (feats_u.dropDuplicates(["repo", "path", "commit"])
             if n_keys != n_rows else feats_u)
    docs_feat = (feats.join(ids, ["repo", "path", "commit"])
                 .persist(StorageLevel.MEMORY_AND_DISK))
    # Bounding the attach join to ONE execution: left lazy, every
    # downstream action re-runs it — measured +15-34s on the 1M-file
    # build's segments phase when the join is an SMJ. One serial
    # materializing pass bounds that — but it is only WORTH a serial
    # job when the join is expensive: with a broadcast-sized id table
    # (the common serving/bench case; ~100B/key under
    # autoBroadcastJoinThreshold=64m caps comfortably around 500k keys) each
    # consumer re-pays only a tiny broadcast over the cached features,
    # so the docs write and the first chunk job are left to fill the
    # cache concurrently instead (guide §2.6 — strictly more overlap).
    # The dedupe path also recomputes stats post-dedupe here (rare).
    # (the deferred fast path takes the overlapped feats-side stats —
    # identical to the attached frame's because n_keys == n_rows means
    # the inner join is 1:1 on the non-null PK contract; the other
    # regimes recompute on the attached frame exactly as before, and
    # that agg doubles as the serial materializing pass)
    deferred_attach = (n_keys == n_rows and n_keys <= 500_000
                       and int(stats["null_pk"] or 0) == 0)
    if not deferred_attach:
        stats = (docs_feat.agg(F.count("*").alias("n"),
                               F.sum("f.dl").alias("sum_dl"))
                 .collect()[0])
        feats_u.unpersist()
    # deferred case: feats_u must STAY cached until docs_feat is fully
    # materialized by the concurrent consumers — released at finalize
    n_docs, sum_dl = int(stats["n"]), int(stats["sum_dl"] or 0)
    avgdl = (sum_dl / n_docs) if n_docs else 0.0
    rsize = range_size or default_range_size(n_docs)
    _mark("assign_ids_dedupe")

    if not resume:
        # fresh build: clear the stale journal AND any stale segment/docs
        # chunk dirs — a rebuild with fewer chunks (or over a streamed
        # index's chunk=stream* dirs) must not leave orphans that the
        # finalize union would silently fold into df/cf and query results.
        # Tombstones are deliberately NOT on this list: the key set is
        # durable state owned by delete_docs/compact_index — a crash
        # mid-compaction (after this cleanup, before the post-commit
        # clear) must not lose it, or a recovery rebuild would silently
        # resurrect deleted documents. Stale keys over a fresh build are
        # harmless by design (they resolve to no/matching docs); only
        # compact_index's post-commit clear_tombstones erases them.
        for sub in ("manifest", "manifest_stream", "segments", "docs",
                    "dictionary", "positions"):
            fs, jpath = hadoop_fs(spark, f"{out_dir}/{sub}")
            if fs.exists(jpath):
                fs.delete(jpath, True)

    # docs live under chunk=<...> dirs (batch = one dir) so streaming epochs
    # can append their own chunk=stream<eid> dirs idempotently (per-epoch
    # overwrite) and every reader sees one uniform partitioned layout
    docs = docs_feat.select("doc_id", "repo", "path", "commit", "lang",
                            F.col("f.dl").alias("dl"), "sha256")
    # r6 (guide §2.6): the docs write and the segment build both read
    # the persisted docs_feat and touch disjoint output dirs — submit
    # the docs write from a driver thread so the chunk loop's tasks
    # back-fill the cores its tail leaves idle; joined (and its errors
    # re-raised) right after the chunk loop, before finalize — and
    # ALSO on a chunk failure (review r6: an unjoined thread left an
    # in-flight Spark write running while callers' cleanup deleted the
    # output dir under it).
    _docs_pool = ThreadPoolExecutor(max_workers=1)
    docs_future = _docs_pool.submit(
        lambda: docs.write.mode("overwrite")
        .parquet(f"{out_dir}/docs/chunk=batch"))
    _mark("docs_write_submit")

    # --- chunked, resumable segment build --------------------------------
    chunk_docs = max(rsize, math.ceil(n_docs / max(n_chunks, 1) / rsize) * rsize)
    n_chunks_eff = max(1, math.ceil(n_docs / chunk_docs))
    # r6 (guide §2.2/§6): size the merge exchange from the DATA, not the
    # core count — ~2M postings (the merge kernel's flush unit) per
    # task, sum_dl as the per-chunk upper estimate; big corpora hit the
    # parallelism cap and keep full width. SMALL merges (work estimate
    # under ~half the bucket count of tasks) switch to BUCKET-hash
    # partitioning: up to n_buckets parallel merge tasks that still
    # write exactly ONE file per bucket dir — the fat-task shape this
    # replaced ran the whole merge on 1-2 cores for seconds while the
    # rest of the box idled, AND wrote tasks x buckets tiny files (577
    # measured in r5; the dictionary pass and every query scan paid the
    # per-file opens).
    merge_est = (sum_dl // max(n_chunks_eff, 1)) // (1 << 21) + 1
    merge_by_bucket = merge_est <= N_BUCKETS // 2
    merge_tasks = (min(par, N_BUCKETS) if merge_by_bucket
                   else max(1, min(par, merge_est)))
    manifest_dir = f"{out_dir}/manifest"
    done, attempts = (_manifest_state(spark, manifest_dir) if resume
                      else (set(), {}))

    _MANIFEST_SCHEMA = (
        "chunk int, status string, n_docs long, n_postings long, "
        "n_blocks long, bytes_out long, wall_ms long, attempt int, "
        "job_id string")
    built, skipped = 0, 0
    try:
          for cid in range(n_chunks_eff):
            if cid in done:
                skipped += 1
                continue
            tc0 = time.monotonic()
            att = attempts.get(cid, 0) + 1
            # journal the attempt BEFORE building: a crash mid-chunk leaves the
            # 'start' row, so the retry commits as attempt att+1 (file names are
            # attempt-unique — the journal is append-only)
            _write_small(
                spark, [(cid, "start", 0, 0, 0, 0, 0, att, job_id)],
                _MANIFEST_SCHEMA, manifest_dir, "append",
                f"{job_id}-{cid}-s{att}")
            lo, hi = cid * chunk_docs, (cid + 1) * chunk_docs
            chunk = docs_feat.where((F.col("doc_id") >= lo)
                                    & (F.col("doc_id") < hi))
            # ops 22/23, two-stage: per-partition combiner (no shuffle) then a
            # partials-only exchange + vectorized merge — the shuffle moves
            # ~2.5 B/posting of compressed runs instead of 26 B/posting rows.
            from ..operators.facets import append_facet_terms
            from ..operators.ranges import append_range_terms
            fterms, ftfs = append_facet_terms(F.col("f.terms"), F.col("f.tfs"),
                                              facets)
            fterms, ftfs = append_range_terms(fterms, ftfs, range_facets)
            feat_cols = chunk.select("doc_id", F.col("f.dl").alias("dl"),
                                     fterms.alias("terms"), ftfs.alias("tfs"))
            partials = build_partial_postings(feat_cols, rsize)
            seg = merge_segments(
                merge_partials_to_segments(partials, avgdl, codec=codec,
                                           block_size=block_size,
                                           num_partitions=merge_tasks,
                                           bucket_partition=merge_by_bucket))
            seg_dir = f"{out_dir}/segments/chunk={cid}"
            # lineage/metrics ride the write job itself (Observation = free
            # accumulator-based aggregates) — no read-back scan of the chunk
            from pyspark.sql import Observation
            obs = Observation(f"chunk{cid}")
            seg = seg.observe(
                obs,
                F.coalesce(F.sum("n_docs"), F.lit(0)).alias("n_postings"),
                F.count(F.lit(1)).alias("n_blocks"),
                F.coalesce(F.sum(F.length("docids_blob") + F.length("tfs_blob")
                                 + F.length("dls_blob")), F.lit(0))
                .alias("bytes_out"))
            # no extra layout shuffle: the encode stage's partitions are already
            # sorted by (term, salt), so each bucket=<b> file written here keeps
            # term-clustered rows → tight parquet min/max stats for the query
            # path's term row-group pruning.
            seg.write.mode("overwrite").partitionBy("bucket").parquet(seg_dir)
            _mark("segments_encode_write")
            m = obs.get
            row = [(cid, "done", int(min(hi, n_docs) - lo), int(m["n_postings"]),
                    int(m["n_blocks"]), int(m["bytes_out"]),
                    int((time.monotonic() - tc0) * 1000), att, job_id)]
            _write_small(spark, row, _MANIFEST_SCHEMA,
                         manifest_dir, "append", f"{job_id}-{cid}-d{att}")
            _mark("chunk_metrics_manifest")
            built += 1

    except BaseException:
        # a chunk failure must not orphan the in-flight docs write:
        # join it (best-effort) so no Spark job is still writing
        # out_dir when the caller sees the exception and cleans up
        try:
            docs_future.result()
        except Exception:
            pass
        _docs_pool.shutdown()
        raise

    docs_future.result()         # surface any docs-write failure here
    _docs_pool.shutdown()
    _mark("docs_write_join")

    # --- finalize: dictionary + meta from the committed segments ---------
    # chunk-layout guard (resume against a stale/mismatched layout) via a
    # filesystem listing — no Spark job
    sfs, spath = hadoop_fs(spark, f"{out_dir}/segments")
    found = {st.getPath().getName().split("=", 1)[1]
             for st in sfs.listStatus(spath)
             if st.isDirectory() and st.getPath().getName()
             .startswith("chunk=")}
    expected = {str(c) for c in range(n_chunks_eff)}
    if not found <= expected:   # resume against a different chunking layout
        raise ValueError(
            f"segments contain chunk dirs {sorted(found - expected)} outside "
            f"the current plan (n_chunks={n_chunks_eff}); refusing to "
            f"finalize a mixed index — rebuild with resume=False")
    seg_all = spark.read.option("basePath", f"{out_dir}/segments").parquet(
        f"{out_dir}/segments")
    # dictionary/ is a union of per-chunk PARTIALS (readers sum df/cf per
    # term — associative): a batch build writes one chunk=batch partial,
    # each streaming epoch adds its own chunk=stream<eid> partial, so
    # ingest never rewrites the full dictionary (O(epoch), SURVEY §2.10)
    # hash-repartition on bucket (r6, was repartitionByRange(bucket,
    # term)): the range exchange pays a driver-visible SAMPLING pass of
    # its input to pick boundaries (guide §2.4 — an exchange you can
    # remove); hashing on bucket alone needs no sample, AND it lands
    # every bucket's terms wholly in one task, so each bucket=<b> dir is
    # one term-sorted file with tight per-row-group term min/max stats
    # (range splitting could cut a bucket across two files). Same rows,
    # same per-file sort order — readers sum df/cf per term either way.
    (dictionary_from_segments(seg_all)
        .repartition(max(1, min(N_BUCKETS // 4, merge_tasks)), "bucket")
        .sortWithinPartitions("bucket", "term")
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(f"{out_dir}/dictionary/chunk=batch"))
    if positions:
        # one extra content pass (the extract projection dropped content
        # immediately, by design); opt-in, so the base build's cost and
        # byte-identity are untouched. Content re-joins ids here (the id
        # table broadcasts at small scale, SMJ on narrow keys at 10^12)
        # — the main pipeline no longer carries a content+id frame.
        from .positions import write_positions
        cdf = (spread.dropDuplicates(["repo", "path", "commit"])
               if n_keys != n_rows else spread)
        write_positions(spark,
                        cdf.join(ids, ["repo", "path", "commit"])
                        .select("doc_id", "content"), out_dir)
        _mark("positions_write")
    # total postings from the manifest journal — no second segment scan,
    # and no Spark job at all on a local filesystem (r6)
    n_postings = _manifest_postings_total(spark, manifest_dir)
    from ..operators.ranges import RANGE_STEP
    from .positions import meta_version
    meta = [(meta_version(positions), n_docs, float(avgdl),
             int(n_postings), int(rsize),
             int(block_size), codec, int(N_BUCKETS), int(n_chunks_eff),
             ",".join(facets), ",".join(range_facets), int(RANGE_STEP))]
    _write_small(
        spark, meta,
        "version int, n_docs long, avgdl double, n_postings long, "
        "range_size long, block_size int, codec string, "
        "n_buckets int, n_chunks int, facets string, "
        "range_facets string, range_step int",
        f"{out_dir}/meta", "overwrite", "meta")
    docs_feat.unpersist()
    if deferred_attach:
        feats_u.unpersist()        # held for the concurrent cache fill
    # release the id assignment's persisted key frame (held until here
    # because the positions path re-joins `ids` during finalize)
    _ids_cache = getattr(ids, "_donkey_source_cache", None)
    if _ids_cache is not None:
        _ids_cache.unpersist()
    _mark("dictionary_meta")
    return {"n_docs": n_docs, "avgdl": avgdl, "n_postings": n_postings,
            "range_size": rsize, "codec": codec, "n_chunks": n_chunks_eff,
            "chunks_built": built, "chunks_skipped": skipped,
            "phases": phases, "wall_s": time.monotonic() - t0}
