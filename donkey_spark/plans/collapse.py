"""Field collapsing — top-k GROUPS ranked by their best-scoring doc
(the ES ``collapse`` clause / Lucene grouping): "the 10 most relevant
REPOS for this query, each represented by its best file". donkey
serves flat hit lists; grouping is the §2.14 surface a code-search UI
and a per-source training-data sampler both need ("take the best doc
per repo, never two from the same repo").

Semantics (exact, never per-shard-approximate):

* a group = one distinct value of a docs metadata column (``by``);
  its score = the score of its best-scoring matching doc (ties on
  score broken by ascending doc_id, the engine-wide determinism
  rule); groups rank by that score, same tie-break on the
  representative's doc_id.
* a group's representative doc is chosen over the FULL match set —
  per-range/partition truncation would be group-blind and wrong, so
  the scorer runs with the per-range candidate bound lifted to the
  range size (every matching doc in a range scores; ranges partition
  docs, so the union IS the match set, each doc exactly once).
* ``group_hits`` = the group's total matching-doc count — exact,
  from the same frame that picked the representative.
* ``inner_hits`` = n returns each surviving group's top-n matching
  docs (ES inner_hits), ranked inside the group by (score desc,
  doc_id asc); n=1 (default) returns just the representative.
* composes with mode="or"/"and", the full facet/range filter
  grammar, tombstones, and min_match — whatever docs those exclude
  can neither represent nor count toward any group.

Plan shape at 10^12 files: one pruned segment scan → repartition by
salt → mapInArrow scorer emitting the scored match set (distributed,
never collected) → ONE column-pruned docs join on doc_id (the same
honest doc-values read plans/sortby.py pays; AQE broadcasts the
scored side when selective) → for inner_hits=1 a partial-aggregated
``groupBy(query, group).agg(max_by, count)`` whose shuffle carries
O(groups per partition) rows, not the match set → a window rank over
the ≤|groups| bests → ≤ Σk rows collect. inner_hits>1 swaps the
partial agg for one window pass over the joined frame (a sort by
(query, group, score) — the operation's honest cost; its output is
still truncated to n per group before the rank). Selective queries
take the DRIVER-LOCAL path instead (same cost gate as search: pruned
posting bytes ≤ local_bytes): the identical kernel scores in-process
and the group keys come from plans/sortby's memoized doc-values read
— zero Spark jobs per query.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: stable DataFrame shape for collapse_df (``grp`` is cast to string so
#: one schema serves every groupable column; collapse_rows keeps the
#: column's native type)
COLLAPSE_SCHEMA = ("query_id int, rank int, grp string, hit_rank int, "
                   "doc_id long, score double, group_hits long, "
                   "repo string, path string")


def _docs_on_qspark(index) -> DataFrame:
    """The docs side-table read on the Index's ISOLATED query session —
    the scored frame comes from ``index._seg`` (a ``_qspark``
    DataFrame) and Spark cannot join frames across sessions. Memoized
    per Index like the other table handles."""
    if "_docs_q" not in index.__dict__:
        index.__dict__["_docs_q"] = index._qspark.read.parquet(
            f"{index.dir}/docs")
    return index.__dict__["_docs_q"]


def _validate_by(index, by: str) -> None:
    doc_cols = index._docs.columns
    if by not in doc_cols or by == "doc_id":
        groupable = sorted(c for c in doc_cols if c != "doc_id")
        raise ValueError(f"cannot collapse on {by!r}: not a docs "
                         f"metadata column (groupable: {groupable})")


def _rank_local(cand: list[tuple], key_of, ks: dict[int, int],
                inner_hits: int) -> list[tuple]:
    """Driver-local grouping of (qid, doc_id, score) candidates:
    returns (qid, rank, grp, hit_rank, doc_id, score, group_hits)
    with the same ordering contract as the distributed path."""
    by_q: dict[int, list] = {}
    for qid, did, sc in cand:
        by_q.setdefault(qid, []).append((did, sc))
    out = []
    for qid in sorted(by_q):
        ids = np.array([d for d, _ in by_q[qid]], dtype=np.int64)
        scs = np.array([s for _, s in by_q[qid]], dtype=np.float64)
        keys = key_of(ids)
        live = np.array([k is not None for k in keys], dtype=bool)
        if not live.all():          # docs rows missing the column
            ids, scs, keys = ids[live], scs[live], keys[live]
        if ids.size == 0:
            continue
        _, ginv = np.unique(keys, return_inverse=True)
        hits = np.bincount(ginv)
        order = np.lexsort((ids, -scs))       # ranking order
        # first occurrence of each group along `order` = its best doc,
        # and those positions sorted ascending = groups in rank order
        _, first = np.unique(ginv[order], return_index=True)
        best = order[np.sort(first)]
        for rk, pos in enumerate(best[:ks[qid]], start=1):
            g = keys[pos]
            out.append((qid, rk, g, 1, int(ids[pos]), float(scs[pos]),
                        int(hits[ginv[pos]])))
            if inner_hits > 1:
                member = order[ginv[order] == ginv[pos]]
                for hr, p in enumerate(member[1:inner_hits], start=2):
                    out.append((qid, rk, g, hr, int(ids[p]),
                                float(scs[p]), int(hits[ginv[pos]])))
    return out


def collapse_rows(index, queries: list[tuple[int, str, int]],
                  by: str = "repo", mode: str = "or",
                  filters: dict | None = None,
                  inner_hits: int = 1,
                  stats: dict | None = None,
                  min_match: int | dict | None = None) -> list[tuple]:
    """queries: [(query_id, text, k)] where k counts GROUPS — returns
    fully-materialized rows [(query_id, rank, group, hit_rank, doc_id,
    score, group_hits, repo, path)] sorted by (query_id, rank,
    hit_rank). rank is the group's rank (by its best doc's score,
    ties on the representative's doc_id); hit_rank 1..inner_hits ranks
    docs INSIDE the group (1 = the representative). ``stats`` /
    ``min_match``: search_rows' contracts (stats feeds the sharded
    federation)."""
    from .query import _make_arrow_scorer, _make_group_scorer  # noqa: F401
    from .query import (_PRECOMPUTE_MIN_QUERIES, _validate_min_match,
                        group_mixed_specs)  # noqa: F401
    _validate_by(index, by)
    if inner_hits < 1:
        raise ValueError("inner_hits must be >= 1")
    min_match = _validate_min_match(min_match, queries, mode)
    # the per-range candidate bound is lifted to range_size (score the
    # whole match set); the caller's k truncates GROUPS at the end
    plan = index._plan_search(
        [(qid, text, index.range_size) for qid, text, _ in queries],
        mode, filters, stats, min_match=min_match)
    if plan is None:
        return []
    ks = {qid: k for qid, _, k in queries}
    qplan, idf_map = plan["qplan"], plan["idf_map"]
    needed, buckets = plan["needed"], plan["buckets"]
    required, use_local = plan["required"], plan["use_local"]
    avgdl, pot_scale = plan["avgdl"], plan["pot_scale"]

    if use_local:
        from .sortby import _local_ids_keys
        scorer = _make_group_scorer(qplan, idf_map, mode,
                                    index.range_size, avgdl,
                                    index._tombstones, required,
                                    pot_scale, plan["trees"],
                                    None, None, min_match)
        cand = index._local_candidates(
            needed, buckets, scorer,
            prefill=len(qplan) >= _PRECOMPUTE_MIN_QUERIES, avgdl=avgdl)
        if not cand:
            return []
        all_ids = np.unique(np.array([d for _, d, _ in cand],
                                     dtype=np.int64))
        kt = _local_ids_keys(index, all_ids, by)
        kt_ids = np.asarray(kt["doc_id"], dtype=np.int64)
        kt_keys = kt.column("key").to_pylist()
        if kt_ids.size and np.any(kt_ids[1:] < kt_ids[:-1]):
            # the over-budget fallback read returns file order, not id
            # order — key_of's searchsorted needs ascending ids
            pos = np.argsort(kt_ids, kind="stable")
            kt_ids = kt_ids[pos]
            kt_keys = [kt_keys[p] for p in pos]

        def key_of(ids: np.ndarray):
            at = np.searchsorted(kt_ids, ids)
            at[at == kt_ids.size] = 0
            ok = kt_ids[at] == ids
            return np.array([kt_keys[a] if o else None
                             for a, o in zip(at, ok)], dtype=object)

        grouped = _rank_local(cand, key_of, ks, inner_hits)
    else:
        grouped = _collapse_distributed(index, plan, by, ks, inner_hits,
                                        mode, min_match)
    if not grouped:
        return []
    meta = index._doc_meta(sorted({r[4] for r in grouped}), use_local)
    return [(qid, rk, g, hr, d, s, n, *meta.get(d, (None, None)))
            for qid, rk, g, hr, d, s, n in sorted(
                grouped, key=lambda r: (r[0], r[1], r[3]))]


def _collapse_distributed(index, plan, by: str, ks: dict[int, int],
                          inner_hits: int, mode: str,
                          min_match) -> list[tuple]:
    """The distributed grouping: scored match set (mapInArrow, per-range
    bound lifted) ⋈ column-pruned docs → group bests → window rank →
    ≤ Σk·inner_hits rows on the driver."""
    from pyspark.sql import Window

    from .query import _SEG_COLS, _make_arrow_scorer
    score_arrow = _make_arrow_scorer(
        plan["qplan"], plan["idf_map"], mode, index.range_size,
        index.codec, plan["avgdl"], index._tombstones_bc,
        plan["required"], plan["pot_scale"], plan["trees"],
        None, None, min_match)
    seg = (index._seg
           .where(F.col("bucket").isin(plan["buckets"])
                  & F.col("term").isin(plan["needed"]))
           .select(*_SEG_COLS))
    scored = seg.repartition("salt").mapInArrow(
        score_arrow, "query_id int, doc_id long, score double")
    docs = _docs_on_qspark(index).select("doc_id", F.col(by).alias("grp"))
    # the (doc_id, grp) pair is ~32 B/doc; under the same 64 MB gate
    # the tombstone-compact join uses, broadcasting it turns the join
    # into a map-side hash probe — the scored match set (the BIG side,
    # up to corpus-sized for hot queries) then never shuffles for the
    # join at all. Past the gate (10^9+ docs per index) it falls back
    # to the ordinary co-shuffled join.
    if index.n_docs * 32 <= (64 << 20):
        docs = F.broadcast(docs)
    joined = scored.join(docs, "doc_id").where(F.col("grp").isNotNull())
    ksdf = index._qspark.createDataFrame(list(ks.items()),
                                         "query_id int, k int")
    wq = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                                F.asc("doc_id"))
    if inner_hits == 1:
        # partial-aggregated shuffle: O(groups per partition) rows
        best = (joined.groupBy("query_id", "grp")
                .agg(F.max_by(F.struct(F.col("score"), F.col("doc_id")),
                              F.struct(F.col("score"),
                                       (-F.col("doc_id")).alias("nd"))
                              ).alias("best"),
                     F.count(F.lit(1)).alias("group_hits"))
                .select("query_id", "grp",
                        F.col("best.score").alias("score"),
                        F.col("best.doc_id").alias("doc_id"),
                        "group_hits"))
        top = (best.withColumn("rank", F.row_number().over(wq))
               .join(F.broadcast(ksdf), "query_id")
               .where(F.col("rank") <= F.col("k")))
        rows = _collect_sized(index, top)
        return [(r["query_id"], r["rank"], r["grp"], 1, r["doc_id"],
                 r["score"], r["group_hits"]) for r in rows]
    # inner_hits > 1: one window pass ranks docs INSIDE each group and
    # counts it; the group rank then comes from the hit_rank=1 rows
    wg = Window.partitionBy("query_id", "grp").orderBy(F.desc("score"),
                                                       F.asc("doc_id"))
    wgc = Window.partitionBy("query_id", "grp")
    per = (joined.withColumn("hit_rank", F.row_number().over(wg))
           .withColumn("group_hits", F.count(F.lit(1)).over(wgc))
           .where(F.col("hit_rank") <= inner_hits))
    ranked = (per.where(F.col("hit_rank") == 1)   # the representatives
              .withColumn("rank", F.row_number().over(wq))
              .join(F.broadcast(ksdf), "query_id")
              .where(F.col("rank") <= F.col("k"))
              .select("query_id", "grp", "rank"))
    hits = (per.join(ranked, ["query_id", "grp"])
            .select("query_id", "rank", "grp", "hit_rank", "doc_id",
                    "score", "group_hits"))
    rows = _collect_sized(index, hits)
    return [(r["query_id"], r["rank"], r["grp"], r["hit_rank"],
             r["doc_id"], r["score"], r["group_hits"]) for r in rows]


def _collect_sized(index, df: DataFrame) -> list:
    """Collect a bounded result frame under the query session's scan
    split sizing (search_rows' fallback contract when the isolated
    child session is unavailable)."""
    spark = index.spark
    if index._qspark is not spark:
        return df.collect()
    _MPB = "spark.sql.files.maxPartitionBytes"
    prev = spark.conf.get(_MPB)
    spark.conf.set(_MPB, index.scan_partition_bytes)
    try:
        return df.collect()
    finally:
        spark.conf.set(_MPB, prev)


def collapse_topk(index, text: str, by: str = "repo", k: int = 10,
                  mode: str = "or", filters: dict | None = None,
                  inner_hits: int = 1,
                  min_match: int | None = None) -> list[tuple]:
    """Single-query convenience: [(rank, group, hit_rank, doc_id,
    score, group_hits, repo, path)]."""
    return [r[1:] for r in collapse_rows(
        index, [(0, text, k)], by=by, mode=mode, filters=filters,
        inner_hits=inner_hits, min_match=min_match)]


def collapse_df(index, queries: list[tuple[int, str, int]],
                by: str = "repo", **kw) -> DataFrame:
    """DataFrame form of collapse_rows (COLLAPSE_SCHEMA; grp cast to
    string so one schema serves every groupable column)."""
    rows = [(qid, rk, None if g is None else str(g), hr, d, s, n, rp, pt)
            for qid, rk, g, hr, d, s, n, rp, pt
            in collapse_rows(index, queries, by=by, **kw)]
    return index.spark.createDataFrame(rows, COLLAPSE_SCHEMA)
