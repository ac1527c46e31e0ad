"""Sort-by-field search: the match set ordered by a document METADATA
column instead of BM25 relevance — the `sort: [{dl: desc}]` clause
every search UI grows ("newest first", "longest first"). donkey serves
hits ranked by score only; this is the §2.14 bulk-surface that turns
the distributed match set (plans/facet_counts.match_ids) into a
field-ordered page.

Plan shape (SCALE.md §15): the match set comes from the SAME pruned
per-salt kernel as match_count/match_ids — one bucket-dir +
term-row-group pruned segment scan, O(posting bytes touched), match
ids never materializing as scored rows — then joins the
COLUMN-PRUNED docs table (doc_id + sort key + identity columns, never
content) and runs through ``orderBy(key).limit(k)``, which Catalyst
executes as TakeOrderedAndProject: a k-heap per partition plus a
<= partitions*k driver merge, never a global sort shuffle. The join is
the honest cost of field sorting — every engine reads one doc value
per matching doc (Lucene doc-values work the same way) — and AQE
turns it into a broadcast join when the match set is selective.

Sortable columns are exactly the docs side-table's metadata schema
(doc_id, repo, path, commit, lang, dl, sha256 — plans/build.py
docs_write); sorting by a content-derived quantity that is not stored
is a build-time decision (add it as a docs column), not a query-time
one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: result row shape of sorted_topk_df (``key`` is cast to string so one
#: stable schema serves every sortable column; the rows variant keeps
#: the column's native type)
SORTED_SCHEMA = ("rank int, doc_id long, key string, repo string, "
                 "path string")


def _sorted_df(index, text: str, by: str, k: int, descending: bool,
               mode: str, filters: dict | None) -> DataFrame:
    """The un-ranked <=k-row frame: match ids joined to the pruned docs
    columns, field-ordered with the deterministic doc_id tie-break."""
    from .facet_counts import match_ids
    doc_cols = index._docs.columns
    if by not in doc_cols:
        raise ValueError(
            f"cannot sort by {by!r}: not a docs metadata column "
            f"(sortable: {sorted(doc_cols)})")
    ids = match_ids(index, text, mode, filters)
    key = F.col(by)
    order = [key.desc_nulls_last() if descending else key.asc_nulls_last(),
             F.asc("doc_id")]
    sel = list(dict.fromkeys(["doc_id", by, "repo", "path"]))
    return (index._docs.select(*sel)          # column-pruned, no content
            .join(ids, "doc_id")
            .orderBy(*order)                  # TakeOrderedAndProject
            .limit(int(k)))


def _rank_rows(rows: list[tuple], descending: bool) -> list[tuple]:
    """Deterministic 1..k ranking of (doc_id, key, repo, path) tuples on
    (key desc|asc nulls-last, doc_id asc) — type-agnostic: python's
    stable sort keeps the doc_id tie-break under ``reverse=``, and
    nulls sort last in BOTH directions (matching the plan's
    desc_nulls_last/asc_nulls_last)."""
    present = [r for r in rows if r[1] is not None]
    absent = sorted((r for r in rows if r[1] is None),
                    key=lambda r: r[0])
    present.sort(key=lambda r: r[0])
    present.sort(key=lambda r: r[1], reverse=descending)
    return [(rk, *r) for rk, r in enumerate(present + absent, start=1)]


def _local_ids_keys(index, ids, by: str):
    """Driver-local (doc_id, key) pyarrow table for the match ids —
    the doc-values read shared by field sorting and stats aggregation.
    When the docs table is small enough (n_docs × 16 B as the cheap
    pre-read gate, then the column pair's ACTUAL bytes — string keys
    can be many times 8 B/doc — both within ``local_bytes``) the pair
    is memoized on the Index sorted by doc_id, so each query is one
    searchsorted + one bounded take instead of a docs-table scan; an
    over-budget pair is used for the current query but NOT retained,
    and larger tables fall back to a per-query id-filtered two-column
    read. Identity columns are NOT read here — callers fetch
    (repo, path) for only their top-k through _doc_meta."""
    import numpy as np
    import pyarrow as pa
    cols = list(dict.fromkeys(["doc_id", by]))   # by may BE doc_id
    if index.n_docs * 16 <= index.local_bytes:
        memo = index.__dict__.setdefault("_sortkey_memo", {})
        ent = memo.get(by)
        if ent is None:
            t = index._pa_dataset("docs").to_table(columns=cols)
            did = np.asarray(t["doc_id"], dtype=np.int64)
            pos = np.argsort(did, kind="stable")
            ent = (did[pos],
                   t.column(by).combine_chunks().take(pa.array(pos)))
            # memoize only if the REAL footprint honors the budget the
            # 16 B/doc estimate promised (wide string keys break it)
            if ent[0].nbytes + ent[1].nbytes <= index.local_bytes:
                memo[by] = ent
        all_ids, all_keys = ent
        at = np.searchsorted(all_ids, ids)
        at[at == all_ids.size] = 0            # out-of-range guard...
        found = all_ids[at] == ids            # ...masked out here
        at, ids = at[found], ids[found]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "key": all_keys.take(pa.array(at))})
    import pyarrow.dataset as ds
    t = index._pa_dataset("docs").to_table(
        columns=cols, filter=ds.field("doc_id").isin(pa.array(ids)))
    return pa.table({"doc_id": t.column("doc_id"),
                     "key": t.column(by)})


def _local_key_rows(index, ids, by: str, k: int, descending: bool):
    """The driver-local (doc_id, key) top-k: _local_ids_keys
    pyarrow-sorted (nulls at end, doc_id ties ascending), sliced."""
    order = [("key", "descending" if descending else "ascending"),
             ("doc_id", "ascending")]
    return _local_ids_keys(index, ids, by).sort_by(order).slice(0, k)


def sorted_topk(index, text: str, by: str = "dl", k: int = 10,
                descending: bool = True, mode: str = "or",
                filters: dict | None = None) -> list[tuple]:
    """Top-k matching docs of ``text`` ordered by the docs column
    ``by`` — rows [(rank, doc_id, key, repo, path)], rank 1..k on
    (key desc|asc, doc_id). ``mode``/``filters`` are search's grammar
    (OR/AND match; equality / OR / NOT / range facets) and tombstoned
    docs are excluded — the result is EXACTLY ``search``'s match set
    re-ordered by the field, scores never computed.

    Like ranked search, a query whose posting bytes fit the index's
    ``local_bytes`` budget runs driver-local (the match_ids_local
    pyarrow path + an id-filtered docs read + a pyarrow sort — zero
    Spark jobs); over budget it runs the distributed plan above.
    Measured at 400k docs/32 cores the local path cuts the ~0.76
    s/query Spark-job floor to tens of ms (BENCH/BASELINE.md
    §Sort-by-field)."""
    from .facet_counts import match_ids_local
    doc_cols = index._docs.columns
    if by not in doc_cols:
        raise ValueError(
            f"cannot sort by {by!r}: not a docs metadata column "
            f"(sortable: {sorted(doc_cols)})")
    ids = match_ids_local(index, text, mode, filters)
    if ids is not None:
        if ids.size == 0:
            return []
        sub = _local_key_rows(index, ids, by, int(k), descending)
        top = sub["doc_id"].to_pylist()
        meta = index._doc_meta(top, use_local=True)
        return _rank_rows([(d, key, *meta.get(d, (None, None)))
                           for d, key in zip(top,
                                             sub["key"].to_pylist())],
                          descending)
    got = _sorted_df(index, text, by, k, descending, mode,
                     filters).collect()
    # re-rank on the driver (<= k rows): collect() order is the plan's,
    # but the rank must be deterministic by contract, not by physics
    return _rank_rows([(r["doc_id"], r[by], r["repo"], r["path"])
                       for r in got], descending)


def sorted_topk_df(index, text: str, by: str = "dl", k: int = 10,
                   descending: bool = True, mode: str = "or",
                   filters: dict | None = None) -> DataFrame:
    """DataFrame wrapper over sorted_topk (SORTED_SCHEMA; the key is
    stringified for a column-independent schema)."""
    rows = [(rk, did, None if key is None else str(key), repo, path)
            for rk, did, key, repo, path in
            sorted_topk(index, text, by, k, descending, mode, filters)]
    return index.spark.createDataFrame(rows, SORTED_SCHEMA)
