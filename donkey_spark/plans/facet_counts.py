"""Facet histograms over a query's match set — the counts a search UI
shows next to its filters ("lang: py (1,204) · java (312) · …").

Counting needs the FULL match set, not the top-k, so this is its own
path beside the scorer — built from the same pruned artifacts:

* term df and facet-value enumeration come from the dictionary (the
  value list is one dictionary scan filtered on the ``\\x01<col>=``
  presence-tag prefix; pass ``values=`` to skip it on hot paths);
* postings come from the SAME bucket-dir + term row-group pruned
  segment scan queries use, repartitioned by salt;
* per salt, one Arrow kernel decodes the query terms' doc-id blocks
  (union for OR, intersection for AND), drops tombstoned ids, and
  counts each facet presence posting's overlap — emitting one
  (value, count) row per (salt, value), so the shuffle that follows
  carries O(salts × values) rows regardless of corpus size.

No scores are computed and no doc rows are materialized: the match set
exists only as per-salt int64 arrays inside the kernel.

Every surface here also accepts ``mode="pattern"``: pattern atoms in
the query text (prefix ``va*``, fuzzy ``joun~1``, wildcard ``va*ble``,
regexp ``/v[0-9]+_err/``) expand against the dictionary exactly as
search_rows_pattern expands them, and the surface runs the resulting
plain OR query — count / stats / export / facet-navigate / delete over
"everything matching a pattern", the grep-then-act shape of a
source-code corpus pipeline, with zero kernel change (the expansion IS
a term list).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokenize_py
from ..kernels.blocks import decode_doc_ids
from ..operators.facets import FACET_PREFIX, facet_term
from ..operators.postings import term_bucket_py


def _tag_values_multi(index, prefixes: list[str]) -> dict[str, list[str]]:
    """Distinct dictionary-term suffixes under MANY presence-tag
    prefixes in ONE dictionary scan (vocabulary-sized, not
    corpus-sized) — the multi-facet histogram enumerates all its
    columns' values for the cost of one job (r5 review; the module
    contract promises one scan)."""
    d = index._dict
    active = index._active_dict_chunks()
    if active is not None:
        d = d.where(F.col("chunk").isin(active))
    cond = F.col("term").startswith(prefixes[0])
    for p in prefixes[1:]:
        cond = cond | F.col("term").startswith(p)
    rows = d.where(cond).select("term").distinct().collect()
    out: dict[str, list[str]] = {p: [] for p in prefixes}
    # longest prefix first: "\x01c=" must not claim "\x01c=..." tags
    # that a longer sibling prefix (never overlapping in practice) owns
    for r in rows:
        t = r["term"]
        for p in sorted(prefixes, key=len, reverse=True):
            if t.startswith(p):
                out[p].append(t[len(p):])
                break
    return {p: sorted(v) for p, v in out.items()}


def _tag_values(index, prefix: str) -> list[str]:
    """Single-prefix form of ``_tag_values_multi``."""
    return _tag_values_multi(index, [prefix])[prefix]


def facet_values(index, facet: str) -> list[str]:
    """Distinct indexed values of an equality-facet column, from the
    dictionary's presence tags."""
    return _tag_values(index, f"{FACET_PREFIX}{facet}=")


def _compile_filters(index, filters: dict | None
                     ) -> list[tuple[str, list[str]]]:
    """The filter-spec -> presence-tag-group compilation, shared by the
    equality and binned histogram surfaces (and, through
    operators.facets.resolve_filter_groups, with the scorer itself)."""
    if not filters:
        return []
    from ..operators.facets import resolve_filter_groups
    return resolve_filter_groups(
        filters, index.facets, index.range_facets, index.range_step)


def _expand_pattern_text(index, text: str, mode: str) -> tuple[str, str]:
    """``mode="pattern"`` support shared by every match-set surface:
    pattern atoms in ``text`` expand against the dictionary exactly as
    search does (same grammar, df ranking and cap —
    plans/query.resolve_pattern_terms), and the surface then runs the
    resulting plain OR query. Sound because expanded terms ARE
    dictionary tokens: re-tokenizing the joined text yields exactly
    literal ∪ expanded terms. Any other mode passes through."""
    if mode != "pattern":
        return text, mode
    (_, terms, _), = index.resolve_pattern_terms([(0, text, 1)])
    return " ".join(terms), "or"


def facet_counts(index, text: str, facet, mode: str = "or",
                 values: list | None = None,
                 filters: dict | None = None) -> DataFrame:
    """Facet histogram over the match set of ``text`` (OR: any term;
    AND: every term). ``facet`` is one column name → (value, n_docs)
    rows, or a sequence of column names → (facet, value, n_docs) rows
    counting EVERY listed column in the same single pass over the
    query postings (what a search UI renders: all filter groups at
    once, one scan). Docs without a facet column are not counted under
    it (they have no presence posting — the same semantics equality
    filters use). ``values=`` (single-facet form only) skips the
    value-enumeration scan.

    ``filters=`` applies the SAME facet-filter grammar as search
    (equality / OR list / {"not": [...]} / {"range": [lo, hi]} and its
    negation over range-facet columns): counts are taken over the
    FILTERED match set — faceted-navigation semantics, where the
    histogram of one column respects the selections active on the
    others. Filter masks intersect inside the same per-salt kernel
    (id-array set ops over the already-fetched presence postings), so
    no join or extra scan appears. The compilation to presence tags is
    SHARED with the scorer (operators/facets.resolve_filter_groups), so
    a spec admits the same docs here as in search. To histogram a
    range-facet column itself, use ``range_counts`` (binned)."""
    multi = not isinstance(facet, str)
    facets = list(facet) if multi else [facet]
    if multi and values is not None:
        raise ValueError("values= applies to the single-facet form")
    as_range = sorted(set(facets) & set(index.range_facets))
    if as_range:
        raise ValueError(
            f"{as_range} are range facets — their values are trie "
            f"nodes, not enumerable equality tags; use range_counts() "
            f"for a binned histogram")
    unknown = sorted(set(facets) - set(index.facets))
    if unknown:
        raise ValueError(
            f"index has no facet(s) {unknown}; built with "
            f"facets={index.facets or '()'}")
    text, mode = _expand_pattern_text(index, text, mode)
    if mode not in ("or", "and"):
        raise ValueError(mode)
    fgroups = _compile_filters(index, filters)
    spark = index.spark
    schema = ("facet string, value string, n_docs long" if multi
              else "value string, n_docs long")
    empty = spark.createDataFrame([], schema)
    def _tags():
        if values is not None:
            return [facet_term(facets[0], v) for v in values]
        by_pref = _tag_values_multi(
            index, [f"{FACET_PREFIX}{f}=" for f in facets])
        return [facet_term(f, v) for f in facets
                for v in by_pref[f"{FACET_PREFIX}{f}="]]

    agg = _count_tag_overlaps(index, text, mode, fgroups, _tags)
    if agg is None:
        return empty
    split = F.split(F.col("tag"), "=", 2)
    if multi:
        return agg.select(split.getItem(0).alias("facet"),
                          split.getItem(1).alias("value"), "n_docs")
    return agg.select(split.getItem(1).alias("value"), "n_docs")


def range_counts(index, text: str, facet: str, shift: int,
                 mode: str = "or",
                 filters: dict | None = None) -> DataFrame:
    """Binned histogram of a RANGE-facet column over a query's match
    set — the numeric-slider counts a search UI shows ("size: 0–255
    (1,204) · 256–511 (312) · …"), for free from the trie: every doc's
    value is indexed under exactly one node tag per precision level
    (operators/ranges.py), so counting the level-``shift`` tags yields
    DISJOINT, COMPLETE bins of width 2^shift over the non-null docs.
    No per-value enumeration ever happens — the tag set at a level is
    bounded by the corpus's value spread / 2^shift, not its cardinality.

    ``shift`` picks the zoom (bin width 2^shift); it must be one of the
    indexed levels — a multiple of the index's range_step in [0, 64).
    Level 0 is exact values: cardinality-bounded, usually NOT what a UI
    wants. Returns (bin_lo, bin_hi, n_docs) with inclusive signed
    bounds; docs with a NULL column are not counted (same semantics as
    facet_counts). ``mode``/``filters`` as in facet_counts — the same
    shared spec compilation, so a slider histogram can respect the
    other active selections (including another range filter)."""
    if facet in index.facets:
        raise ValueError(
            f"{facet!r} is an equality facet; use facet_counts()")
    if facet not in index.range_facets:
        raise ValueError(
            f"index has no range facet {facet!r}; built with "
            f"range_facets={index.range_facets or '()'}")
    step = index.range_step
    if (not isinstance(shift, int) or isinstance(shift, bool)
            or not 0 <= shift < 64 or shift % step):
        raise ValueError(
            f"shift must be an indexed trie level — a multiple of "
            f"range_step={step} in [0, 64) — got {shift!r}")
    text, mode = _expand_pattern_text(index, text, mode)
    if mode not in ("or", "and"):
        raise ValueError(mode)
    fgroups = _compile_filters(index, filters)
    empty = index.spark.createDataFrame(
        [], "bin_lo long, bin_hi long, n_docs long")
    prefix = f"{FACET_PREFIX}{facet}#{shift}="
    agg = _count_tag_overlaps(
        index, text, mode, fgroups,
        lambda: [prefix + v for v in _tag_values(index, prefix)])
    if agg is None:
        return empty
    # tag = "col#<shift>=<HEX prefix>"; signed bin_lo = (prefix <<
    # shift) - 2^63 (undoing the sortable bias). conv() reads the hex
    # as unsigned 64-bit and emits a decimal STRING, so the arithmetic
    # runs in decimal and only the final (in-int64-range) value casts
    width = 1 << shift
    # width as a decimal via string: at the top trie level (shift 63,
    # reachable when range_step divides 63) 2^63 exceeds a Java long
    # and F.lit(width) would raise in py4j — same routing as the bias
    ulo = (F.conv(F.split(F.col("tag"), "=", 2).getItem(1), 16, 10)
           .cast("decimal(21,0)")
           * F.lit(str(width)).cast("decimal(21,0)"))
    # 2^63 exceeds a Java long literal — route the bias through a string
    bias = F.lit(str(1 << 63)).cast("decimal(21,0)")
    bin_lo = (ulo - bias).cast("long")
    return agg.select(bin_lo.alias("bin_lo"),
                      (bin_lo + F.lit(width - 1)).alias("bin_hi"),
                      "n_docs")


def match_count(index, text: str, mode: str = "or",
                filters: dict | None = None) -> int:
    """Total hits of ``text`` — the "About 1,204 results" number a
    search UI shows above the first page. OR: docs containing any
    query term; AND: docs containing every term; ``filters=`` is the
    same facet grammar as search (equality / OR / NOT / range), and
    tombstoned docs are excluded — so the count is EXACTLY the number
    of rows ``search(text, k=∞, filters=...)`` would rank. Runs the
    same per-salt counting kernel as facet_counts with zero histogram
    tags: one pruned segment scan, match sets existing only as int64
    arrays inside the kernel, one (salt-count)-row aggregate out —
    never a scored materialization of the match set."""
    text, mode = _expand_pattern_text(index, text, mode)
    if mode not in ("or", "and"):
        raise ValueError(mode)
    arrs, fgroups = _salt_matches_local(index, text, mode, filters)
    if arrs is not None:           # within the driver-local budget:
        # the count needs only the per-salt sizes (salts partition the
        # id space) — no concat, no sort
        return int(sum(a.size for a in arrs))
    agg = _count_tag_overlaps(index, text, mode, fgroups,
                              lambda: [], count_total=True)
    if agg is None:
        return 0
    got = agg.agg(F.coalesce(F.sum("n_docs"), F.lit(0))).collect()[0][0]
    return int(got)


_NUMERIC_DTYPES = frozenset(
    ("tinyint", "smallint", "int", "bigint", "float", "double"))


def _require_numeric_column(index, by: str, caller: str) -> None:
    """Shared argument check for the doc-values aggregations: ``by``
    must be a NUMERIC docs metadata column."""
    dtype = dict(index._docs.dtypes).get(by)
    if dtype is None:
        raise ValueError(
            f"{caller}: cannot aggregate {by!r}: not a docs metadata "
            f"column (available: {sorted(dict(index._docs.dtypes))})")
    # exact names + the parameterized decimal(p,s) — a bare prefix test
    # would also accept "interval day to second" via "int"
    if not (dtype in _NUMERIC_DTYPES or dtype.startswith("decimal(")):
        raise ValueError(
            f"{caller}: cannot aggregate {by!r}: column is {dtype}, "
            f"not numeric")


def match_stats(index, text: str, by: str = "dl", mode: str = "or",
                filters: dict | None = None) -> dict:
    """Numeric summary of the match set over a docs metadata column —
    the ES ``stats`` aggregation (min/max/sum/avg/count of file size,
    line count, ... over everything matching a query), the number a
    dashboard or a numeric-slider UI needs WITHOUT materializing the
    match set. Returns ``{"n_docs", "n_values", "sum", "min", "max",
    "avg"}``: n_docs is the match-set size (== match_count — same
    per-salt kernel, same mode/filter grammar, same tombstone mask),
    n_values counts docs with a non-NULL ``by`` value, and
    min/max/sum/avg aggregate those (None when n_values is 0, the
    empty-match or all-NULL case).

    Cost shape mirrors sorted_topk's: within the ``local_bytes``
    budget, one bounded pyarrow read (the memoized doc-values pair
    sortby shares) + pyarrow.compute aggregation — zero Spark jobs;
    over budget, the distributed match-ids frame joins the
    column-pruned docs table into a single count/sum/min/max agg (one
    shuffle of int64 ids, the same doc-values read every engine pays,
    broadcast when selective)."""
    _require_numeric_column(index, by, "match_stats")
    text, mode = _expand_pattern_text(index, text, mode)
    arrs, fgroups = _salt_matches_local(index, text, mode, filters)
    if arrs is not None:           # driver-local doc-values path
        n_docs = int(sum(a.size for a in arrs))
        if n_docs == 0:
            return {"n_docs": 0, "n_values": 0, "sum": None,
                    "min": None, "max": None, "avg": None}
        import pyarrow.compute as pc
        from .sortby import _local_ids_keys
        keys = _local_ids_keys(
            index, np.sort(np.concatenate(arrs)), by)["key"]
        n_vals = int(pc.count(keys).as_py())
        if n_vals == 0:
            return {"n_docs": n_docs, "n_values": 0, "sum": None,
                    "min": None, "max": None, "avg": None}
        mm = pc.min_max(keys)
        s = pc.sum(keys).as_py()
        return {"n_docs": n_docs, "n_values": n_vals, "sum": s,
                "min": mm["min"].as_py(), "max": mm["max"].as_py(),
                "avg": s / n_vals}
    ids = _match_ids_distributed(index, text, mode, fgroups)
    if ids is None:
        return {"n_docs": 0, "n_values": 0, "sum": None,
                "min": None, "max": None, "avg": None}
    cols = list(dict.fromkeys(["doc_id", by]))   # by may BE doc_id
    row = (index._docs.select(*cols)             # column-pruned
           .join(ids, "doc_id")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.count(by).alias("n_values"),
                F.sum(by).alias("sum"),
                F.min(by).alias("min"),
                F.max(by).alias("max")).collect()[0])
    n_vals = int(row["n_values"])
    return {"n_docs": int(row["n_docs"]), "n_values": n_vals,
            "sum": row["sum"], "min": row["min"], "max": row["max"],
            "avg": (row["sum"] / n_vals) if n_vals else None}


def _check_qs(qs) -> list[float]:
    out = [float(q) for q in qs]
    if not out or any(not (0.0 <= q <= 1.0) for q in out):
        raise ValueError(f"percentile fractions must lie in [0, 1], "
                         f"got {list(qs)!r}")
    return out


def match_cardinality(index, text: str, by: str = "repo",
                      mode: str = "or",
                      filters: dict | None = None) -> dict:
    """EXACT distinct-value count of a docs metadata column over the
    match set — the ES ``cardinality`` aggregation ("how many REPOS
    contain a match for this query"), exact where ES serves an HLL
    estimate: the distinct set here is bounded by the column's
    cardinality, never the corpus, so exactness costs one
    partial-aggregated distinct instead of a sketch. Returns
    ``{"n_docs", "n_values", "cardinality"}`` — n_docs is the
    match-set size (== match_count, same kernel/modes/filters/
    tombstones), n_values counts matching docs with a non-NULL ``by``
    and cardinality their distinct values (SQL count(DISTINCT col)
    semantics: NULL is not a value).

    Cost shape mirrors match_stats: within ``local_bytes`` one bounded
    pyarrow read of the memoized doc-values pair + count_distinct —
    zero Spark jobs; over budget the distributed match-ids frame joins
    the column-pruned docs table into one count/countDistinct agg
    (map-side partial aggregation collapses each partition to its
    distinct values before the exchange)."""
    doc_cols = index._docs.columns
    if by not in doc_cols:
        raise ValueError(f"match_cardinality: {by!r} is not a docs "
                         f"metadata column (available: "
                         f"{sorted(doc_cols)})")
    text, mode = _expand_pattern_text(index, text, mode)
    arrs, fgroups = _salt_matches_local(index, text, mode, filters)
    if arrs is not None:           # driver-local doc-values path
        n_docs = int(sum(a.size for a in arrs))
        if n_docs == 0:
            return {"n_docs": 0, "n_values": 0, "cardinality": 0}
        import pyarrow.compute as pc
        from .sortby import _local_ids_keys
        keys = _local_ids_keys(
            index, np.sort(np.concatenate(arrs)), by)["key"]
        return {"n_docs": n_docs,
                "n_values": int(pc.count(keys).as_py()),
                "cardinality": int(pc.count_distinct(
                    keys, mode="only_valid").as_py())}
    ids = _match_ids_distributed(index, text, mode, fgroups)
    if ids is None:
        return {"n_docs": 0, "n_values": 0, "cardinality": 0}
    cols = list(dict.fromkeys(["doc_id", by]))
    row = (index._docs.select(*cols)             # column-pruned
           .join(ids, "doc_id")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.count(by).alias("n_values"),
                F.countDistinct(by).alias("cardinality"))
           .collect()[0])
    return {"n_docs": int(row["n_docs"]),
            "n_values": int(row["n_values"]),
            "cardinality": int(row["cardinality"])}


def match_percentiles(index, text: str, by: str = "dl",
                      qs=(0.25, 0.5, 0.75, 0.95), mode: str = "or",
                      filters: dict | None = None) -> dict:
    """EXACT percentiles of a numeric docs column over the match set —
    the ES ``percentiles`` aggregation ("median file size of everything
    matching", the p95 a latency/size SLO dashboard plots). Returns
    ``{"n_docs", "n_values", "percentiles": {q: value}}``; values are
    linearly interpolated at rank q·(n−1) over the non-NULL sorted
    values (the numpy/Spark/DuckDB ``quantile_cont`` convention — all
    three agree, which is what makes the oracle exact), None when the
    match set is empty or all-NULL.

    Shares the T27/T33 match kernel (same modes, filter grammar,
    tombstone mask — the count, the stats and the percentiles can
    never disagree on what matches) and the cost shape: within
    ``local_bytes``, the memoized doc-values read + one numpy
    ``quantile`` — zero Spark jobs; over budget, the distributed
    match-ids frame joins the column-pruned docs table into ONE
    ``percentile`` aggregate (Spark's exact implementation — an
    ordered counts map per partition, merged once; memory O(distinct
    values of ``by``), which for doc-length-like columns is tiny at
    any corpus size)."""
    qs = _check_qs(qs)
    _require_numeric_column(index, by, "match_percentiles")
    text, mode = _expand_pattern_text(index, text, mode)
    empty = {"n_docs": 0, "n_values": 0,
             "percentiles": {q: None for q in qs}}
    arrs, fgroups = _salt_matches_local(index, text, mode, filters)
    if arrs is not None:           # driver-local doc-values path
        n_docs = int(sum(a.size for a in arrs))
        if n_docs == 0:
            return empty
        from .sortby import _local_ids_keys
        keys = _local_ids_keys(
            index, np.sort(np.concatenate(arrs)), by)["key"]
        vals = keys.combine_chunks().drop_null().to_numpy(
            zero_copy_only=False).astype(np.float64)
        if vals.size == 0:
            return {**empty, "n_docs": n_docs}
        pct = np.quantile(vals, qs)     # linear interpolation (default)
        return {"n_docs": n_docs, "n_values": int(vals.size),
                "percentiles": dict(zip(qs, (float(p) for p in pct)))}
    ids = _match_ids_distributed(index, text, mode, fgroups)
    if ids is None:
        return empty
    cols = list(dict.fromkeys(["doc_id", by]))   # by may BE doc_id
    row = (index._docs.select(*cols)             # column-pruned
           .join(ids, "doc_id")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.count(by).alias("n_values"),
                F.percentile(F.col(by).cast("double"),
                             F.array(*[F.lit(q) for q in qs]))
                .alias("pct")).collect()[0])
    n_vals = int(row["n_values"])
    if int(row["n_docs"]) == 0:
        return empty
    if n_vals == 0:
        return {**empty, "n_docs": int(row["n_docs"])}
    return {"n_docs": int(row["n_docs"]), "n_values": n_vals,
            "percentiles": dict(zip(qs, (float(p) for p in row["pct"])))}


_EMPTY_IDS = np.empty(0, dtype=np.int64)


def _salt_ids_fn(by_term: dict, blobs, codec: str):
    """Memoized per-salt term -> sorted-unique doc-id array decoder. A
    tag that is BOTH an active filter and a histogram target (faceted
    navigation's normal shape) decodes once, not once per role; unique
    (not just sort) because a facet tag refreshed by add_facet AND
    indexed inline by a later epoch carries the same doc in two chunks
    — a duplicate id would double-count the doc."""
    memo: dict[str, np.ndarray] = {}

    def ids_of(t):
        got = memo.get(t)
        if got is None:
            got = memo[t] = np.unique(np.concatenate(
                [decode_doc_ids(blobs[i].as_py(), codec)
                 for i in by_term[t]]))
        return got
    return ids_of


def _salt_match(ids_of, by_term: dict, qset: frozenset, n_q: int,
                mode_and: bool, tomb, fgroups) -> np.ndarray:
    """One salt's match set: the query terms' doc ids (union for OR,
    intersection for AND), tombstones dropped, filter groups applied
    ('any' intersects the group union, 'not' subtracts it). Shared by
    the histogram/count kernel and the id-emitting kernel so the two
    can never disagree on what matches."""
    q_present = [t for t in by_term if t in qset]
    if not q_present or (mode_and and len(q_present) < n_q):
        return _EMPTY_IDS
    if mode_and:
        matched = ids_of(q_present[0])
        for t in q_present[1:]:
            matched = np.intersect1d(matched, ids_of(t),
                                     assume_unique=True)
            if matched.size == 0:
                return _EMPTY_IDS
    else:
        matched = np.unique(np.concatenate(
            [ids_of(t) for t in q_present]))
    if matched.size and tomb is not None and tomb.size:
        j = np.searchsorted(tomb, matched)
        j[j == tomb.size] = tomb.size - 1
        matched = matched[tomb[j] != matched]
    if matched.size == 0:
        return _EMPTY_IDS
    for kind, g in fgroups:
        present = [t for t in g if t in by_term]
        if kind == "any":
            if not present:           # no allowed doc in this salt
                return _EMPTY_IDS
            allow = np.unique(np.concatenate(
                [ids_of(t) for t in present]))
            matched = matched[np.isin(matched, allow,
                                      assume_unique=True)]
        elif present:
            deny = np.unique(np.concatenate(
                [ids_of(t) for t in present]))
            matched = matched[~np.isin(matched, deny,
                                       assume_unique=True)]
        if matched.size == 0:
            return _EMPTY_IDS
    return matched


def _resolve_match_terms(index, text: str, mode: str,
                         fgroups: list[tuple[str, list[str]]],
                         tags_fn=None):
    """Shared dictionary-resolution prologue for every match-set surface
    (histograms, total-hits counts, delete-by-query): tokenize, check
    query-term liveness, resolve filter tags (and the caller's candidate
    tags, when ``tags_fn`` is given — a thunk so its dictionary-
    enumeration job only runs AFTER the liveness check) against the
    dictionary in ONE probe, and apply the same rules as search: an
    "any" group with NO live value selects nothing; values missing from
    the dictionary drop out of their group; an emptied NOT group
    excludes nothing. Returns None when the match set is provably
    empty, else (live_terms, resolved_fgroups, live_tags). ONE copy so
    the count, the histogram and the delete can never disagree on what
    matches."""
    qterms = sorted(set(tokenize_py(text)))
    dfs = index._lookup_terms(qterms)
    live = [t for t in qterms if dfs.get(t)]
    if not live or (mode == "and" and len(live) < len(qterms)):
        return None
    tags = list(tags_fn()) if tags_fn is not None else []
    ftags = [t for _, g in fgroups for t in g]
    tag_dfs = (index._lookup_terms(sorted(set(tags) | set(ftags)))
               if tags or ftags else {})
    tags = [t for t in tags if tag_dfs.get(t)]
    if any(kind == "any" and all(not tag_dfs.get(t) for t in g)
           for kind, g in fgroups):
        return None
    fgroups = [(kind, [t for t in g if tag_dfs.get(t)])
               for kind, g in fgroups]
    fgroups = [(kind, frozenset(g)) for kind, g in fgroups if g]
    return live, fgroups, tags


def _salt_matches_local(index, text: str, mode: str,
                        filters: dict | None):
    """Core of the driver-local match-set path: (per-salt id arrays,
    compiled fgroups). Arrays is None when the distributed path should
    run (over the local_bytes budget, or the index is not on a local
    filesystem — Index zeroes local_bytes then); an empty LIST is a
    real result (provably empty match set). fgroups are returned even
    on the None path so the distributed fallback never recompiles the
    filter spec (a range filter decomposes into up to ~480 trie
    tags)."""
    if mode not in ("or", "and"):
        raise ValueError(mode)
    fgroups = _compile_filters(index, filters)
    resolved = _resolve_match_terms(index, text, mode, fgroups)
    if resolved is None:
        return [], fgroups
    live, rgroups, _ = resolved
    ftags = sorted({t for _, g in rgroups for t in g})
    dfs = index._lookup_terms(sorted(set(live) | set(ftags)))
    from .query import _BYTES_PER_POSTING
    est = sum(dfs.values()) * _BYTES_PER_POSTING
    if not (0 < est <= index.local_bytes):
        return None, fgroups
    import pyarrow.dataset as ds
    needed = sorted(set(live) | set(ftags))
    buckets = sorted({term_bucket_py(t, index.n_buckets)
                      for t in needed})
    tbl = index._pa_dataset("segments").to_table(
        columns=["term", "salt", "docids_blob"],
        filter=ds.field("bucket").isin(buckets)
        & ds.field("term").isin(needed))
    if tbl.num_rows == 0:
        return [], fgroups
    terms = tbl.column("term").to_pylist()
    salts = tbl.column("salt").to_pylist()
    blobs = tbl.column("docids_blob").combine_chunks()
    per_salt: dict[int, dict[str, list]] = {}
    for i, (t, s) in enumerate(zip(terms, salts)):
        per_salt.setdefault(s, {}).setdefault(t, []).append(i)
    tomb = index._tombstones if index._tombstones.size else None
    qset, n_q = frozenset(live), len(live)
    arrs = []
    for _s, by_term in per_salt.items():
        m = _salt_match(_salt_ids_fn(by_term, blobs, index.codec),
                        by_term, qset, n_q, mode == "and", tomb, rgroups)
        if m.size:
            arrs.append(m)
    return arrs, fgroups


def match_ids_local(index, text: str, mode: str = "or",
                    filters: dict | None = None) -> np.ndarray | None:
    """Driver-local match ids (sorted int64) when the query's posting
    bytes fit ``index.local_bytes`` — the match-set twin of search's
    driver-local scoring path: a pyarrow scan of the probed bucket dirs
    feeds the SAME ``_salt_ids_fn``/``_salt_match`` helpers the
    distributed kernel runs, so the two paths cannot disagree. Returns
    None when the distributed path should run (over budget, or the
    index is not on a local filesystem); an EMPTY array is a real
    result (provably empty match set). Serving-latency rationale: a
    selective count/sort is ONE bounded pyarrow read instead of a
    Spark job — same cost model (Σ df · bytes/posting ≤ local_bytes)
    as ``_plan_search``."""
    text, mode = _expand_pattern_text(index, text, mode)
    arrs, _ = _salt_matches_local(index, text, mode, filters)
    if arrs is None:
        return None
    if not arrs:
        return _EMPTY_IDS
    return np.sort(np.concatenate(arrs))   # salts partition id ranges


def match_ids(index, text: str, mode: str = "or",
              filters: dict | None = None) -> DataFrame:
    """The DISTRIBUTED match set of ``text`` as a (doc_id) DataFrame —
    what delete-by-query (and any bulk action over "everything
    matching X") consumes. Exactly the docs match_count counts and an
    unbounded search would rank: same modes, same filter grammar, same
    tombstone mask, via the SAME per-salt kernel helpers. Ids never
    gather on the driver: each salt's int64 array becomes Arrow rows
    executor-side, so the result scales with the match set's partition
    spread, not with a driver collect."""
    text, mode = _expand_pattern_text(index, text, mode)
    if mode not in ("or", "and"):
        raise ValueError(mode)
    fgroups = _compile_filters(index, filters)
    got = _match_ids_distributed(index, text, mode, fgroups)
    if got is None:
        return index.spark.createDataFrame([], "doc_id long")
    return got


def match_docs(index, text: str, mode: str = "or",
               filters: dict | None = None,
               columns=None) -> DataFrame:
    """The FULL match set as a distributed DataFrame of docs metadata —
    the bulk-export surface a training-data pipeline consumes ("every
    doc matching this query under these filters", fed onward into
    dedup/quality/routing stages), never collected on the driver.
    Same kernel, modes, filter grammar, and tombstone mask as
    count/stats/sort — the export can never disagree with the numbers
    the dashboards show.

    ``columns`` defaults to the whole docs metadata schema (doc_id,
    repo, path, commit, lang, dl, sha256). Content is NOT stored in
    the index; join the export back to the corpus on
    (repo, path, commit) for it — the same pushed-down id/key join
    snippets use. Plan shape: the match-ids frame (one pruned segment
    scan) joins the COLUMN-PRUNED docs table once; Spark/AQE broadcast
    the id side when the match set is selective."""
    doc_cols = index._docs.columns
    cols = list(columns) if columns is not None else list(doc_cols)
    unknown = sorted(set(cols) - set(doc_cols))
    if unknown:
        raise ValueError(f"match_docs: unknown docs columns {unknown} "
                         f"(available: {sorted(doc_cols)})")
    ids = match_ids(index, text, mode, filters)
    sel = list(dict.fromkeys(["doc_id", *cols]))
    return (index._docs.select(*sel)       # column-pruned
            .join(ids, "doc_id")
            .select(*cols))


def _match_ids_distributed(index, text: str, mode: str,
                           fgroups) -> DataFrame | None:
    """``match_ids`` past the filter-spec compilation: the distributed
    (doc_id) frame from already-compiled presence-tag groups, or None
    when the match set is provably empty (OOV terms, a dead 'any'
    group). Split out so ``match_stats``'s over-budget path — which
    compiled fgroups once in ``_salt_matches_local`` — never pays the
    range-trie decomposition twice."""
    resolved = _resolve_match_terms(index, text, mode, fgroups)
    if resolved is None:
        return None
    live, fgroups, _ = resolved
    ftags = [t for _, g in fgroups for t in g]

    needed = sorted(set(live) | set(ftags))
    buckets = sorted({term_bucket_py(t, index.n_buckets)
                      for t in needed})
    qset, n_q = frozenset(live), len(live)
    codec = index.codec
    tomb_bc = index._tombstones_bc
    mode_and = mode == "and"

    def ids_arrow(batches):
        import pyarrow as pa
        batches = list(batches)
        if not batches:
            return
        tbl = pa.Table.from_batches(batches)
        if tbl.num_rows == 0:
            return
        terms = tbl.column("term").to_pylist()
        salts = tbl.column("salt").to_pylist()
        blobs = tbl.column("docids_blob").combine_chunks()
        per_salt: dict[int, dict[str, list]] = {}
        for i, (t, s) in enumerate(zip(terms, salts)):
            per_salt.setdefault(s, {}).setdefault(t, []).append(i)
        tomb = tomb_bc.value if tomb_bc is not None else None
        for _s, by_term in per_salt.items():
            ids_of = _salt_ids_fn(by_term, blobs, codec)
            matched = _salt_match(ids_of, by_term, qset, n_q,
                                  mode_and, tomb, fgroups)
            if matched.size:
                yield pa.RecordBatch.from_arrays(
                    [pa.array(matched, pa.int64())], names=["doc_id"])

    seg = (index._seg
           .where(F.col("bucket").isin(buckets)
                  & F.col("term").isin(needed))
           .select("term", "salt", "docids_blob"))
    return seg.repartition("salt").mapInArrow(ids_arrow, "doc_id long")


def _count_tag_overlaps(index, text: str, mode: str,
                        fgroups: list[tuple[str, list[str]]],
                        tags_fn, count_total: bool = False
                        ) -> DataFrame | None:
    """Shared counting core: one pruned segment scan + per-salt Arrow
    kernel counting each presence tag's overlap with the (filtered,
    tombstone-dropped) match set of ``text``. Returns an aggregated
    (tag, n_docs) DataFrame, or None when the result is provably empty
    (OOV terms, no live tag, an emptied 'any' filter group).
    ``tags_fn`` is a thunk yielding the candidate tag list — a thunk so
    its dictionary-enumeration Spark job only runs AFTER the query-term
    liveness check; an OOV query exits before paying it.
    ``count_total`` additionally emits one tag="*" row per salt with
    the match set's own size (docs partition by salt, so the sum is
    exact) — the total-hits path, which needs no tags at all."""
    resolved = _resolve_match_terms(index, text, mode, fgroups, tags_fn)
    if resolved is None:
        return None
    live, fgroups, tags = resolved
    if not tags and not count_total:
        return None
    ftags = [t for _, g in fgroups for t in g]

    needed = sorted(set(live) | set(tags) | set(ftags))
    buckets = sorted({term_bucket_py(t, index.n_buckets)
                      for t in needed})
    qset, n_q = frozenset(live), len(live)
    tagset = frozenset(tags)
    codec = index.codec
    tomb_bc = index._tombstones_bc
    mode_and = mode == "and"

    def count_arrow(batches):
        import pyarrow as pa
        batches = list(batches)
        if not batches:
            return
        tbl = pa.Table.from_batches(batches)
        if tbl.num_rows == 0:
            return
        terms = tbl.column("term").to_pylist()
        salts = tbl.column("salt").to_pylist()
        blobs = tbl.column("docids_blob").combine_chunks()
        per_salt: dict[int, dict[str, list]] = {}
        for i, (t, s) in enumerate(zip(terms, salts)):
            per_salt.setdefault(s, {}).setdefault(t, []).append(i)
        tomb = tomb_bc.value if tomb_bc is not None else None
        out_v, out_n = [], []
        for s, by_term in per_salt.items():
            ids_of = _salt_ids_fn(by_term, blobs, codec)
            matched = _salt_match(ids_of, by_term, qset, n_q,
                                  mode_and, tomb, fgroups)
            if matched.size == 0:
                continue
            if count_total:
                out_v.append("*")
                out_n.append(int(matched.size))
            for t in by_term:
                if t not in tagset:
                    continue
                c = int(np.isin(ids_of(t), matched,
                                assume_unique=True).sum())
                if c:
                    out_v.append(t[1:])      # "col=value"
                    out_n.append(c)
        if out_v:
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_v, pa.string()),
                 pa.array(out_n, pa.int64())],
                names=["tag", "n"])

    seg = (index._seg
           .where(F.col("bucket").isin(buckets)
                  & F.col("term").isin(needed))
           .select("term", "salt", "docids_blob"))
    part = seg.repartition("salt").mapInArrow(
        count_arrow, "tag string, n long")
    return part.groupBy("tag").agg(
        F.sum("n").cast("long").alias("n_docs"))
