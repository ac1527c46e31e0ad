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
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokenize_py
from ..kernels.blocks import decode_doc_ids
from ..operators.facets import FACET_PREFIX, facet_term
from ..operators.postings import term_bucket_py


def facet_values(index, facet: str) -> list[str]:
    """Distinct indexed values of a facet column, from the dictionary's
    presence tags (one dictionary scan — vocabulary-sized, not
    corpus-sized)."""
    prefix = f"{FACET_PREFIX}{facet}="
    d = index._dict
    active = index._active_dict_chunks()
    if active is not None:
        d = d.where(F.col("chunk").isin(active))
    rows = (d.where(F.col("term").startswith(prefix))
            .select("term").distinct().collect())
    return sorted(r["term"][len(prefix):] for r in rows)


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
    (equality / OR list / {"not": [...]}): counts are taken over the
    FILTERED match set — faceted-navigation semantics, where the
    histogram of one column respects the selections active on the
    others. Filter masks intersect inside the same per-salt kernel
    (id-array set ops over the already-fetched presence postings), so
    no join or extra scan appears."""
    multi = not isinstance(facet, str)
    facets = list(facet) if multi else [facet]
    if multi and values is not None:
        raise ValueError("values= applies to the single-facet form")
    unknown = sorted(set(facets) - set(index.facets))
    if unknown:
        raise ValueError(
            f"index has no facet(s) {unknown}; built with "
            f"facets={index.facets or '()'}")
    if mode not in ("or", "and"):
        raise ValueError(mode)
    fgroups: list[tuple[str, list[str]]] = []
    if filters:
        funknown = sorted(set(filters) - set(index.facets))
        if funknown:
            raise ValueError(
                f"index has no facet(s) {funknown}; built with "
                f"facets={index.facets or '()'}")
        from ..operators.facets import normalize_filter_spec
        for c, v in sorted(filters.items()):
            kind, vals_ = normalize_filter_spec(c, v)
            fgroups.append((kind, [facet_term(c, x) for x in vals_]))
    spark = index.spark
    schema = ("facet string, value string, n_docs long" if multi
              else "value string, n_docs long")
    empty = spark.createDataFrame([], schema)
    qterms = sorted(set(tokenize_py(text)))
    dfs = index._lookup_terms(qterms)
    live = [t for t in qterms if dfs.get(t)]
    if not live or (mode == "and" and len(live) < len(qterms)):
        return empty
    tags = []
    for f in facets:
        vals = facet_values(index, f) if values is None else values
        tags += [facet_term(f, v) for v in vals]
    ftags = [t for _, g in fgroups for t in g]
    tag_dfs = index._lookup_terms(sorted(set(tags) | set(ftags)))
    tags = [t for t in tags if tag_dfs.get(t)]
    if not tags:
        return empty
    # same dictionary-resolution rules as search: an "any" group with NO
    # live value selects nothing; values missing from the dictionary
    # drop out of their group; an emptied NOT group excludes nothing
    if any(kind == "any" and all(not tag_dfs.get(t) for t in g)
           for kind, g in fgroups):
        return empty
    fgroups = [(kind, [t for t in g if tag_dfs.get(t)])
               for kind, g in fgroups]
    fgroups = [(kind, frozenset(g)) for kind, g in fgroups if g]
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
            def ids_of(t):
                return np.sort(np.concatenate(
                    [decode_doc_ids(blobs[i].as_py(), codec)
                     for i in by_term[t]]))
            q_present = [t for t in by_term if t in qset]
            if not q_present or (mode_and and len(q_present) < n_q):
                continue
            if mode_and:
                matched = ids_of(q_present[0])
                for t in q_present[1:]:
                    matched = np.intersect1d(matched, ids_of(t),
                                             assume_unique=True)
                    if matched.size == 0:
                        break
            else:
                matched = np.unique(np.concatenate(
                    [ids_of(t) for t in q_present]))
            if matched.size and tomb is not None and tomb.size:
                j = np.searchsorted(tomb, matched)
                j[j == tomb.size] = tomb.size - 1
                matched = matched[tomb[j] != matched]
            if matched.size == 0:
                continue
            for kind, g in fgroups:
                present = [t for t in g if t in by_term]
                if kind == "any":
                    if not present:       # no allowed doc in this salt
                        matched = matched[:0]
                        break
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
                    break
            if matched.size == 0:
                continue
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
    agg = part.groupBy("tag").agg(
        F.sum("n").cast("long").alias("n_docs"))
    split = F.split(F.col("tag"), "=", 2)
    if multi:
        return agg.select(split.getItem(0).alias("facet"),
                          split.getItem(1).alias("value"), "n_docs")
    return agg.select(split.getItem(1).alias("value"), "n_docs")
