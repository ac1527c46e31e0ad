"""Significant-terms aggregation — the vocabulary that CHARACTERIZES a
match set (the ES ``significant_terms`` agg / Luhn's "significant
words"): terms overrepresented among the docs matching a query
relative to the whole corpus, scored by JLH. "What words distinguish
the docs mentioning X?" is the text-analytics question behind topic
drill-downs, query expansion suggestions, and training-data slice
auditing (what vocabulary marks the slice I'm about to drop?).

Semantics (exact, ES JLH):

* foreground = the query's match set (same modes, facet/range filter
  grammar, and tombstone mask as every other match surface — computed
  by the shared match kernel so it can never disagree with
  match_count); background = the whole index.
* for each term t: fg = matching docs containing t, bg = df(t) from
  the dictionary (frozen stats, like scoring); with p_fg = fg/n_fg
  and p_bg = bg/N, JLH(t) = (p_fg − p_bg) · (p_fg / p_bg), defined
  only where p_fg > p_bg (overrepresented) — rare-but-concentrated
  and common-but-lifted terms both surface, ES's stated design.
* top-k by (score desc, term asc); ties deterministic. ``min_fg``
  (ES min_doc_count) drops terms with fewer foreground docs.
* facet presence tags (the ``\\x01col=`` internal terms) are never
  reported.

Plan shape: this is the one surface that must look at EVERY term's
postings — an O(index) analytics job by nature (ES pays the same per
shard and mitigates by sampling) — so the plan's job is to keep the
index scan SHUFFLE-FREE: the match set ships to the scan, never the
reverse. Phase 1 computes n_fg (pruned count) and the distributed
match-ids frame, folded to one row per salt (a salt is a doc range:
≤ range_size ids ≈ 8 KB). Phase 2 joins segments ⋈ per-salt ids —
broadcast when the match set fits a 64 MB gate (map-side hash probe:
segment blocks stream through untouched, each counting overlap via
one searchsorted against its salt's sorted ids), sort-merge co-shuffle
past it. Per-partition partial sums leave O(matched vocabulary) rows
for the final groupBy(term); bg joins the vocabulary-sized dictionary
(active chunks summed, exactly _lookup_terms' rule), and the top-k is
a TakeOrderedAndProject. At 10^12 files the honest mitigation for a
corpus-sized match set is running this on a filtered slice — the
filters argument — not a hidden sample.

fg counts posting entries per term; on batch-built or compacted
indexes those are unique (term, doc) pairs. A streamed index that
re-ingested the same key before compaction counts the live copy only
(superseded ids are tombstoned by upsert), matching search behavior.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from ..operators.facets import FACET_PREFIX

#: broadcast gate for the per-salt match-ids frame (8 B/doc → ≤ 8M
#: matched docs broadcast; past it the segments scan co-shuffles)
SIG_BROADCAST_BYTES = 64 << 20


def significant_terms(index, text: str, k: int = 20, mode: str = "or",
                      filters: dict | None = None,
                      min_fg: int = 1,
                      include_query_terms: bool = True) -> list[tuple]:
    """[(term, fg, bg, score)] — the k most significant terms of the
    match set, JLH-scored, (score desc, term asc) ordered.
    ``include_query_terms=False`` drops the query's own tokens (they
    are trivially significant; ES keeps them, so the default does
    too)."""
    from ..functions.tokenize import tokenize_py
    from .facet_counts import (_expand_pattern_text, match_count,
                               match_ids)
    if k <= 0 or min_fg < 1:
        raise ValueError("significant_terms: k must be > 0 and "
                         "min_fg >= 1")
    # rewrite pattern atoms ONCE here (idempotent for the nested
    # match_count/match_ids calls) so include_query_terms=False
    # excludes the EXPANDED query terms, not tokens of the raw
    # pattern text
    text, mode = _expand_pattern_text(index, text, mode)
    n_fg = match_count(index, text, mode=mode, filters=filters)
    if n_fg == 0:
        return []
    n_docs = index.n_docs
    rs = index.range_size
    codec = index.codec

    ids = match_ids(index, text, mode, filters)
    per_salt = (ids.withColumn("salt",
                               (F.col("doc_id") / rs).cast("long"))
                .groupBy("salt")
                .agg(F.collect_list("doc_id").alias("mids")))
    if n_fg * 8 <= SIG_BROADCAST_BYTES:
        per_salt = F.broadcast(per_salt)
    seg = index._seg.select("term", "salt", "docids_blob")
    joined = seg.join(per_salt, "salt")

    def count_arrow(batches):
        import pyarrow as pa

        from ..kernels.blocks import decode_doc_ids
        acc: dict[str, int] = {}
        salt_ids: dict[int, np.ndarray] = {}
        for b in batches:
            terms = b.column("term").to_pylist()
            salts = b.column("salt").to_pylist()
            blobs = b.column("docids_blob")
            mids = b.column("mids")
            for i, t in enumerate(terms):
                if t.startswith(FACET_PREFIX):
                    continue
                s = salts[i]
                m = salt_ids.get(s)
                if m is None:
                    m = salt_ids[s] = np.sort(np.asarray(
                        mids[i].as_py(), dtype=np.int64))
                d = decode_doc_ids(blobs[i].as_py(), codec)
                at = np.searchsorted(m, d)
                at[at == m.size] = 0
                n = int(np.count_nonzero(m[at] == d))
                if n:
                    acc[t] = acc.get(t, 0) + n
        if acc:
            ks, vs = zip(*acc.items())
            yield pa.RecordBatch.from_arrays(
                [pa.array(ks, pa.string()),
                 pa.array(vs, pa.int64())], names=["term", "fg"])

    fg = (joined.mapInArrow(count_arrow, "term string, fg long")
          .groupBy("term").agg(F.sum("fg").alias("fg"))
          .where(F.col("fg") >= min_fg))
    if not include_query_terms:
        qs = sorted(set(tokenize_py(text)))
        if qs:
            fg = fg.where(~F.col("term").isin(qs))

    # background df: the dictionary's active chunks summed per term —
    # the same rule _lookup_terms applies (stream partials supersede)
    d = index._dict
    active = index._active_dict_chunks()
    if active is not None:
        d = d.where(F.col("chunk").isin(active))
    bg = (d.where(~F.col("term").startswith(FACET_PREFIX))
          .groupBy("term").agg(F.sum("df").alias("bg")))

    p_fg = F.col("fg") / F.lit(float(n_fg))
    p_bg = F.col("bg") / F.lit(float(n_docs))
    scored = (fg.join(bg, "term")
              .withColumn("score", (p_fg - p_bg) * (p_fg / p_bg))
              .where(p_fg > p_bg)
              .orderBy(F.desc("score"), F.asc("term"))
              .limit(int(k)))
    return [(r["term"], int(r["fg"]), int(r["bg"]), float(r["score"]))
            for r in scored.collect()]
