"""Federated sharded search — one query over MANY shard indexes, with
EXACT global-stats BM25.

At 10^12 files a single monolithic index is operationally wrong: real
deployments shard — by time window (daily crawl indexes), by tenant, or
by hash — and every shard builds, compacts, and deletes independently.
The query layer must then answer over the federation as if ONE index
had been built over the union. Donkey serves one database per process
`[donkey:src — unverified, SURVEY §0]`; the Elasticsearch/Solr lineage
calls the missing piece distributed frequencies (their default skips
it and accepts cross-shard score skew — "dfs_query_then_fetch" turns
it on). This module does the exact version, in two bounded phases:

1. **stats phase** — probe each shard's dictionary for the query
   terms' df (the same partition-pruned, memoized probe every query
   uses — O(terms) per shard, never a scan) and combine:
   N = Σ nᵢ, df(t) = Σ dfᵢ(t), avgdl = Σ sum_dlᵢ / N (each shard's
   integral sum_dl is recovered exactly as round(avgdlᵢ·nᵢ), so the
   global avgdl is bit-equal to what a unified build computes);
2. **query phase** — every shard ranks with the GLOBAL stats injected
   (`Index.search_rows(stats=...)`): idf from global df/N, tf
   normalization on global avgdl, while term presence, block pruning,
   tombstones and facet filters stay shard-local. Block-max potentials
   are inflated by avgdl_g/avgdlᵢ when the global avgdl is larger, so
   every skip stays a safe upper-bound test (kernels/wand.TermBlocks).

Each shard returns its own top-k; since any global top-k member is in
its shard's top-k, merging the ≤ shards·k candidate rows on the driver
is exact. Scores are comparable BY CONSTRUCTION (same formula, same
global stats), so the merge is a sort, not a re-score.

Rank identity with a unified index: dense doc ids are assigned in
(repo, path, commit) order (operators/doc_ids.py), so the single-index
tie-break — doc_id ascending — IS key order; the merge breaks ties on
(repo, path) and therefore reproduces the unified ranking exactly
(tested shard-count-invariant in tests/test_sharded.py; the
`bm25_topk_sharded` driver pair proves it against the SAME DuckDB
oracle the unified flagship pair uses).

Scale shape: stats phase is O(shards · terms) tiny probes, query phase
is embarrassingly parallel across shards (each runs its normal pruned
plan), merge is O(shards · Σk) driver rows. Nothing anywhere is
O(corpus). Constraint: a (repo, path) must live in ONE shard (the
natural sharding invariant replace-by-key upserts already require).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from ..functions.tokenize import tokenize_py

#: driver threads for the per-shard fan-out. 0 (the default) = serial:
#: MEASURED on the single-host serving path, threads LOSE — the
#: 20-query batch over a 4-shard 250k federation ran 2.9s serial vs
#: 5.9s (persistent pool) / 6.9s (per-call pool) threaded, because the
#: per-shard work is driver-local numpy/pyarrow scoring that contends
#: on the GIL and the memory bus instead of overlapping (same host
#: pathology as the extractor A/B — BENCH/BASELINE.md §Sharded). Set
#: >0 only when shards genuinely overlap: remote/cluster-dispatched
#: shard plans (independent Spark jobs from concurrent driver threads,
#: FAIR pools) or shards served by other processes; a real federation
#: fans out across HOSTS, where this loop is a network scatter-gather.
FANOUT_THREADS = 0


def _fanout(fn, shards):
    if FANOUT_THREADS <= 0 or len(shards) <= 1:
        return [fn(s) for s in shards]
    with ThreadPoolExecutor(
            max_workers=min(len(shards), FANOUT_THREADS)) as ex:
        return list(ex.map(fn, shards))

#: result row: (query_id, rank, shard, doc_id, score, repo, path) —
#: shard index + shard-LOCAL doc id let callers fetch back into the
#: owning index (snippets, metadata); there is no global doc id in a
#: federation.
RESULT_SCHEMA = ("query_id int, rank int, shard int, doc_id long, "
                 "score double, repo string, path string")


def global_stats(shards, terms) -> dict:
    """Combined corpus stats over the federation for ``terms`` — the
    dict `Index.search_rows(stats=...)` takes."""
    if not shards:
        raise ValueError("no shards")
    n = sum(s.n_docs for s in shards)
    if n == 0:
        raise ValueError("empty federation (every shard has n_docs=0)")
    # sum_dl is integral (token counts); avgdl_i = sum_dl_i / n_i is
    # within an ulp of it, so round() recovers the exact integer and
    # the global avgdl equals a unified build's bit for bit
    sum_dl = sum(round(s.avgdl * s.n_docs) for s in shards)
    dfs: dict[str, int] = {}
    uniq = sorted(set(terms))
    for probed in _fanout(lambda s: s._lookup_terms(uniq), shards):
        for t, df in probed.items():
            dfs[t] = dfs.get(t, 0) + int(df)
    return {"n_docs": int(n), "avgdl": sum_dl / n, "dfs": dfs}


def search_rows_sharded(shards, queries: list[tuple[int, str, int]],
                        mode: str = "or",
                        filters: dict | None = None,
                        min_match: int | dict | None = None,
                        synonyms: dict | None = None
                        ) -> list[tuple]:
    """Top-k over the federation: [(query_id, rank, shard, doc_id,
    score, repo, path)] sorted by (query_id, rank). ``shards`` is a
    list of ``plans.query.Index``; ``mode``/``filters`` apply inside
    every shard (each resolves facet values against its own
    dictionary — shards must share the facet schema). ``min_match``
    (Index.search_rows' minimum_should_match knob) federates exactly
    with no extra phase: a doc lives in ONE shard and can only contain
    terms present in that shard's dictionary, so its matched-term
    count is shard-local by construction. ``synonyms``
    (Index.search_rows' Lucene-SynonymQuery map) federates by adding
    every member term to the global stats probe, so each shard's
    blended group idf comes from the SAME Σ-shard dfs a unified index
    would use."""
    from .query import _normalize_synonyms
    syn_map = _normalize_synonyms(synonyms, mode, None)
    terms = [t for _, text, _ in queries for t in tokenize_py(text)]
    if syn_map:
        heads = [t for t in terms if t in syn_map]   # snapshot: never
        terms.extend(m for t in heads                # extend the list
                     for m in syn_map[t])            # being iterated
    stats = global_stats(shards, terms)
    per_shard = _fanout(
        lambda idx: idx.search_rows(queries, mode=mode,
                                    filters=filters, stats=stats,
                                    min_match=min_match,
                                    synonyms=synonyms),
        shards)
    return _merge_ranked(per_shard, {qid: k for qid, _, k in queries})


def search_after_sharded(shards, queries: list[tuple[int, str, int]],
                         after: dict, mode: str = "or",
                         filters: dict | None = None) -> list[tuple]:
    """Cursor pagination over the federation (§2.14 T32 —
    `Index.search_rows_after`'s sharded twin). ``after`` maps
    query_id -> (score, repo, path): the MERGE ORDERING KEY of the last
    row of the query's previous federated page (row[4], row[5],
    row[6]). There is no global doc id in a federation, so the cursor
    is the (repo, path) identity the merge already breaks ties on —
    exactly Elasticsearch's "sort values + unique tiebreak field"
    search_after contract. Returns the next k rows per query in the
    7-column federated shape, re-ranked 1..k; queries absent from
    ``after`` get their first page.

    Exactness: every shard runs the kernel's cursor path with a
    SCORE-ONLY boundary (doc_id floor −1), so a shard keeps its docs
    tied at the boundary score — those ties are a PREFIX of the
    shard's filtered ranking (the boundary score is the highest score
    a post-cursor doc can have), and the driver then applies the full
    (score, repo, path) predicate before the ordinary ≤ shards·k
    merge. If a shard came back truncated (returned exactly its k
    and lost rows to the prefix filter while still under k kept), its
    k doubles and the query re-runs on that shard — the prefix is
    finite, so the loop terminates with the shard either exhausted,
    unfiltered, or holding k genuinely-after rows, any of which makes
    the merge exact by the standard containment argument. The retry
    triggers only when distinct (repo, path) docs tie at the exact
    float64 boundary score — duplicate-content corpora."""
    ks = {qid: k for qid, _, k in queries}
    qtext = {qid: text for qid, text, _ in queries}
    curs: dict[int, tuple[float, str, str]] = {}
    for qid, cur in (after or {}).items():
        if qid not in ks:
            raise ValueError(f"after has unknown query_id {qid!r}")
        if cur is None:
            continue
        try:
            cs, repo_b, path_b = cur
            curs[qid] = (float(cs), str(repo_b), str(path_b))
        except (TypeError, ValueError) as e:
            raise ValueError(f"after[{qid!r}] must be (score, repo, "
                             f"path), got {cur!r}") from e
    trees = None
    if mode == "bool":     # boolean expressions paginate federated too
        from ..functions.boolquery import bool_terms, parse_bool_text
        trees = {qid: parse_bool_text(text) for qid, text, _ in queries}
        terms = [t for tr in trees.values() for t in bool_terms(tr)]
    elif mode in ("or", "and"):
        terms = [t for _, text, _ in queries for t in tokenize_py(text)]
    else:
        raise ValueError(f"search_after_sharded supports modes "
                         f"or/and/bool, got {mode!r}")
    if not curs:
        if mode == "bool":
            return search_bool_sharded(shards, queries, filters=filters)
        return search_rows_sharded(shards, queries, mode=mode,
                                   filters=filters)
    stats = global_stats(shards, terms)

    def _after_boundary(qid: int, row: tuple) -> bool:
        c = curs.get(qid)
        if c is None:
            return True
        _, _, _, sc, repo, path = row
        cs, rb, pb = c
        return sc < cs or (sc == cs and (repo, path) > (rb, pb))

    def _shard_rows(idx) -> list[tuple]:
        pending = dict(ks)
        got: list[tuple] = []
        while pending:
            rows = idx.search_rows(
                [(q, qtext[q], kk) for q, kk in pending.items()],
                mode=mode, filters=filters, stats=stats,
                bool_trees=trees,
                cursors={q: (curs[q][0], -1) for q in pending
                         if q in curs} or None)
            by_q: dict[int, list] = {}
            for r in rows:
                by_q.setdefault(r[0], []).append(r)
            nxt = {}
            for q, kk in pending.items():
                rws = by_q.get(q, [])
                kept = [r for r in rws if _after_boundary(q, r)]
                if (q in curs and len(rws) == kk and len(kept) < len(rws)
                        and len(kept) < ks[q]):
                    nxt[q] = kk * 2     # boundary-tie truncation: widen
                else:
                    got.extend(kept[:ks[q]])
            pending = nxt
        return got

    per_shard = _fanout(_shard_rows, shards)
    return _merge_ranked(per_shard, ks)


def search_bool_sharded(shards, queries: list[tuple[int, str, int]],
                        filters: dict | None = None) -> list[tuple]:
    """Boolean expressions over the federation (§2.14 T24 —
    `Index.search_rows_bool`'s sharded twin). Trees parse ONCE on the
    driver; the stats phase probes ALL tree terms (NOT branches too —
    a negated term's df never scores, but probing it is free and keeps
    the phase one batch). Matching is shard-local by construction (a
    doc's token set lives in its owning shard), scores are the global-
    stats BM25 over positive terms, so the ≤ shards·k merge is exact
    by the same argument as OR-mode: any global top-k matcher is in
    its shard's top-k. Rows = the 7-column federated shape."""
    from ..functions.boolquery import bool_terms, parse_bool_text
    trees = {qid: parse_bool_text(text) for qid, text, _ in queries}
    terms = [t for tr in trees.values() for t in bool_terms(tr)]
    stats = global_stats(shards, terms)
    per_shard = _fanout(
        lambda idx: idx.search_rows(queries, mode="bool", filters=filters,
                                    stats=stats, bool_trees=trees),
        shards)
    return _merge_ranked(per_shard, {qid: k for qid, _, k in queries})


def _merge_ranked(per_shard: list[list[tuple]],
                  ks: dict[int, int]) -> list[tuple]:
    """Exact federation merge: ≤ shards·k rows per query, re-ranked on
    (score desc, repo, path) — which equals the unified index's
    (score desc, doc_id) tie-break by the dense-id construction."""
    merged: dict[int, list] = {}
    for si, rows in enumerate(per_shard):
        for qid, _, did, score, repo, path in rows:
            merged.setdefault(qid, []).append((score, repo, path, si, did))
    out = []
    for qid in sorted(merged):
        rows = sorted(merged[qid],
                      key=lambda r: (-r[0], r[1], r[2]))[:ks[qid]]
        out.extend((qid, rk + 1, si, did, score, repo, path)
                   for rk, (score, repo, path, si, did) in enumerate(rows))
    return out


def _global_expansions(shards, keys: list[tuple], cap: int
                       ) -> tuple[dict, dict]:
    """The T23 GLOBAL expansion rule, shared by search_pattern_sharded
    and the pattern-mode match surfaces: each (kind, base, dist) key's
    candidate set is the UNCAPPED union of every shard's matches with
    dfs summed across shards (a term just under one shard's cap can be
    over it globally), ranked (global df DESC, term ASC) and capped
    ONCE. Returns ({key: [terms]}, {term: global df}). ONE fanout
    expands every key per shard — all fuzzy keys share a single
    dictionary scan inside _expand_candidates_multi, so stats-phase
    dictionary reads are O(shards), not O(shards · patterns)."""
    per_shard_cand = _fanout(
        lambda s: s._expand_candidates_multi(keys), shards)
    expansions: dict[tuple, list[str]] = {}
    exp_dfs: dict[str, int] = {}
    for key in keys:
        cand: dict[str, int] = {}
        for shard_cand in per_shard_cand:
            for t, df in shard_cand[key].items():
                cand[t] = cand.get(t, 0) + int(df)
        ranked = sorted(cand.items(), key=lambda kv: (-kv[1], kv[0]))[:cap]
        expansions[key] = [t for t, _ in ranked]
        exp_dfs.update(ranked)
    return expansions, exp_dfs


def _expand_pattern_text_sharded(shards, text: str, mode: str
                                 ) -> tuple[str, str]:
    """``mode="pattern"`` for the FEDERATED match surfaces — the
    sharded twin of plans/facet_counts._expand_pattern_text. Expansion
    follows the global rule above (so the federation admits exactly
    the docs the unified surface admits), then the surface runs the
    plain OR query per shard. Any other mode passes through."""
    if mode != "pattern":
        return text, mode
    from ..config import MAX_TERM_EXPANSIONS
    from ..functions.patterns import parse_pattern_text
    _, qpats = parse_pattern_text(text)
    expansions, _ = _global_expansions(shards, sorted(set(qpats)),
                                       MAX_TERM_EXPANSIONS)
    # the literal∪expansion rewrite itself is resolve_pattern_terms'
    # (handed the GLOBAL lists) — one copy, shared with the unified
    # path, so the two rewrites can never drift
    (_, terms, _), = shards[0].resolve_pattern_terms(
        [(0, text, 1)], expansions=expansions)
    return " ".join(terms), "or"


def search_pattern_sharded(shards, queries: list[tuple[int, str, int]],
                           filters: dict | None = None,
                           max_expansions: int | None = None
                           ) -> list[tuple]:
    """Prefix/fuzzy/wildcard pattern queries over the federation (§2.14 T23 —
    `Index.search_rows_pattern`'s sharded twin). Expansion must be
    GLOBAL to stay shard-count-invariant: each pattern's candidate set
    is the UNCAPPED union of every shard's matches with dfs summed
    across shards (a term just under one shard's df cap can be over it
    globally), ranked (global df DESC, term ASC) and capped ONCE — then
    every shard rewrites its queries with the SAME expansion lists and
    ranks with the global stats, so results are identical to one index
    over the union. Stats-phase cost: O(shards · matches-per-pattern)
    driver rows, bounded by config.MAX_EXPANSION_CANDIDATES."""
    from ..config import MAX_TERM_EXPANSIONS
    from ..functions.patterns import parse_pattern_text
    cap = MAX_TERM_EXPANSIONS if max_expansions is None else max_expansions
    lit_terms: list[str] = []
    pats: set[tuple] = set()
    for _, text, _ in queries:
        lit_text, qpats = parse_pattern_text(text)
        lit_terms.extend(tokenize_py(lit_text))
        pats.update(qpats)
    expansions, exp_dfs = _global_expansions(shards, sorted(pats), cap)
    stats = global_stats(shards, lit_terms)
    # expansion dfs are already global sums — inject them so no shard
    # re-probes (or worse, ranks) with a local df
    stats["dfs"].update(exp_dfs)
    per_shard = _fanout(
        lambda idx: idx.search_rows_pattern(queries, filters=filters,
                                            stats=stats,
                                            expansions=expansions),
        shards)
    return _merge_ranked(per_shard, {qid: k for qid, _, k in queries})


def search_boosted_sharded(shards, queries: list[tuple[int, str, int]],
                           mode: str = "or",
                           filters: dict | None = None) -> list[tuple]:
    """Per-term boosted queries over the federation
    (`Index.search_rows_boosted`'s sharded twin — ``term^W`` atoms in
    each query text, functions/boosts.py grammar). Boosts scale each
    term's idf IDENTICALLY in every shard, and idf here comes from the
    shared global stats, so federated boosted scores equal a unified
    index's exactly — the same containment argument as plain federated
    search, weights riding along."""
    if mode not in ("or", "and"):
        raise ValueError(f"search_boosted_sharded supports modes "
                         f"or/and, got {mode!r}")
    from ..functions.boosts import parse_boost_text
    parsed = {qid: parse_boost_text(text) for qid, text, _ in queries}
    boosts = {qid: bw for qid, (_, bw) in parsed.items() if bw}
    tqueries = [(qid, parsed[qid][0], k) for qid, _, k in queries]
    stats = global_stats(shards, [t for ts, _ in parsed.values()
                                  for t in ts])
    per_shard = _fanout(
        lambda idx: idx.search_rows(tqueries, mode=mode, filters=filters,
                                    stats=stats, boosts=boosts or None),
        shards)
    return _merge_ranked(per_shard, {qid: k for qid, _, k in queries})


def open_shards(spark, index_dirs: list[str], **index_opts) -> list:
    """Convenience: Index objects over a list of shard dirs."""
    from .query import Index
    return [Index(spark, d, **index_opts) for d in index_dirs]


def search_sharded(spark, index_dirs: list[str],
                   queries: list[tuple[int, str, int]],
                   mode: str = "or", filters: dict | None = None,
                   min_match: int | dict | None = None,
                   synonyms: dict | None = None):
    """DataFrame form of ``search_rows_sharded`` over shard dirs."""
    rows = search_rows_sharded(open_shards(spark, index_dirs), queries,
                               mode=mode, filters=filters,
                               min_match=min_match, synonyms=synonyms)
    return spark.createDataFrame(rows, RESULT_SCHEMA)


def search_rows_mixed_sharded(shards, specs: list[tuple]) -> list[tuple]:
    """The federation twin of `Index.search_rows_mixed` — one serving
    batch with PER-QUERY modes/filters over shard indexes. ``specs`` =
    [(query_id, text, k, mode, filters)] (mode/filters may be None →
    "or" / unfiltered; mode "phrase" routes through
    `search_phrase_sharded` and takes no filters;
    "boosted"/"boosted-and" parse `term^W` weights —
    `search_boosted_sharded`). Queries sharing a
    (mode, filters) signature run as ONE `search_rows_sharded` call, so
    the per-shard stats probes, filter masks and decode caches amortize
    within each group exactly as they do on a single index — and the
    per-shard dictionary memos amortize across groups. Rows are the
    7-column federated shape sorted by (query_id, rank); query_ids must
    be unique across the batch."""
    from .query import group_mixed_specs
    out: list[tuple] = []
    for (mode, _), qs in group_mixed_specs(
            specs, "search_rows_mixed_sharded").items():
        if mode == "phrase":
            out.extend(r for q, t, kk, _ in qs
                       for r in search_phrase_sharded(shards, t, k=kk,
                                                      query_id=q))
        elif mode == "pattern":
            out.extend(search_pattern_sharded(
                shards, [(q, t, k) for q, t, k, _ in qs],
                filters=qs[0][3]))
        elif mode == "bool":      # r5 T24: boolean expression specs
            out.extend(search_bool_sharded(
                shards, [(q, t, k) for q, t, k, _ in qs],
                filters=qs[0][3]))
        elif mode in ("boosted", "boosted-and"):   # r5 T34: term^W specs
            out.extend(search_boosted_sharded(
                shards, [(q, t, k) for q, t, k, _ in qs],
                mode="and" if mode == "boosted-and" else "or",
                filters=qs[0][3]))
        else:
            out.extend(search_rows_sharded(
                shards, [(q, t, k) for q, t, k, _ in qs],
                mode=mode, filters=qs[0][3]))
    return sorted(out)


def search_phrase_sharded(shards, text: str, k: int = 10,
                          slop: int = 0, query_id: int = 0) -> list[tuple]:
    """Exact-phrase top-k over the federation — rows shaped like
    `search_rows_sharded` ((query_id, rank, shard, doc_id, score, repo,
    path)). Same two phases as ranked search: global stats over the
    phrase's terms, then every (positional, format-v3) shard runs its
    own candidate-rank + position-verify loop with the global stats
    injected (`Index.search_phrase(stats=...)`). Position verification
    is entirely shard-local — a phrase matches inside ONE document —
    so, like ranking, any global phrase top-k member is in its shard's
    phrase top-k and the ≤ shards·k merge is exact; scores are the
    AND-mode BM25 of the phrase's distinct terms under global stats,
    identical to a unified positional index's (tested rank-identical in
    tests/test_sharded.py)."""
    terms = tokenize_py(text)
    stats = global_stats(shards, terms)
    merged: list = []
    for si, rows in enumerate(_fanout(
            lambda idx: idx.search_phrase(text, k, query_id=query_id,
                                          slop=slop, stats=stats),
            shards)):
        merged.extend((score, repo, path, si, did)
                      for _, _, did, score, repo, path in rows)
    merged.sort(key=lambda r: (-r[0], r[1], r[2]))
    return [(query_id, rk + 1, si, did, score, repo, path)
            for rk, (score, repo, path, si, did)
            in enumerate(merged[:k])]


def _aligned_tombstones(tombstones_from, index_dirs) -> list:
    """Per-shard tombstone sources, validated to align with the shard
    list (shared by the LSH and IVF federations)."""
    ts = tombstones_from or [None] * len(index_dirs)
    if len(ts) != len(index_dirs):
        raise ValueError(
            f"tombstones_from has {len(ts)} entries for "
            f"{len(index_dirs)} shards — must align")
    return ts


def _union_all(parts):
    """unionByName fold over per-shard DataFrames (shared by every
    DataFrame-merging federated surface)."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def ann_topk_sharded(spark, index_dirs: list[str], probe: list[float],
                     k: int = 10, id_col: str = "vec_id",
                     vec_col: str = "embedding", n_tables: int = 8,
                     n_planes: int = 6, multiprobe: int = 0,
                     exclude=None, tombstones_from: list | None = None,
                     filters: dict | None = None,
                     metadata=None):
    """LSH-ANN top-k over a federation of bucket-table shards — the
    vector twin of `search_rows_sharded`, needing NO stats phase at
    all: cosine is corpus-independent, and the sha-seeded hyperplanes
    are deterministic (pipeline/similarity._planes), so every shard
    hashes into the SAME bucket space. A federated probe therefore
    reads the probe's n_tables·(1+multiprobe) bucket dirs in each
    shard, and the union of per-shard candidates IS the unified
    index's candidate set — the merged top-k is not merely exact over
    the union, it is bit-equal to one index built over all vectors
    (asserted in tests/test_sharded.py). Merge = union of the ≤
    shards·k per-shard (id, cosine) frames → one TakeOrderedAndProject.

    ``tombstones_from`` is per-shard (list aligned with
    ``index_dirs``, or None); ``exclude``/``filters``/``metadata``
    apply uniformly. Vector ids must be unique across the federation
    (same invariant as (repo, path) for document shards)."""
    if not index_dirs:
        raise ValueError("no shards")
    ts = _aligned_tombstones(tombstones_from, index_dirs)
    from pyspark.sql import functions as F

    from ..pipeline.similarity import ann_topk
    parts = [ann_topk(spark, d, probe, k, id_col=id_col, vec_col=vec_col,
                      n_tables=n_tables, n_planes=n_planes,
                      multiprobe=multiprobe, exclude=exclude,
                      tombstones_from=t, filters=filters,
                      metadata=metadata)
             for d, t in zip(index_dirs, ts)]
    out = _union_all(parts)
    return out.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def ivf_topk_sharded(spark, index_dirs: list[str], probe: list[float],
                     k: int = 10, nprobe: int = 8,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     exclude=None, tombstones_from: list | None = None,
                     filters: dict | None = None, metadata=None):
    """IVF-ANN top-k over a federation of inverted-list shards — the
    data-DEPENDENT twin of `ann_topk_sharded`, exact under ONE extra
    operational requirement: every shard was built with the SAME frozen
    quantizer (`build_ivf_index(..., centroids=)` from one training
    run — the standard regime anyway, since `append_ivf_vectors`
    already freezes centroids). Then each shard's lists partition the
    same centroid space, a probe opens the SAME nprobe list ids in
    every shard, and the federated candidate union IS the unified
    index's candidate set — results bit-equal to one index over all
    vectors, exactly like the LSH federation. The shared-quantizer
    precondition is VERIFIED (k·dim driver floats per shard, 9-decimal
    canonical form), not assumed: silently merging rankings from
    different quantizers would be wrong with no error."""
    if not index_dirs:
        raise ValueError("no shards")
    ts = _aligned_tombstones(tombstones_from, index_dirs)
    from pyspark.sql import functions as F

    from ..pipeline.ivf import ivf_topk, read_centroids
    cents = [read_centroids(spark, d) for d in index_dirs]
    for i, c in enumerate(cents[1:], start=1):
        if c.shape != cents[0].shape or not (c == cents[0]).all():
            raise ValueError(
                f"ivf_topk_sharded: shard {i} ({index_dirs[i]}) has a "
                f"different quantizer than shard 0 — shards must be "
                f"built with the same centroids= (one training run)")
    parts = [ivf_topk(spark, d, probe, k, nprobe=nprobe, id_col=id_col,
                      vec_col=vec_col, exclude=exclude,
                      tombstones_from=t, filters=filters,
                      metadata=metadata, centroids=cents[0])
             for d, t in zip(index_dirs, ts)]
    out = _union_all(parts)
    return out.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def suggest_sharded(shards, term: str, k: int = 5,
                    max_dist: int = 2) -> list[tuple[str, int, int]]:
    """Did-you-mean over the federation — exact vs a unified index by
    the same argument as pattern expansion (T23's global rule): each
    shard contributes its UNCAPPED fuzzy candidate set (bounded by
    MAX_EXPANSION_CANDIDATES), dfs sum across shards (docs partition,
    so per-shard dfs add), and the (distance ASC, df DESC, term ASC)
    rank + cap apply ONCE globally. Per-shard top-k lists would NOT
    merge exactly: a term just under one shard's cap can rank
    globally."""
    if not shards:
        raise ValueError("no shards")
    from collections import Counter

    from ..functions.patterns import rank_suggestions, suggest_base
    base = suggest_base(term)
    agg: Counter = Counter()
    for s in shards:
        agg.update(s._expand_candidates("fuzzy", base, int(max_dist)))
    return rank_suggestions(agg, base, k, max_dist)


def match_count_sharded(shards, text: str, mode: str = "or",
                        filters: dict | None = None) -> int:
    """Total hits over the federation. Counting needs NO global stats
    (same argument as facet_counts_sharded: shards partition the corpus
    and the match predicate is shard-local), so the exact federated
    count is the plain sum of per-shard counts — one int per shard
    crosses the driver, nothing else."""
    if not shards:
        raise ValueError("no shards")
    text, mode = _expand_pattern_text_sharded(shards, text, mode)
    from .facet_counts import match_count
    return sum(match_count(s, text, mode=mode, filters=filters)
               for s in shards)


def match_stats_sharded(shards, text: str, by: str = "dl",
                        mode: str = "or",
                        filters: dict | None = None) -> dict:
    """Numeric match-set summary over the federation
    (plans/facet_counts.match_stats's sharded twin). Stats compose
    exactly because shards partition the corpus: counts and sums add,
    min/max fold, avg recomputes from the folded sum — one 6-field
    dict per shard crosses the driver, nothing else."""
    if not shards:
        raise ValueError("no shards")
    text, mode = _expand_pattern_text_sharded(shards, text, mode)
    from .facet_counts import match_stats
    per = _fanout(
        lambda s: match_stats(s, text, by=by, mode=mode,
                              filters=filters), shards)
    out = {"n_docs": sum(p["n_docs"] for p in per),
           "n_values": sum(p["n_values"] for p in per)}
    vals = [p for p in per if p["n_values"]]
    if not vals:
        return {**out, "sum": None, "min": None, "max": None,
                "avg": None}
    s = sum(p["sum"] for p in vals)
    return {**out, "sum": s,
            "min": min(p["min"] for p in vals),
            "max": max(p["max"] for p in vals),
            "avg": s / out["n_values"]}


def match_cardinality_sharded(shards, text: str, by: str = "repo",
                              mode: str = "or",
                              filters: dict | None = None) -> dict:
    """Exact distinct-value count over the federation's match set
    (plans/facet_counts.match_cardinality's sharded twin). Unlike the
    other aggregations, per-shard CARDINALITIES do not add (the same
    repo can match in many shards), so this is the one federated
    aggregate that must union VALUES, not fold scalars: each shard's
    match-ids frame joins its column-pruned docs table, the per-shard
    value frames union (shards partition the corpus, so the union IS
    the unified match set's value multiset), and one
    count/countDistinct agg finishes — a single Spark action whose
    distinct state is bounded by the column's cardinality, never the
    corpus."""
    if not shards:
        raise ValueError("no shards")
    text, mode = _expand_pattern_text_sharded(shards, text, mode)
    from pyspark.sql import functions as F

    from .facet_counts import match_ids
    frames = []
    for s in shards:
        if by not in s._docs.columns:
            raise ValueError(f"match_cardinality_sharded: {by!r} is "
                             f"not a docs metadata column on every "
                             f"shard (available: "
                             f"{sorted(s._docs.columns)})")
        frames.append(s._docs.select("doc_id", F.col(by).alias("v"))
                      .join(match_ids(s, text, mode, filters), "doc_id")
                      .select("v"))
    row = (_union_all(frames)
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.count("v").alias("n_values"),
                F.countDistinct("v").alias("cardinality"))
           .collect()[0])
    return {"n_docs": int(row["n_docs"]),
            "n_values": int(row["n_values"]),
            "cardinality": int(row["cardinality"])}


def match_docs_sharded(shards, text: str, mode: str = "or",
                       filters: dict | None = None, columns=None):
    """Bulk match-set export over the federation
    (plans/facet_counts.match_docs's sharded twin): the union of each
    shard's export with a leading ``shard`` index column — there is no
    global doc id across shards, so callers key on the (repo, path)
    identity (or fetch back into the owning shard via ``shard`` +
    local doc_id). One pruned scan + one docs join per shard, the
    union is metadata-only; nothing collects on the driver."""
    from pyspark.sql import functions as F

    from .facet_counts import match_docs
    if not shards:
        raise ValueError("no shards")
    text, mode = _expand_pattern_text_sharded(shards, text, mode)
    frames = [match_docs(s, text, mode=mode, filters=filters,
                         columns=columns)
              .select(F.lit(i).alias("shard"), "*")
              for i, s in enumerate(shards)]
    uni = frames[0]
    for f in frames[1:]:
        uni = uni.unionByName(f)
    return uni


def match_percentiles_sharded(shards, text: str, by: str = "dl",
                              qs=(0.25, 0.5, 0.75, 0.95),
                              mode: str = "or",
                              filters: dict | None = None) -> dict:
    """EXACT match-set percentiles over the federation
    (plans/facet_counts.match_percentiles's sharded twin). Percentiles
    do NOT fold from per-shard summaries (a median of medians is not
    the median), so the federation aggregates the union of the shards'
    matched doc-values: when EVERY shard's match work fits its local
    budget, the per-shard numpy value arrays concatenate on the driver
    (bounded by the same budget that bounds each shard's own local
    path); otherwise ALL shards switch to their distributed match-ids
    frames, union into one column-pruned doc-values frame, and a
    single exact ``percentile`` aggregate runs over it — one job for
    the whole federation, memory O(distinct values of ``by``)."""
    import numpy as np

    from .facet_counts import (_check_qs, _match_ids_distributed,
                               _require_numeric_column,
                               _salt_matches_local)
    from .sortby import _local_ids_keys
    if not shards:
        raise ValueError("no shards")
    text, mode = _expand_pattern_text_sharded(shards, text, mode)
    qs = _check_qs(qs)
    for s in shards:
        _require_numeric_column(s, by, "match_percentiles_sharded")
    empty = {"n_docs": 0, "n_values": 0,
             "percentiles": {q: None for q in qs}}
    # per-shard match + doc-values read through the same fan-out knob
    # every federated surface uses (FANOUT_THREADS; serial by measured
    # default) — latency shape matches the stats/count twins
    per = _fanout(lambda s: _salt_matches_local(s, text, mode, filters),
                  shards)

    def _vals(sa):
        """(non-null float64 values, n_matched) for one within-budget
        shard — its already-computed local match, never re-run."""
        s, arrs = sa
        if not arrs:
            return np.empty(0, dtype=np.float64), 0
        ids = np.sort(np.concatenate(arrs))
        keys = _local_ids_keys(s, ids, by)["key"]
        return (keys.combine_chunks().drop_null().to_numpy(
            zero_copy_only=False).astype(np.float64), int(ids.size))

    local_pairs = [(s, arrs) for s, (arrs, _) in zip(shards, per)
                   if arrs is not None]
    got_local = _fanout(_vals, local_pairs) if local_pairs else []
    n_docs_local = sum(n for _, n in got_local)
    vals_local = [v for v, _ in got_local if v.size]
    if len(local_pairs) == len(shards):
        # every shard within budget → pure driver-side numpy
        if n_docs_local == 0:
            return empty
        if not vals_local:
            return {**empty, "n_docs": n_docs_local}
        allv = np.concatenate(vals_local)
        pct = np.quantile(allv, qs)
        return {"n_docs": n_docs_local, "n_values": int(allv.size),
                "percentiles": dict(zip(qs, (float(p) for p in pct)))}
    # mixed/over-budget: ONLY the shards the budget refused re-match
    # distributed; the within-budget shards' already-read values ship
    # as one literal frame (bounded by each shard's own local budget),
    # so their segment scans never run twice. Their null-valued match
    # rows stay a driver-side count (n_docs correction below) rather
    # than shipped NULL rows.
    from pyspark.sql import functions as F
    frames = []
    for s, (arrs, fgroups) in zip(shards, per):
        if arrs is not None:
            continue
        ids = _match_ids_distributed(s, text, mode, fgroups)
        if ids is None:
            continue
        cols = list(dict.fromkeys(["doc_id", by]))
        frames.append(s._docs.select(*cols).join(ids, "doc_id")
                      .select(F.col(by).cast("double").alias("key")))
    n_null_local = n_docs_local - sum(int(v.size) for v in vals_local)
    if vals_local:
        import pandas as pd
        frames.append(shards[0].spark.createDataFrame(
            pd.DataFrame({"key": np.concatenate(vals_local)}),
            "key double"))
    if not frames:
        return {**empty, "n_docs": n_docs_local}
    uni = frames[0]
    for f in frames[1:]:
        uni = uni.unionByName(f)
    row = uni.agg(F.count(F.lit(1)).alias("n_docs"),
                  F.count("key").alias("n_values"),
                  F.percentile(F.col("key"),
                               F.array(*[F.lit(q) for q in qs]))
                  .alias("pct")).collect()[0]
    n_docs = int(row["n_docs"]) + n_null_local
    n_vals = int(row["n_values"])
    if n_docs == 0:
        return empty
    if n_vals == 0:
        return {**empty, "n_docs": n_docs}
    return {"n_docs": n_docs, "n_values": n_vals,
            "percentiles": dict(zip(qs, (float(p) for p in row["pct"])))}


def sorted_topk_sharded(shards, text: str, by: str = "dl", k: int = 10,
                        descending: bool = True, mode: str = "or",
                        filters: dict | None = None) -> list[tuple]:
    """Field-sorted top-k over the federation — [(rank, shard, doc_id,
    key, repo, path)] (plans/sortby.sorted_topk's sharded twin; doc_id
    is shard-local like every federated row). The <= shards*k merge is
    EXACT by the ranked-search containment argument: shards partition
    the corpus, so any doc in the global field-ordered top-k is in its
    own shard's — and it needs NO stats phase, because a field order
    (unlike BM25) has no corpus-global inputs. Ties merge on
    (repo, path), which equals the unified index's doc_id tie-break by
    the dense-id construction."""
    if not shards:
        raise ValueError("no shards")
    text, mode = _expand_pattern_text_sharded(shards, text, mode)
    from .sortby import sorted_topk
    per_shard = _fanout(
        lambda idx: sorted_topk(idx, text, by=by, k=k,
                                descending=descending, mode=mode,
                                filters=filters),
        shards)
    rows = [(key, repo, path, si, did)
            for si, rs in enumerate(per_shard)
            for _rk, did, key, repo, path in rs]
    present = [r for r in rows if r[0] is not None]
    absent = sorted((r for r in rows if r[0] is None),
                    key=lambda r: (r[1], r[2]))
    present.sort(key=lambda r: (r[1], r[2]))      # (repo, path) ties
    present.sort(key=lambda r: r[0], reverse=descending)  # stable
    return [(rk, si, did, key, repo, path)
            for rk, (key, repo, path, si, did)
            in enumerate((present + absent)[:k], start=1)]


def facet_counts_sharded(shards, text: str, facet, mode: str = "or",
                         filters: dict | None = None):
    """Facet histogram over the federation's match set — the search-UI
    companion to `search_rows_sharded`. Unlike ranking, counting needs
    NO global stats: shards partition the corpus and the match
    predicate (term presence, facet filters, tombstones) is evaluated
    entirely inside each shard, so the per-shard histograms
    (plans/facet_counts.py — each a bounded O(salts × values) result)
    sum EXACTLY. The merge is a values-sized groupBy, corpus- and
    shard-count-independent."""
    if not shards:
        raise ValueError("no shards")
    text, mode = _expand_pattern_text_sharded(shards, text, mode)
    from pyspark.sql import functions as F

    from .facet_counts import facet_counts
    parts = [facet_counts(s, text, facet, mode=mode, filters=filters)
             for s in shards]
    out = _union_all(parts)
    keys = [c for c in out.columns if c != "n_docs"]
    return out.groupBy(*keys).agg(
        F.sum("n_docs").cast("long").alias("n_docs"))


def range_counts_sharded(shards, text: str, facet: str, shift: int,
                         mode: str = "or",
                         filters: dict | None = None):
    """Binned numeric histogram over the federation's match set
    (plans/facet_counts.range_counts per shard). Exact for the same
    reason facet_counts_sharded is — counting needs no global stats —
    and the bins are globally consistent because every shard derives
    them from the same trie encoding at the same level: bin boundaries
    are pure arithmetic on 2^shift, so per-shard (bin_lo, bin_hi) rows
    sum without any alignment step. Each shard validates ``shift``
    against its OWN indexed range_step (a layout property), so a
    federation of differently-stepped shards fails loudly rather than
    merging incompatible levels."""
    if not shards:
        raise ValueError("no shards")
    text, mode = _expand_pattern_text_sharded(shards, text, mode)
    from pyspark.sql import functions as F

    from .facet_counts import range_counts
    parts = [range_counts(s, text, facet, shift, mode=mode,
                          filters=filters) for s in shards]
    out = _union_all(parts)
    return out.groupBy("bin_lo", "bin_hi").agg(
        F.sum("n_docs").cast("long").alias("n_docs"))


#: federated collapse row: a group may SPAN shards (the sharding
#: invariant is per (repo, path) doc, not per group value), so the
#: merge re-picks each group's representative across shards; shard +
#: shard-local doc_id identify the winner for fetch-back. group_hits
#: is OMITTED: a shard reports counts only for the groups in its own
#: top-k, so cross-shard totals would be silently understated — the
#: exact count is one facet_counts/match_count call away when needed.
COLLAPSE_SHARDED_SCHEMA = ("query_id int, rank int, shard int, "
                           "grp string, doc_id long, score double, "
                           "repo string, path string")


def collapse_rows_sharded(shards, queries: list[tuple[int, str, int]],
                          by: str = "repo", mode: str = "or",
                          filters: dict | None = None,
                          min_match: int | dict | None = None
                          ) -> list[tuple]:
    """Field collapsing over the federation (plans/collapse.py's
    sharded twin): [(query_id, rank, shard, grp, doc_id, score, repo,
    path)] — the k best GROUPS per query, each represented by its
    best doc across ALL shards. Exact by the standard containment
    argument applied to groups: a group's global best doc lives in
    some shard, where it is that group's shard-best; any k groups
    outranking it THERE have global bests at least as good, so every
    global top-k group appears in at least one shard's top-k group
    list. Merge = per-(query, group) best across shards on
    (score desc, repo, path) — the unified index's (score, doc_id)
    tie-break under the dense-id construction — then ranking the
    group bests the same way."""
    terms = [t for _, text, _ in queries for t in tokenize_py(text)]
    stats = global_stats(shards, terms)
    from .collapse import collapse_rows
    per_shard = _fanout(
        lambda idx: collapse_rows(idx, queries, by=by, mode=mode,
                                  filters=filters, stats=stats,
                                  min_match=min_match),
        shards)
    best: dict[tuple, tuple] = {}
    for si, rows in enumerate(per_shard):
        for qid, _, g, hr, did, score, _n, repo, path in rows:
            if hr != 1:
                continue
            cur = best.get((qid, g))
            cand = (-score, repo, path, si, did)
            if cur is None or cand < cur:
                best[(qid, g)] = cand
    ks = {qid: k for qid, _, k in queries}
    merged: dict[int, list] = {}
    for (qid, g), (ns, repo, path, si, did) in best.items():
        merged.setdefault(qid, []).append((ns, repo, path, si, did, g))
    out = []
    for qid in sorted(merged):
        rows = sorted(merged[qid])[:ks[qid]]
        out.extend((qid, rk + 1, si, did, -ns, repo, path, g)
                   for rk, (ns, repo, path, si, did, g) in enumerate(rows))
    # reorder to the documented column shape
    return [(qid, rk, si, g, did, score, repo, path)
            for qid, rk, si, did, score, repo, path, g in out]
