"""spark-submit entry point B — batch top-k query.

    spark-submit --py-files dist/engine.zip scripts/query.py \
        --index /idx --query "block max wand" -k 10
    spark-submit --py-files dist/engine.zip scripts/query.py \
        --index /idx --queries queries.parquet --out results/
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--index")
    g.add_argument("--shards", metavar="DIR,DIR[,...]",
                   help="federated search over a comma list of shard "
                        "index dirs with exact global-stats BM25 "
                        "(plans/sharded.py); composes with --mode/"
                        "--filter/--phrase/--facet-counts/--snippets")
    ap.add_argument("--query", default=None)
    ap.add_argument("-k", type=int, default=10)
    ap.add_argument("--queries", default=None,
                    help="parquet with (query_id, query, k)")
    ap.add_argument("--mode", default="or", choices=["or", "and",
                                                     "pattern", "bool"],
                    help="'and' = docs must contain EVERY query term; "
                         "'pattern' = query atoms may be prefix (va*), "
                         "fuzzy (joun~1), wildcard (va*ble, te?t) or "
                         "regexp (/jo(in|urnal)/, whole-term) "
                         "patterns, expanded against "
                         "the dictionary (df-ranked, capped); 'bool' = "
                         "the query is a nested boolean expression, "
                         "e.g. 'spark AND (join OR filter) AND NOT go' "
                         "(operators UPPERCASE; negations constrain, "
                         "never score)")
    ap.add_argument("--min-match", type=int, default=None, metavar="M",
                    help="with --mode or: minimum_should_match — only "
                         "docs containing at least M distinct query "
                         "terms rank (scores unchanged for survivors); "
                         "M = the term count behaves like --mode and")
    ap.add_argument("--collapse", default=None, metavar="COL[:N]",
                    help="field collapsing (ES collapse): rank the k "
                         "best GROUPS of docs column COL, each "
                         "represented by its best-scoring doc; :N "
                         "returns each group's top-N docs (inner_hits, "
                         "unified index only). Composes with --mode "
                         "or/and, --filter, --min-match, --queries")
    ap.add_argument("--max-expansions", type=int, default=None,
                    help="with --mode pattern: per-pattern dictionary "
                         "expansion cap (default config.MAX_TERM_"
                         "EXPANSIONS)")
    ap.add_argument("--phrase", action="store_true",
                    help="treat --query as an exact phrase (index must be "
                         "built with --positions); ranks the docs whose "
                         "token stream contains the sequence consecutively")
    ap.add_argument("--slop", type=int, default=0,
                    help="with --phrase: allow the terms IN ORDER within "
                         "this many extra tokens (0 = exact adjacency)")
    ap.add_argument("--filter", action="append", default=[],
                    metavar="COL=VALUE[,VALUE...]",
                    help="facet filter (repeatable); a comma list is an OR "
                         "within the column, COL!=VALUE[,...] negates "
                         "(docs with a listed value are excluded), and "
                         "separate --filter flags AND together; COL=LO..HI "
                         "is an inclusive numeric range over a range-facet "
                         "column (either bound may be omitted; COL!=LO..HI "
                         "negates); index must be built with --facets / "
                         "--range-facets")
    ap.add_argument("--boost", action="store_true",
                    help="parse trailing ^W weights on query atoms "
                         "(term^2, term^0.5 — W a positive decimal): "
                         "that term's BM25 contribution is multiplied "
                         "by W; works on --index and --shards with "
                         "--mode or/and, --filter and --queries")
    ap.add_argument("--synonym", action="append", default=[],
                    metavar="HEAD=S1[,S2...]",
                    help="query-time synonym group (repeatable; the "
                         "Lucene SynonymQuery construct): a query "
                         "token equal to HEAD scores as ONE blended "
                         "clause over {HEAD, S1, ...} — member tfs sum "
                         "before the BM25 saturation under one idf "
                         "from the max member df; ranked --mode or "
                         "search only, on --index and --shards")
    ap.add_argument("--suggest", default=None, metavar="TERM",
                    help="print did-you-mean suggestions for TERM "
                         "(top -k by distance then df) instead of "
                         "searching — works on --index and --shards")
    ap.add_argument("--count", action="store_true",
                    help="print the TOTAL HITS of --query (respecting "
                         "--mode or/and and --filter) instead of "
                         "ranking — works on --index and --shards")
    ap.add_argument("--rescore", default=None,
                    metavar="COL[:WINDOW[:WEIGHT]]",
                    help="re-rank the top-WINDOW (default 100) primary "
                         "candidates by bm25 + WEIGHT (default 1.0) × "
                         "this NUMERIC docs column, then return the "
                         "top-k (ES rescore × field_value_factor); "
                         "composes with --mode or/and, --filter, "
                         "--min-match, --queries; unified index only")
    ap.add_argument("--significant", type=int, default=None,
                    metavar="K",
                    help="print the K most significant terms of "
                         "--query's match set (ES significant_terms, "
                         "JLH-scored foreground lift vs corpus df; "
                         "respects --mode or/and and --filter) instead "
                         "of ranking — an O(index) analytics job, "
                         "unified index only")
    ap.add_argument("--cardinality", default=None, metavar="COL",
                    help="print a JSON cardinality aggregation "
                         "(n_docs, n_values, cardinality = exact "
                         "distinct values) of this docs column over "
                         "--query's FULL match set (respecting --mode "
                         "or/and and --filter) instead of ranking — "
                         "works on --index and --shards")
    ap.add_argument("--stats", default=None, metavar="COL",
                    help="print a JSON stats aggregation (n_docs, "
                         "n_values, sum, min, max, avg) of this NUMERIC "
                         "docs column over --query's FULL match set "
                         "(respecting --mode or/and and --filter) "
                         "instead of ranking — works on --index and "
                         "--shards")
    ap.add_argument("--percentiles", default=None,
                    metavar="COL[:Q,Q,...]",
                    help="print a JSON EXACT-percentiles aggregation of "
                         "this NUMERIC docs column over --query's FULL "
                         "match set (fractions in [0,1], default "
                         ".25,.5,.75,.95; respecting --mode or/and and "
                         "--filter) instead of ranking — works on "
                         "--index and --shards")
    ap.add_argument("--export", default=None, nargs="?", const="",
                    metavar="COL[,COL...]",
                    help="export the FULL match set of --query as docs "
                         "metadata rows (given columns; bare --export = "
                         "all) instead of ranking — the training-"
                         "pipeline feed; respects --mode or/and and "
                         "--filter, works on --index and --shards; "
                         "combine with --out to write parquet (large "
                         "match sets should always use --out)")
    ap.add_argument("--facet-counts", default=None, metavar="COL",
                    help="instead of top-k rows, print the per-value "
                         "document counts of this facet column over the "
                         "query's FULL match set (index must be built "
                         "with --facets); for a range-facet column add "
                         "--bin-shift")
    ap.add_argument("--bin-shift", type=int, default=None, metavar="S",
                    help="with --facet-counts over a RANGE-facet column: "
                         "print a binned histogram with 2^S-wide bins "
                         "(S must be a multiple of the index's trie step)")
    ap.add_argument("--sort", default=None, metavar="COL[:asc|desc]",
                    help="order the match set by this docs metadata "
                         "column (e.g. dl:desc — longest matching docs "
                         "first) instead of BM25 score; respects "
                         "--mode or/and and --filter; works on --index "
                         "and --shards")
    ap.add_argument("--offset", type=int, default=0,
                    help="offset pagination: print ranking rows "
                         "offset+1..offset+k, re-ranked 1..k (the ES "
                         "from+size shape — deep pages pay offset+k "
                         "retrieval; --index only, --mode or/and)")
    ap.add_argument("--after", default=None, metavar="SCORE:DOC_ID",
                    help="cursor pagination: print the k ranking rows "
                         "strictly AFTER this cursor — the previous "
                         "page's last row — at depth-independent cost; "
                         "on --index the cursor is SCORE:DOC_ID, on "
                         "--shards SCORE:REPO:PATH (the federated "
                         "merge ordering key); --mode or/and/bool")
    ap.add_argument("--snippets", default=None, metavar="CORPUS",
                    help="annotate each hit with a context snippet "
                         "fetched from this corpus parquet path "
                         "(repo, path, commit, lang, content)")
    ap.add_argument("--window", type=int, default=3,
                    help="with --snippets: tokens of context either side "
                         "of the matched term")
    ap.add_argument("--out", default=None, help="write results parquet here")
    a = ap.parse_args()
    if not a.query and not a.queries and not a.suggest:
        ap.error("need --query or --queries (or --suggest TERM)")
    if (a.mode in ("pattern", "bool") and (a.snippets or a.phrase)) \
            or (a.mode == "bool" and a.facet_counts):
        # the later elif chains dispatch on those flags first and would
        # feed these modes into surfaces that reject them deep in the
        # stack — refuse the combination at the argparse level instead
        # (--facet-counts DOES take --mode pattern: the match surfaces
        # expand pattern atoms like search does)
        ap.error(f"--mode {a.mode} does not compose with "
                 "--facet-counts/--snippets/--phrase")
    if a.export is not None and (
            a.queries or a.phrase or a.facet_counts or a.snippets
            or a.stats or a.percentiles or a.count or a.sort
            or a.offset or a.after or a.boost
            or a.mode not in ("or", "and", "pattern")):
        # argparse-cheap, before Spark starts (like the checks above)
        ap.error("--export takes a single --query with --mode "
                 "or/and/pattern and --filter only")
    if a.boost and (a.phrase or a.facet_counts or a.snippets or a.count
                    or a.stats or a.percentiles or a.sort or a.offset
                    or a.after or a.mode not in ("or", "and")):
        # later branches dispatch on those flags first and would
        # silently drop the ^W weights — refuse instead (argparse-cheap,
        # before Spark starts)
        ap.error("--boost composes with --mode or/and, --filter and "
                 "--queries only")
    if a.max_expansions is not None and (
            a.mode != "pattern"
            or a.facet_counts or a.count or a.stats or a.percentiles
            or a.cardinality or a.significant is not None or a.sort
            or a.export is not None or a.suggest):
        # the flag is read only by the ranked pattern-search dispatch;
        # match surfaces expand at the config default cap — refuse
        # rather than silently compute at a different cap than asked
        ap.error("--max-expansions applies to ranked --mode pattern "
                 "search only (match surfaces expand at the "
                 "config.MAX_TERM_EXPANSIONS default)")
    if a.synonym and (
            a.phrase or a.facet_counts or a.snippets or a.count
            or a.stats or a.percentiles or a.cardinality or a.collapse
            or a.significant is not None or a.sort or a.offset
            or a.after or a.boost or a.export is not None or a.suggest
            or a.rescore or a.min_match is not None or a.mode != "or"):
        # same pre-Spark rule as --boost/--min-match: later dispatch
        # branches would silently drop the groups
        ap.error("--synonym composes with ranked --mode or search "
                 "(--query/--queries, --filter) only")
    if a.min_match is not None and (
            a.phrase or a.facet_counts or a.snippets or a.count
            or a.stats or a.percentiles or a.cardinality or a.sort
            or a.offset or a.after or a.boost or a.export is not None
            or a.mode != "or"):
        # same shape as the --boost guard: later branches dispatch on
        # those flags first and would silently drop the threshold
        ap.error("--min-match composes with --mode or ranked search "
                 "(--query/--queries, --filter) only")
    if a.collapse and (
            a.phrase or a.facet_counts or a.snippets or a.count
            or a.stats or a.percentiles or a.sort or a.offset
            or a.after or a.boost or a.export is not None or a.rescore
            or a.mode not in ("or", "and")):
        # pre-Spark, before the dispatch chain: --sort/--offset/...
        # branches run first and would silently ignore the collapse
        ap.error("--collapse composes with --mode or/and ranked search "
                 "(--query/--queries, --filter, --min-match) only")
    if a.rescore and (
            a.phrase or a.facet_counts or a.snippets or a.count
            or a.stats or a.percentiles or a.cardinality or a.collapse
            or a.significant is not None or a.sort or a.offset
            or a.after or a.boost or a.export is not None or a.shards
            or a.mode not in ("or", "and")):
        # same pre-Spark rule: earlier dispatch branches would
        # otherwise run and silently drop the rescore
        ap.error("--rescore composes with --mode or/and ranked search "
                 "(--query/--queries, --filter, --min-match) on "
                 "--index only")
    if a.significant is not None and (
            a.phrase or a.facet_counts or a.snippets or a.count
            or a.stats or a.percentiles or a.cardinality or a.collapse
            or a.sort or a.offset or a.after or a.boost
            or a.export is not None or a.shards or a.queries
            or a.mode not in ("or", "and", "pattern")):
        ap.error("--significant K takes a single --query on --index "
                 "(with --mode/--filter) only")
    if a.cardinality and (
            a.phrase or a.facet_counts or a.snippets or a.count
            or a.stats or a.percentiles or a.collapse or a.sort
            or a.offset or a.after or a.boost or a.export is not None
            or a.queries or a.mode not in ("or", "and", "pattern")):
        ap.error("--cardinality COL takes a single --query (with "
                 "--mode/--filter) only")

    synonyms = None
    if a.synonym:
        synonyms = {}
        for spec in a.synonym:
            head, sep, vals = spec.partition("=")
            if not sep or not head or not vals:
                ap.error(f"--synonym spec {spec!r} must be "
                         f"HEAD=S1[,S2...]")
            synonyms.setdefault(head, []).extend(vals.split(","))

    from pyspark.sql import SparkSession
    from donkey_spark.plans.query import Index

    spark = SparkSession.builder.appName("donkey_query").getOrCreate()
    idx = Index(spark, a.index) if a.index else None
    if a.suggest:
        if (a.query or a.queries or a.count or a.stats or a.percentiles
                or a.phrase or a.facet_counts or a.snippets or a.filter
                or a.boost or a.export is not None
                or a.min_match is not None or a.collapse):
            ap.error("--suggest TERM stands alone (optionally -k)")
        if a.shards:
            from donkey_spark.plans.sharded import (open_shards,
                                                    suggest_sharded)
            rows = suggest_sharded(open_shards(spark,
                                               a.shards.split(",")),
                                   a.suggest, k=a.k)
        else:
            rows = idx.suggest(a.suggest, k=a.k)
        for t, d, df in rows:
            print(f"{t}\t{d}\t{df}")
        return
    if a.query:
        batch = [(0, a.query, a.k)]
    else:
        batch = [(int(r["query_id"]), r["query"], int(r["k"]))
                 for r in spark.read.parquet(a.queries).collect()]
    from donkey_spark.functions.filters import parse_filter_specs
    filters = parse_filter_specs(a.filter)
    if a.bin_shift is not None and not a.facet_counts:
        ap.error("--bin-shift needs --facet-counts COL")
    if a.export is not None:
        cols = tuple(c for c in a.export.split(",") if c) or None
        if a.shards:
            from donkey_spark.plans.sharded import (match_docs_sharded,
                                                    open_shards)
            res = match_docs_sharded(
                open_shards(spark, a.shards.split(",")), a.query,
                mode=a.mode, filters=filters, columns=cols)
        else:
            from donkey_spark.plans.facet_counts import match_docs
            res = match_docs(idx, a.query, mode=a.mode,
                             filters=filters, columns=cols)
        if a.out:
            res.write.mode("overwrite").parquet(a.out)
        else:
            res.show(100, truncate=False)
        return
    if a.after is not None:
        if (a.queries or a.phrase or a.facet_counts or a.snippets
                or a.count or a.stats or a.percentiles or a.sort
                or a.offset or a.mode == "pattern"):
            ap.error("--after takes a single --query with --mode "
                     "or/and/bool and --filter only")
        if a.shards:
            from donkey_spark.plans.sharded import (RESULT_SCHEMA,
                                                    open_shards,
                                                    search_after_sharded)
            parts = a.after.split(":", 2)
            if len(parts) != 3:
                ap.error("--after with --shards takes SCORE:REPO:PATH")
            cur = (float(parts[0]), parts[1], parts[2])
            res = spark.createDataFrame(
                search_after_sharded(open_shards(spark,
                                                 a.shards.split(",")),
                                     batch, {0: cur}, mode=a.mode,
                                     filters=filters), RESULT_SCHEMA)
        else:
            from donkey_spark.plans.query import _RESULT_SCHEMA
            s, _, d = a.after.partition(":")
            if not d:
                ap.error("--after takes SCORE:DOC_ID")
            res = spark.createDataFrame(
                idx.search_rows_after(batch, {0: (float(s), int(d))},
                                      mode=a.mode, filters=filters),
                _RESULT_SCHEMA)
        if a.out:
            res.write.mode("overwrite").parquet(a.out)
        else:
            res.show(100, truncate=False)
        return
    if a.offset:
        if (a.shards or a.phrase or a.facet_counts or a.snippets
                or a.count or a.stats or a.percentiles or a.sort
                or a.mode not in ("or", "and")):
            ap.error("--offset works on --index with --mode or/and "
                     "and --filter only (deep walks: use --after, "
                     "which is also the federated pager)")
        from donkey_spark.plans.query import _RESULT_SCHEMA
        res = spark.createDataFrame(
            idx.search_rows_page(batch, offset=a.offset, mode=a.mode,
                                 filters=filters), _RESULT_SCHEMA)
        if a.out:
            res.write.mode("overwrite").parquet(a.out)
        else:
            res.show(100, truncate=False)
        return
    if a.sort:
        if (a.queries or a.phrase or a.facet_counts or a.snippets
                or a.count or a.stats or a.percentiles
                or a.mode not in ("or", "and", "pattern")):
            ap.error("--sort takes a single --query with --mode "
                     "or/and/pattern and --filter only")
        col, _, direction = a.sort.partition(":")
        if direction not in ("", "asc", "desc"):
            ap.error(f"--sort direction must be asc or desc, "
                     f"got {direction!r}")
        desc_ = direction != "asc"
        if a.shards:
            from donkey_spark.plans.sharded import (open_shards,
                                                    sorted_topk_sharded)
            rows = [(rk, si, did, None if key is None else str(key),
                     repo, path)
                    for rk, si, did, key, repo, path in
                    sorted_topk_sharded(
                        open_shards(spark, a.shards.split(",")), a.query,
                        by=col, k=a.k, descending=desc_, mode=a.mode,
                        filters=filters)]
            res = spark.createDataFrame(
                rows, "rank int, shard int, doc_id long, key string, "
                      "repo string, path string")
        else:
            from donkey_spark.plans.sortby import sorted_topk_df
            res = sorted_topk_df(idx, a.query, by=col, k=a.k,
                                 descending=desc_, mode=a.mode,
                                 filters=filters)
        if a.out:
            res.write.mode("overwrite").parquet(a.out)
        else:
            res.show(100, truncate=False)
        return
    if a.collapse:
        col, _, n = a.collapse.partition(":")
        inner = int(n) if n else 1
        if a.shards:
            if inner != 1:
                ap.error("--collapse COL:N inner hits are "
                         "unified-index only")
            from donkey_spark.plans.sharded import (
                COLLAPSE_SHARDED_SCHEMA, collapse_rows_sharded,
                open_shards)
            rows = [(qid, rk, si, None if g is None else str(g), did,
                     s, repo, path)
                    for qid, rk, si, g, did, s, repo, path in
                    collapse_rows_sharded(
                        open_shards(spark, a.shards.split(",")), batch,
                        by=col, mode=a.mode, filters=filters,
                        min_match=a.min_match)]
            res = spark.createDataFrame(rows, COLLAPSE_SHARDED_SCHEMA)
        else:
            from donkey_spark.plans.collapse import collapse_df
            res = collapse_df(idx, batch, by=col, mode=a.mode,
                              filters=filters, inner_hits=inner,
                              min_match=a.min_match)
        if a.out:
            res.write.mode("overwrite").parquet(a.out)
        else:
            res.show(100, truncate=False)
        return
    if a.count:
        if a.queries or a.phrase or a.facet_counts or a.snippets \
                or a.stats or a.percentiles:
            ap.error("--count takes a single --query (with --mode/"
                     "--filter) and no --phrase/--facet-counts/"
                     "--snippets/--stats")
        if a.mode not in ("or", "and", "pattern"):
            ap.error("--count supports --mode or/and/pattern")
        if a.shards:
            from donkey_spark.plans.sharded import (match_count_sharded,
                                                    open_shards)
            n = match_count_sharded(open_shards(spark,
                                                a.shards.split(",")),
                                    a.query, mode=a.mode,
                                    filters=filters)
        else:
            from donkey_spark.plans.facet_counts import match_count
            n = match_count(idx, a.query, mode=a.mode, filters=filters)
        print(n)
        return
    if a.percentiles:
        if (a.queries or a.phrase or a.facet_counts or a.snippets
                or a.stats or a.count or a.sort):
            ap.error("--percentiles COL takes a single --query (with "
                     "--mode/--filter) and no other aggregation/"
                     "ranking flag")
        if a.mode not in ("or", "and", "pattern"):
            ap.error("--percentiles supports --mode or/and/pattern")
        col, _, qpart = a.percentiles.partition(":")
        pqs = ([float(x) for x in qpart.split(",")] if qpart
               else (0.25, 0.5, 0.75, 0.95))
        if a.shards:
            from donkey_spark.plans.sharded import (
                match_percentiles_sharded, open_shards)
            s = match_percentiles_sharded(
                open_shards(spark, a.shards.split(",")), a.query,
                by=col, qs=pqs, mode=a.mode, filters=filters)
        else:
            from donkey_spark.plans.facet_counts import match_percentiles
            s = match_percentiles(idx, a.query, by=col, qs=pqs,
                                  mode=a.mode, filters=filters)
        import json
        s["percentiles"] = {str(q): v for q, v in s["percentiles"].items()}
        print(json.dumps(s))
        return
    if a.rescore:
        if (a.phrase or a.facet_counts or a.snippets or a.stats
                or a.percentiles or a.cardinality or a.collapse
                or a.count or a.sort or a.offset or a.after or a.boost
                or a.export is not None or a.shards
                or a.significant is not None
                or a.mode not in ("or", "and")):
            ap.error("--rescore composes with --mode or/and ranked "
                     "search (--query/--queries, --filter, "
                     "--min-match) on --index only")
        parts = a.rescore.split(":")
        if len(parts) > 3:
            ap.error("--rescore takes COL[:WINDOW[:WEIGHT]]")
        col = parts[0]
        window = int(parts[1]) if len(parts) > 1 and parts[1] else 100
        fw = float(parts[2]) if len(parts) > 2 else 1.0
        from donkey_spark.plans.rescore import rescore_rows
        res = spark.createDataFrame(
            rescore_rows(idx, batch, window=window, by=col,
                         field_weight=fw, mode=a.mode, filters=filters,
                         min_match=a.min_match),
            "query_id int, rank int, doc_id long, score double, "
            "base_score double, repo string, path string")
        if a.out:
            res.write.mode("overwrite").parquet(a.out)
        else:
            res.show(100, truncate=False)
        return
    if a.significant is not None:
        if (a.queries or a.phrase or a.facet_counts or a.snippets
                or a.stats or a.percentiles or a.cardinality
                or a.collapse or a.count or a.shards):
            ap.error("--significant K takes a single --query on "
                     "--index (with --mode/--filter) only")
        if a.mode not in ("or", "and", "pattern"):
            ap.error("--significant supports --mode or/and/pattern")
        from donkey_spark.plans.sigterms import significant_terms
        for t, fg, bg, s in significant_terms(
                idx, a.query, k=a.significant, mode=a.mode,
                filters=filters):
            print(f"{t}\t{fg}\t{bg}\t{s:.6f}")
        return
    if a.cardinality:
        if (a.queries or a.phrase or a.facet_counts or a.snippets
                or a.stats or a.percentiles or a.collapse):
            ap.error("--cardinality COL takes a single --query (with "
                     "--mode/--filter) only")
        if a.mode not in ("or", "and", "pattern"):
            ap.error("--cardinality supports --mode or/and/pattern")
        if a.shards:
            from donkey_spark.plans.sharded import (
                match_cardinality_sharded, open_shards)
            s = match_cardinality_sharded(
                open_shards(spark, a.shards.split(",")), a.query,
                by=a.cardinality, mode=a.mode, filters=filters)
        else:
            from donkey_spark.plans.facet_counts import match_cardinality
            s = match_cardinality(idx, a.query, by=a.cardinality,
                                  mode=a.mode, filters=filters)
        import json
        print(json.dumps(s))
        return
    if a.stats:
        if a.queries or a.phrase or a.facet_counts or a.snippets:
            ap.error("--stats COL takes a single --query (with "
                     "--mode/--filter) and no --phrase/"
                     "--facet-counts/--snippets")
        if a.mode not in ("or", "and", "pattern"):
            ap.error("--stats supports --mode or/and/pattern")
        if a.shards:
            from donkey_spark.plans.sharded import (match_stats_sharded,
                                                    open_shards)
            s = match_stats_sharded(open_shards(spark,
                                                a.shards.split(",")),
                                    a.query, by=a.stats, mode=a.mode,
                                    filters=filters)
        else:
            from donkey_spark.plans.facet_counts import match_stats
            s = match_stats(idx, a.query, by=a.stats, mode=a.mode,
                            filters=filters)
        import json
        print(json.dumps(s))
        return
    if a.shards:
        from donkey_spark.plans.sharded import (RESULT_SCHEMA,
                                                facet_counts_sharded,
                                                open_shards,
                                                search_phrase_sharded,
                                                search_sharded)
        if a.phrase:
            if a.queries or filters or a.facet_counts or a.snippets:
                ap.error("--phrase takes a single --query and no "
                         "--filter/--facet-counts/--snippets")
            res = spark.createDataFrame(
                search_phrase_sharded(open_shards(spark,
                                                  a.shards.split(",")),
                                      a.query, k=a.k, slop=a.slop),
                RESULT_SCHEMA)
        elif a.facet_counts:
            if a.queries:
                ap.error("--facet-counts takes a single --query")
            if a.bin_shift is not None:
                from donkey_spark.plans.sharded import range_counts_sharded
                res = range_counts_sharded(
                    open_shards(spark, a.shards.split(",")), a.query,
                    a.facet_counts, a.bin_shift, mode=a.mode,
                    filters=filters)
            else:
                res = facet_counts_sharded(
                    open_shards(spark, a.shards.split(",")), a.query,
                    a.facet_counts, mode=a.mode, filters=filters)
        elif a.snippets:
            from donkey_spark.plans.snippets import search_snippets_sharded
            res = search_snippets_sharded(
                open_shards(spark, a.shards.split(",")),
                spark.read.parquet(a.snippets), batch,
                window=a.window, mode=a.mode, filters=filters)
        elif a.mode == "pattern":
            from donkey_spark.plans.sharded import search_pattern_sharded
            res = spark.createDataFrame(
                search_pattern_sharded(
                    open_shards(spark, a.shards.split(",")), batch,
                    filters=filters, max_expansions=a.max_expansions),
                RESULT_SCHEMA)
        elif a.mode == "bool":
            from donkey_spark.plans.sharded import search_bool_sharded
            res = spark.createDataFrame(
                search_bool_sharded(
                    open_shards(spark, a.shards.split(",")), batch,
                    filters=filters),
                RESULT_SCHEMA)
        elif a.boost:
            from donkey_spark.plans.sharded import search_boosted_sharded
            res = spark.createDataFrame(
                search_boosted_sharded(
                    open_shards(spark, a.shards.split(",")), batch,
                    mode=a.mode, filters=filters), RESULT_SCHEMA)
        else:
            res = search_sharded(spark, a.shards.split(","), batch,
                                 mode=a.mode, filters=filters,
                                 min_match=a.min_match,
                                 synonyms=synonyms)
    elif a.facet_counts:
        if a.phrase or a.queries:
            ap.error("--facet-counts takes a single --query "
                     "(optionally --mode/--filter) and no --phrase")
        # --filter composes: faceted navigation (counts over the
        # FILTERED match set — the histogram a UI shows while other
        # filter groups are active)
        if a.bin_shift is not None:
            from donkey_spark.plans.facet_counts import range_counts
            res = range_counts(idx, a.query, a.facet_counts, a.bin_shift,
                               mode=a.mode, filters=filters)
        else:
            from donkey_spark.plans.facet_counts import facet_counts
            res = facet_counts(idx, a.query, a.facet_counts, mode=a.mode,
                               filters=filters)
    elif a.phrase:
        if a.queries or filters or a.snippets:
            ap.error("--phrase takes a single --query and no "
                     "--filter/--facet-counts/--snippets")
        from donkey_spark.plans.query import _RESULT_SCHEMA
        res = spark.createDataFrame(
            idx.search_phrase(a.query, k=a.k, slop=a.slop), _RESULT_SCHEMA)
    elif a.snippets:
        from donkey_spark.plans.snippets import search_snippets
        corpus = spark.read.parquet(a.snippets)
        res = search_snippets(idx, corpus, batch, window=a.window,
                              mode=a.mode, filters=filters)
    elif a.mode == "pattern":
        from donkey_spark.plans.query import _RESULT_SCHEMA
        res = spark.createDataFrame(
            idx.search_rows_pattern(batch, filters=filters,
                                    max_expansions=a.max_expansions),
            _RESULT_SCHEMA)
    elif a.mode == "bool":
        from donkey_spark.plans.query import _RESULT_SCHEMA
        res = spark.createDataFrame(
            idx.search_rows_bool(batch, filters=filters), _RESULT_SCHEMA)
    elif a.boost:
        from donkey_spark.plans.query import _RESULT_SCHEMA
        res = spark.createDataFrame(
            idx.search_rows_boosted(batch, mode=a.mode, filters=filters),
            _RESULT_SCHEMA)
    else:
        res = idx.search_batch(batch, mode=a.mode, filters=filters,
                               min_match=a.min_match,
                               synonyms=synonyms)
    if a.out:
        res.write.mode("overwrite").parquet(a.out)
    else:
        res.show(100, truncate=False)


if __name__ == "__main__":
    main()
