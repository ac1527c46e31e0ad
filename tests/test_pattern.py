"""Dictionary-expansion queries (§2.14 T23/T26/T43): prefix (`foo*`),
fuzzy (`bar~1`), wildcard (`va*ble`, `te?t`, `*ble`) and regexp
(`/re(turn|ad)/`) patterns must expand exactly (df-ranked, capped,
brute-force-checkable), rewrite to plain OR queries, compose with
filters and upserted chunks, and stay shard-count-invariant under the
federation's GLOBAL expansion."""

import re
from collections import Counter

import pytest

from donkey_spark.functions.patterns import (levenshtein_py,
                                             parse_pattern_text,
                                             prefix_upper_bound,
                                             regexp_literal_head)
from donkey_spark.functions.tokenize import tokenize_py
from fixtures.gen_corpus import gen_corpus


def _vocab_df(pdf) -> Counter:
    """Brute-force term -> document frequency over a corpus frame."""
    c: Counter = Counter()
    for content in pdf["content"]:
        c.update(set(tokenize_py(content)))
    return c


def _brute_expand(vocab: Counter, kind, base, dist, cap):
    if kind == "prefix":
        m = [t for t in vocab if t.startswith(base)]
    elif kind == "wildcard":
        from fnmatch import fnmatchcase   # *, ? — glob semantics, and
        m = [t for t in vocab             # _ is a literal, like LIKE+escape
             if fnmatchcase(t, base)]
    elif kind == "regexp":                # whole-term, Python re as the
        m = [t for t in vocab             # independent 4th evaluator
             if re.fullmatch(base, t)]
    else:
        m = [t for t in vocab if levenshtein_py(base, t, dist) <= dist]
    return sorted(((t, vocab[t]) for t in m),
                  key=lambda kv: (-kv[1], kv[0]))[:cap]


@pytest.fixture(scope="module")
def pat_setup(spark, tmp_path_factory):
    from donkey_spark.plans.build import build_index
    base = tmp_path_factory.mktemp("pattern")
    pdf = gen_corpus(240, seed=47)
    build_index(spark, spark.createDataFrame(pdf), str(base / "idx"),
                range_size=64, facets=("lang",))
    shard_dirs = []
    for i in (0, 1, 2):
        build_index(spark, spark.createDataFrame(pdf[pdf.index % 3 == i]),
                    str(base / f"s{i}"), range_size=64, facets=("lang",))
        shard_dirs.append(str(base / f"s{i}"))
    return str(base / "idx"), shard_dirs, pdf


# -- grammar ---------------------------------------------------------------

def test_parse_pattern_text():
    lit, pats = parse_pattern_text("Foo* bar BAZ~2 plain qux~0")
    assert lit == "bar plain"
    assert pats == [("prefix", "foo", 0), ("fuzzy", "baz", 2),
                    ("fuzzy", "qux", 0)]
    # wildcards: any */? placement EXCEPT a pure trailing-* (that stays
    # the cheaper prefix kind); at least one literal char required
    lit, pats = parse_pattern_text("*Foo te?t fo*o w* ok")
    assert lit == "ok"
    assert pats == [("wildcard", "*foo", 0), ("wildcard", "te?t", 0),
                    ("wildcard", "fo*o", 0), ("prefix", "w", 0)]
    for bad in ("bar~3", "bar~", "~1", "a-b*", "a-b?",
                "*", "?", "*?*", "??"):
        with pytest.raises(ValueError):
            parse_pattern_text(f"ok {bad}")
    # regexp atoms: /body/ under the portable grammar, lowercased
    lit, pats = parse_pattern_text("/Re(turn|ad)/ def /v[0-9]+_map/")
    assert lit == "def"
    assert pats == [("regexp", "re(turn|ad)", 0),
                    ("regexp", "v[0-9]+_map", 0)]
    for bad in ("//", "/ab(/", "/^ab/", "/a^b/", "/a{/", "/a{b}/",
                "/a**/", "/[*]/", "/.*/", "/a\\db/", "/half", "half/",
                "a/b",
                # constructs Python's re accepts but the evaluators
                # diverge on: possessive quantifiers (RE2 errors,
                # java.util.regex accepts), repeats past RE2's 1000
                # cap, and bodies whose parens balance only ACROSS the
                # injected ^(?:...)$ wrapper (every engine would agree
                # on the silently-broken prefix-OR-suffix semantics)
                "/ab*+c/", "/ab++c/", "/ab?+c/", "/a{2}+b/",
                "/a{1001}/", "/a{2,1001}/", "/a)|(b/", "/ab)c(d/"):
        with pytest.raises(ValueError):
            parse_pattern_text(f"ok {bad}")
    # lazy quantifiers agree across RE2 / java.util.regex / Python and
    # stay allowed; bounded repeats at RE2's cap are fine
    for good in ("/ab*?c/", "/ab+?c/", "/a{2,1000}b/", "/a(b)(c)d/"):
        _, pats = parse_pattern_text(good)
        assert pats[0][0] == "regexp"


def test_regexp_literal_head():
    """The head is a MANDATORY match prefix (usable as a dictionary
    range bound) — quantified leading chars and top-level alternation
    must drop it; group-confined alternation after the head keeps it."""
    assert regexp_literal_head("jo(in|urnal)") == "jo"
    assert regexp_literal_head("v100[0-9]_map") == "v100"
    assert regexp_literal_head("ab+c") == "ab"    # + keeps its char
    assert regexp_literal_head("ab*c") == "a"     # * makes it optional
    assert regexp_literal_head("ab?c") == "a"
    assert regexp_literal_head("ab{2}c") == "a"
    assert regexp_literal_head(".*tion") == ""
    assert regexp_literal_head("ab|cd") == ""     # top-level alternation
    assert regexp_literal_head("a(b|c)d") == "a"
    assert regexp_literal_head("[ab]cd") == ""


def test_prefix_upper_bound_brackets_exactly():
    for p in ("s", "sca", "a_", "z9", "zz"):
        hi = prefix_upper_bound(p)
        assert p < p + "a" < hi          # prefixed strings fall inside
        assert not (p[:-1] + chr(ord(p[-1]) + 1) + "a" < hi)


# -- expansion exactness ----------------------------------------------------

CASES = [("prefix", "re", 0), ("prefix", "s", 0), ("prefix", "de", 0),
         ("fuzzy", "return", 1), ("fuzzy", "clasz", 1),
         ("fuzzy", "window", 2), ("fuzzy", "def", 0),
         # wildcard: head-bounded infix, ?, leading-* (full term scan),
         # literal _ (must be LIKE-escaped), and a no-match pattern
         ("wildcard", "re*rn", 0), ("wildcard", "w?ndow", 0),
         ("wildcard", "*turn", 0), ("wildcard", "*_*", 0),
         ("wildcard", "qq*zz", 0),
         # regexp: group alternation behind a literal head, digit
         # classes + bounded repeats over the v\d+_suffix identifiers,
         # a LEADING-metachar pattern with alternation (full term
         # scan, headless), a negated class, and a no-match pattern
         ("regexp", "re(turn|ad)", 0),
         ("regexp", "v100[0-9]_[a-z]+", 0),
         ("regexp", "v[0-9]{1,3}_map", 0),
         ("regexp", ".*_(vec|arr)", 0),
         ("regexp", "s[ceo].*", 0),
         ("regexp", "b[^r]ock", 0),
         ("regexp", "qq[x-z]+zz", 0)]


def test_expansion_matches_bruteforce(spark, pat_setup):
    from donkey_spark.plans.query import Index
    idx_dir, _, pdf = pat_setup
    vocab = _vocab_df(pdf)
    idx = Index(spark, idx_dir)
    dist_idx = Index(spark, idx_dir, local_bytes=0)
    for kind, base, dist in CASES:
        want_all = _brute_expand(vocab, kind, base, dist, cap=10**9)
        assert idx.expand_pattern(kind, base, dist,
                                  max_expansions=10**9) == want_all
        # cap must keep the (df DESC, term ASC) head, on BOTH probe paths
        assert idx.expand_pattern(kind, base, dist,
                                  max_expansions=5) == want_all[:5]
        assert dist_idx.expand_pattern(kind, base, dist,
                                       max_expansions=5) == want_all[:5]
    assert vocab["return"] >= 5          # fixture sanity: real expansions


def test_fuzzy_never_admits_facet_sentinels(spark, pat_setup):
    """The dictionary also stores \\x01-prefixed facet PRESENCE terms
    (operators/facets.py); a fuzzy pattern whose base is within edit
    distance of one (``lang_py~2`` vs ``\\x01lang=py`` = distance 2,
    inside the length band) must still expand over corpus terms only,
    on BOTH probe paths — and agree with the brute force over the raw
    corpus vocabulary, which contains no sentinels by construction."""
    from donkey_spark.operators.facets import FACET_PREFIX
    from donkey_spark.plans.query import Index
    idx_dir, _, pdf = pat_setup
    vocab = _vocab_df(pdf)
    assert levenshtein_py("lang_py", f"{FACET_PREFIX}lang=py", 2) <= 2
    want = _brute_expand(vocab, "fuzzy", "lang_py", 2, cap=10**9)
    for lb in (64 << 20, 0):
        got = Index(spark, idx_dir, local_bytes=lb).expand_pattern(
            "fuzzy", "lang_py", 2, max_expansions=10**9)
        assert not [t for t, _ in got if t.startswith(FACET_PREFIX)]
        assert got == want


def test_wildcard_never_admits_facet_sentinels(spark, pat_setup):
    """A LEADING wildcard (`*py`) LIKE-matches the \\x01lang=py facet
    presence term unless the scan keeps the >= "0" floor — the wildcard
    twin of the fuzzy sentinel rule, on BOTH probe paths."""
    from donkey_spark.operators.facets import FACET_PREFIX
    from donkey_spark.plans.query import Index
    from fnmatch import fnmatchcase
    idx_dir, _, pdf = pat_setup
    assert fnmatchcase(f"{FACET_PREFIX}lang=py", "*py")   # the trap
    vocab = _vocab_df(pdf)
    want = _brute_expand(vocab, "wildcard", "*py", 0, cap=10**9)
    for lb in (64 << 20, 0):
        got = Index(spark, idx_dir, local_bytes=lb).expand_pattern(
            "wildcard", "*py", max_expansions=10**9)
        assert not [t for t, _ in got if t.startswith(FACET_PREFIX)]
        assert got == want


def test_regexp_never_admits_facet_sentinels(spark, pat_setup):
    """A leading-`.*` regexp (`/.*py/`) whole-term-matches the
    \\x01lang=py facet presence term (RE2's `.` matches \\x01 and `=`)
    unless the term-column scan keeps the >= "0" floor — the regexp
    twin of the wildcard sentinel rule, on BOTH probe paths."""
    from donkey_spark.operators.facets import FACET_PREFIX
    from donkey_spark.plans.query import Index
    idx_dir, _, pdf = pat_setup
    assert re.fullmatch(".*py", f"{FACET_PREFIX}lang=py")   # the trap
    vocab = _vocab_df(pdf)
    want = _brute_expand(vocab, "regexp", ".*py", 0, cap=10**9)
    for lb in (64 << 20, 0):
        got = Index(spark, idx_dir, local_bytes=lb).expand_pattern(
            "regexp", ".*py", max_expansions=10**9)
        assert not [t for t, _ in got if t.startswith(FACET_PREFIX)]
        assert got == want


def test_multi_expansion_equals_singles(spark, pat_setup):
    """_expand_candidates_multi (one shared dictionary scan for all of
    a batch's fuzzy patterns — the federation's stats phase) must
    return exactly what per-pattern expansion returns, across mixed
    prefix/fuzzy keys and on both probe paths."""
    from donkey_spark.plans.query import Index
    idx_dir, _, _ = pat_setup
    keys = [(k, b, d) for k, b, d in CASES]
    for lb in (64 << 20, 0):
        ref = {key: Index(spark, idx_dir, local_bytes=lb)
               ._expand_candidates(*key) for key in keys}
        multi = Index(spark, idx_dir,
                      local_bytes=lb)._expand_candidates_multi(keys)
        assert multi == ref


def test_pattern_search_is_the_or_rewrite(spark, pat_setup):
    from donkey_spark.plans.query import Index
    idx_dir, _, _ = pat_setup
    idx = Index(spark, idx_dir)
    qs = [(0, "re* filter", 10), (1, "clasz~1 import", 7)]
    manual = []
    for qid, text, k in qs:
        lit, pats = parse_pattern_text(text)
        terms = set(tokenize_py(lit))
        for kind, base, dist in pats:
            terms.update(t for t, _ in idx.expand_pattern(kind, base, dist))
        manual.append((qid, sorted(terms), k))
    assert idx.search_rows_pattern(qs) == idx.search_rows(manual)
    got = idx.search_rows_pattern(qs)
    assert got and {q for q, *_ in got} == {0, 1}


def test_pattern_filters_compose(spark, pat_setup):
    from donkey_spark.plans.query import Index
    idx_dir, _, _ = pat_setup
    idx = Index(spark, idx_dir)
    qs = [(0, "re* scan", 10)]
    flt = {"lang": ["py", "go"]}
    got = idx.search_rows_pattern(qs, filters=flt)
    assert got                            # fixture sanity
    # filtered results = unfiltered scores restricted to matching docs
    unf = {r[2]: r[3] for r in idx.search_rows_pattern(qs)}
    docs = {r["doc_id"] for r in
            idx._docs.where("lang in ('py','go')").collect()}
    assert all(d in docs for _, _, d, *_ in got)
    for _, _, d, s, *_ in got:
        if d in unf:
            assert s == unf[d]


def test_empty_and_degraded_patterns(spark, pat_setup):
    from donkey_spark.plans.query import Index
    idx_dir, _, _ = pat_setup
    idx = Index(spark, idx_dir)
    assert idx.search_rows_pattern([(0, "zzqx*", 5)]) == []
    # dead pattern + live literal degrades to the literal query
    want = idx.search_rows([(1, "filter", 5)])
    assert idx.search_rows_pattern([(1, "zzqx* filter", 5)]) == want


def test_expansion_guard(spark, pat_setup, monkeypatch):
    from donkey_spark.plans.query import Index
    idx_dir, _, _ = pat_setup
    monkeypatch.setattr("donkey_spark.config.MAX_EXPANSION_CANDIDATES", 3)
    for lb in (64 << 20, 0):              # local + distributed probes
        idx = Index(spark, idx_dir, local_bytes=lb)
        with pytest.raises(ValueError, match="matches more than"):
            idx.expand_pattern("prefix", "s")


def test_upserted_chunk_dfs_sum(spark, pat_setup, tmp_path):
    """Expansion dfs must SUM across dictionary chunks: after an upsert
    rewrites docs (new epoch chunk + tombstones), a fresh reader's
    expansion ranking reflects the union dictionary."""
    import shutil

    from donkey_spark.plans.query import Index
    from donkey_spark.plans.upsert import upsert_docs
    idx_dir, _, pdf = pat_setup
    from donkey_spark.fsutil import local_path
    dst = str(tmp_path / "up")
    shutil.copytree(local_path(idx_dir), dst)
    new = pdf.head(3).copy()
    new["commit"] = "d" * 40              # a new version is a new commit
    new["content"] = "zzpattern_upserted zzpattern_upserted_too def"
    stats = upsert_docs(spark, dst, spark.createDataFrame(new))
    assert stats["n_appended"] == 3
    idx = Index(spark, dst)
    got = idx.expand_pattern("prefix", "zzpattern")
    assert got == [("zzpattern_upserted", 3), ("zzpattern_upserted_too", 3)]
    # live docs only: the pre-upsert df of `def` is frozen (tombstone
    # contract) but the expansion's SUM must count the epoch's chunk too
    vocab = _vocab_df(pdf)
    assert dict(idx.expand_pattern("fuzzy", "def", 0)) == {
        "def": vocab["def"] + 3}


# -- federation --------------------------------------------------------------

def test_sharded_pattern_matches_unified(spark, pat_setup):
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.sharded import search_pattern_sharded
    idx_dir, shard_dirs, _ = pat_setup
    uni = Index(spark, idx_dir)
    shards = [Index(spark, d) for d in shard_dirs]
    qs = [(0, "re* filter", 10), (1, "clasz~1 import", 7),
          (2, "de*", 12), (3, "*turn w?ndow", 9),
          (4, "/re(turn|ad)/ filter", 8), (5, "/.*_(vec|arr)/ scan", 6)]
    for cap in (3, 64):
        want = [(q, rk, repo, path, round(s, 9)) for q, rk, d, s, repo, path
                in uni.search_rows_pattern(qs, max_expansions=cap)]
        assert want
        got = search_pattern_sharded(shards, qs, max_expansions=cap)
        assert [(q, rk, repo, path, round(s, 9))
                for q, rk, sh, d, s, repo, path in got] == want
        rot = [shards[2], shards[0], shards[1]]
        got2 = search_pattern_sharded(rot, qs, max_expansions=cap)
        assert [(q, rk, repo, path, round(s, 9))
                for q, rk, sh, d, s, repo, path in got2] == want


def test_sharded_expansion_cap_is_global(spark, tmp_path):
    """The case a per-shard capped expansion gets WRONG: the globally
    2nd-ranked term is below the cap inside every shard. Shard A dfs:
    aaq_one 5, aaq_two 3; shard B: aaq_three 4, aaq_two 3. Global:
    one 5, two 6 → cap-2 expansion = {two, one}; per-shard top-2
    unions would admit aaq_three and (worse) rank `one` over `two`."""
    import pandas as pd

    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.sharded import search_pattern_sharded

    def corpus(rows, repo):
        return pd.DataFrame([{
            "repo": repo, "path": f"f/{i}", "commit": "c" * 40,
            "lang": "py", "content": txt} for i, txt in enumerate(rows)])

    a = corpus(["aaq_one"] * 5 + ["aaq_two"] * 3 + ["pad token"], "r_a")
    b = corpus(["aaq_three"] * 4 + ["aaq_two"] * 3 + ["pad token"], "r_b")
    uni = pd.concat([a, b], ignore_index=True)
    for name, frame in (("sa", a), ("sb", b), ("uni", uni)):
        build_index(spark, spark.createDataFrame(frame),
                    str(tmp_path / name), range_size=64)
    uidx = Index(spark, str(tmp_path / "uni"))
    exp = uidx.expand_pattern("prefix", "aaq", max_expansions=2)
    assert [t for t, _ in exp] == ["aaq_two", "aaq_one"]   # the trap
    qs = [(0, "aaq*", 20)]
    want = [(q, rk, repo, path, round(s, 9)) for q, rk, d, s, repo, path
            in uidx.search_rows_pattern(qs, max_expansions=2)]
    shards = [Index(spark, str(tmp_path / "sa")),
              Index(spark, str(tmp_path / "sb"))]
    got = search_pattern_sharded(shards, qs, max_expansions=2)
    assert [(q, rk, repo, path, round(s, 9))
            for q, rk, sh, d, s, repo, path in got] == want
    # aaq_three docs must NOT appear (their only term fell past the cap)
    assert len(got) == 5 + 3 + 3          # one+two docs, never three


def test_mixed_batch_routes_pattern_mode(spark, pat_setup):
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.sharded import (open_shards,
                                            search_pattern_sharded,
                                            search_rows_mixed_sharded,
                                            search_rows_sharded)
    idx_dir, shard_dirs, _ = pat_setup
    idx = Index(spark, idx_dir)
    specs = [(0, "re* filter", 5, "pattern", None),
             (1, "def return", 5, None, None),
             (2, "window~2", 5, "pattern", {"lang": ["py"]})]
    got = idx.search_rows_mixed(specs)
    want = sorted(
        idx.search_rows_pattern([(0, "re* filter", 5)])
        + idx.search_rows([(1, "def return", 5)])
        + idx.search_rows_pattern([(2, "window~2", 5)],
                                  filters={"lang": ["py"]}))
    assert got == want and got
    shards = open_shards(spark, shard_dirs)
    gots = search_rows_mixed_sharded(shards, specs)
    wants = sorted(
        search_pattern_sharded(shards, [(0, "re* filter", 5)])
        + search_rows_sharded(shards, [(1, "def return", 5)])
        + search_pattern_sharded(shards, [(2, "window~2", 5)],
                                 filters={"lang": ["py"]}))
    assert gots == wants and gots


def test_match_surfaces_pattern_mode(spark, pat_setup):
    """Every match-set surface accepts mode="pattern" — the
    grep-then-act shape: expansion identical to search's, then the
    plain OR kernel. Equivalence oracle: manually resolve the pattern
    text and run the same surface with mode="or"."""
    from donkey_spark.plans.facet_counts import (facet_counts,
                                                 match_count,
                                                 match_ids_local,
                                                 match_stats)
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.sortby import sorted_topk
    idx_dir, _, _ = pat_setup
    idx = Index(spark, idx_dir)
    text = "/re(turn|ad)/ filter"
    (_, terms, _), = idx.resolve_pattern_terms([(0, text, 1)])
    or_text = " ".join(terms)
    assert len(terms) > 2                 # fixture sanity: real expansion
    n = match_count(idx, text, mode="pattern")
    assert n == match_count(idx, or_text, mode="or") > 0
    import numpy as np
    got = match_ids_local(idx, text, mode="pattern")
    want = match_ids_local(idx, or_text, mode="or")
    assert got is not None and np.array_equal(got, want)
    assert (match_stats(idx, text, by="dl", mode="pattern")
            == match_stats(idx, or_text, by="dl", mode="or"))
    assert (sorted_topk(idx, text, by="dl", k=7, mode="pattern")
            == sorted_topk(idx, or_text, by="dl", k=7, mode="or"))
    fc = {(r["value"], r["n_docs"])
          for r in facet_counts(idx, text, "lang",
                                mode="pattern").collect()}
    fw = {(r["value"], r["n_docs"])
          for r in facet_counts(idx, or_text, "lang",
                                mode="or").collect()}
    assert fc == fw and fc
    # dead pattern + OOV literal: a provably-empty match set, not an error
    assert match_count(idx, "zzqx* zz_oov", mode="pattern") == 0


def test_match_surfaces_pattern_sharded_global_cap(spark, tmp_path,
                                                   monkeypatch):
    """Federated pattern-mode match surfaces must expand GLOBALLY (the
    T23 rule): under a cap of 2, per-shard expansion would admit
    shard B's aaq_three (locally top-2, globally below the cap) and
    overcount. The federated count must equal the unified count."""
    import pandas as pd

    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.facet_counts import match_count
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.sharded import (match_count_sharded,
                                            match_stats_sharded)

    def corpus(rows, repo):
        return pd.DataFrame([{
            "repo": repo, "path": f"f/{i}", "commit": "c" * 40,
            "lang": "py", "content": txt} for i, txt in enumerate(rows)])

    a = corpus(["aaq_one"] * 5 + ["aaq_two"] * 3 + ["pad token"], "r_a")
    b = corpus(["aaq_three"] * 4 + ["aaq_two"] * 3 + ["pad token"], "r_b")
    uni = pd.concat([a, b], ignore_index=True)
    for name, frame in (("sa", a), ("sb", b), ("uni", uni)):
        build_index(spark, spark.createDataFrame(frame),
                    str(tmp_path / name), range_size=64)
    monkeypatch.setattr("donkey_spark.config.MAX_TERM_EXPANSIONS", 2)
    uidx = Index(spark, str(tmp_path / "uni"))
    shards = [Index(spark, str(tmp_path / "sa")),
              Index(spark, str(tmp_path / "sb"))]
    want = match_count(uidx, "aaq*", mode="pattern")
    assert want == 5 + 3 + 3              # one+two docs, never three
    assert match_count_sharded(shards, "aaq*", mode="pattern") == want
    s = match_stats_sharded(shards, "aaq*", by="dl", mode="pattern")
    assert s["n_docs"] == want


def test_delete_by_query_pattern(spark, pat_setup, tmp_path):
    """delete_by_query(mode="pattern") — "tombstone everything
    matching /re(turn|ad)/" — must tombstone exactly the pattern's
    match set."""
    import shutil

    from donkey_spark.fsutil import local_path
    from donkey_spark.plans.delete import delete_by_query
    from donkey_spark.plans.facet_counts import match_count
    from donkey_spark.plans.query import Index
    idx_dir, _, _ = pat_setup
    dst = str(tmp_path / "del")
    shutil.copytree(local_path(idx_dir), dst)
    before = match_count(Index(spark, dst), "/re(turn|ad)/",
                         mode="pattern")
    assert before > 0
    n = delete_by_query(spark, dst, "/re(turn|ad)/", mode="pattern")
    assert n == before
    after = Index(spark, dst)
    assert match_count(after, "/re(turn|ad)/", mode="pattern") == 0
    assert after.search_rows_pattern([(0, "/re(turn|ad)/", 5)]) == []


def test_explain_search_pattern(spark, pat_setup):
    """mode="pattern" explains the OR rewrite search_rows_pattern would
    run — expansions reported per atom, terms = literal + expanded."""
    from donkey_spark.plans.query import Index
    idx_dir, _, pdf = pat_setup
    idx = Index(spark, idx_dir)
    vocab = _vocab_df(pdf)
    exp = idx.explain_search([(0, "re*rn filter", 10)], mode="pattern")
    q = exp["queries"][0]
    want = [t for t, _ in _brute_expand(vocab, "wildcard", "re*rn", 0, 64)]
    assert want and q["expansions"]["re*rn"] == want
    assert {t["term"] for t in q["terms"]} == set(want) | {"filter"}
    assert exp["mode"] == "pattern"
    assert exp["path"] in ("local", "distributed")


def test_suggest_matches_bruteforce_ranking(spark, pat_setup):
    """suggest() = the (distance ASC, df DESC, term ASC) head of the
    brute-force candidate set; the probe never suggests itself; no
    candidates -> []; multi-token input refused."""
    from donkey_spark.plans.query import Index
    idx_dir, _, pdf = pat_setup
    idx = Index(spark, idx_dir)
    vocab = _vocab_df(pdf)
    some = sorted(vocab)[7]
    for probe in (some[:-1] + "q", some, "return", "clas"):
        got = idx.suggest(probe, k=5)
        want = sorted(
            (levenshtein_py(t, probe, 2), -df, t)
            for t, df in vocab.items()
            if t != probe and levenshtein_py(t, probe, 2) <= 2)
        want = [(t, d, df) for d, ndf, t in want[:5] for df in (-ndf,)]
        assert got == want, probe
        assert all(t != probe for t, _d, _df in got)
    assert idx.suggest("zzqxv") == []
    with pytest.raises(ValueError, match="one term"):
        idx.suggest("two words")


def test_parse_filter_specs_grammar():
    """The ONE CLI --filter parser (functions/filters.py) shared by
    scripts/query.py and scripts/delete_docs.py — a takedown must parse
    the same string to the same dict the operator previewed with."""
    from donkey_spark.functions.filters import parse_filter_specs
    assert parse_filter_specs([]) is None
    assert parse_filter_specs(None) is None
    assert parse_filter_specs(["lang=en"]) == {"lang": "en"}
    assert parse_filter_specs(["lang=en,de"]) == {"lang": ["en", "de"]}
    assert parse_filter_specs(["lang!=en"]) == {"lang": {"not": ["en"]}}
    assert parse_filter_specs(["lang!=en,de"]) == {
        "lang": {"not": ["en", "de"]}}
    assert parse_filter_specs(["n=100..200"]) == {
        "n": {"range": [100, 200]}}
    assert parse_filter_specs(["n=..200"]) == {"n": {"range": [None, 200]}}
    assert parse_filter_specs(["n=-5.."]) == {"n": {"range": [-5, None]}}
    assert parse_filter_specs(["n!=100..200"]) == {
        "n": {"not": {"range": [100, 200]}}}
    # multiple flags AND together; later flag on the same column wins
    assert parse_filter_specs(["lang=en", "n=1..2"]) == {
        "lang": "en", "n": {"range": [1, 2]}}
    # '..' with neither bound is NOT a range — falls through to equality
    assert parse_filter_specs(["tag=.."]) == {"tag": ".."}
    # FIRST separator wins: '=' before '!=' is an equality whose value
    # happens to contain '!=' — the column name never swallows a '='
    assert parse_filter_specs(["msg=a!=b"]) == {"msg": "a!=b"}
    # malformed specs fail loudly with the spec named, not a bare
    # tuple-unpack traceback
    for bad in ("lang", "", "=en", "!=en"):
        with pytest.raises(ValueError, match="filter spec"):
            parse_filter_specs([bad])


def test_rank_suggestions_ordering():
    """(distance ASC, df DESC, term ASC), base excluded, cap applied —
    the shared helper both Index.suggest and suggest_sharded rank with."""
    from donkey_spark.functions.patterns import (rank_suggestions,
                                                 suggest_base)
    cand = {"spark": 50, "sparks": 9, "spare": 9, "shark": 3, "stark": 9}
    out = rank_suggestions(cand, "spark", k=3, max_dist=1)
    # distance 1 everywhere except the excluded base; the df-9
    # three-way tie breaks on term ASC; k=3 cuts the df-3 'shark'
    assert out == [("spare", 1, 9), ("sparks", 1, 9), ("stark", 1, 9)]
    assert rank_suggestions({}, "spark", 5, 2) == []
    with pytest.raises(ValueError):
        suggest_base("two words")
    assert suggest_base("Spark") == "spark"
