"""Boolean query expressions (§2.14 T24): nested AND/OR/NOT must parse
with Lucene precedence, refuse purely-negative match sets, evaluate
exactly against the transparent python oracle on both probe paths,
compose with facet filters and tombstones, route through the mixed
serving batch, and stay shard-count-invariant under the federation's
global stats."""

import numpy as np
import pytest

from donkey_spark.functions.boolquery import (bool_terms, guarded,
                                              matches_tokens,
                                              parse_bool_text,
                                              positive_terms, tree_to_sql)
from fixtures.gen_corpus import gen_corpus
from tests.oracle_bm25 import OracleIndex


# -- grammar ---------------------------------------------------------------

def test_parse_precedence_and_nesting():
    # NOT > AND > OR, left-assoc chains flattened into n-ary nodes
    assert parse_bool_text("aa OR bb AND cc") == (
        "or", (("term", "aa"), ("and", (("term", "bb"), ("term", "cc")))))
    assert parse_bool_text("aa AND bb AND cc") == (
        "and", (("term", "aa"), ("term", "bb"), ("term", "cc")))
    assert parse_bool_text("(aa OR bb) AND cc") == (
        "and", (("or", (("term", "aa"), ("term", "bb"))), ("term", "cc")))
    assert parse_bool_text("aa AND NOT bb") == (
        "and", (("term", "aa"), ("not", ("term", "bb"))))
    # NOT binds tighter than AND: NOT applies to the atom only
    assert parse_bool_text("NOT aa AND bb") == (
        "and", (("not", ("term", "aa")), ("term", "bb")))
    # atoms normalize through the §T tokenizer (lowercase)
    assert parse_bool_text("Spark AND JOIN_key") == (
        "and", (("term", "spark"), ("term", "join_key")))
    # lowercase and/or/not are TERMS, not operators
    assert parse_bool_text("aa AND not") == (
        "and", (("term", "aa"), ("term", "not")))
    assert parse_bool_text("or AND aa")[1][0] == ("term", "or")


def test_parse_errors():
    for bad in ("", "   ", "aa bb",            # bare juxtaposition
                "aa AND", "OR aa", "AND",      # dangling operators
                "(aa OR bb", "aa)", "()",      # parens
                "aa AND ()",
                "a-b AND cc",                  # atom → two tokens
                "x AND cc",                    # len-1 atom → zero tokens
                "aa OR (bb AND)",):
        with pytest.raises(ValueError):
            parse_bool_text(bad)


def test_guardedness():
    for ok in ("aa", "aa AND NOT bb", "aa OR (bb AND NOT cc)",
               "(aa OR bb) AND NOT cc", "aa AND NOT NOT bb",
               "NOT bb AND aa"):
        assert guarded(parse_bool_text(ok))
    for bad in ("NOT aa", "aa OR NOT bb", "NOT (aa AND bb)",
                "NOT aa AND NOT bb", "NOT NOT aa"):
        with pytest.raises(ValueError, match="purely negative"):
            parse_bool_text(bad)


def test_term_helpers():
    t = parse_bool_text("aa AND (bb OR NOT cc) AND NOT NOT dd")
    assert bool_terms(t) == {"aa", "bb", "cc", "dd"}
    # positive = even NOT depth: cc is negated once, dd twice
    assert positive_terms(t) == {"aa", "bb", "dd"}
    toks = {"aa", "dd"}
    assert matches_tokens(t, toks)           # bb OR NOT cc: cc absent
    assert not matches_tokens(t, {"aa", "cc"})
    sql = tree_to_sql(t, lambda term: f"has({term})")
    assert sql == ("(has(aa) AND (has(bb) OR (NOT has(cc))) "
                   "AND (NOT (NOT has(dd))))")


# -- engine vs oracle --------------------------------------------------------

BOOL_QUERIES = [
    (0, "spark AND (shuffle OR join)", 10),
    (1, "filter AND NOT join", 10),
    (2, "(group OR agg) AND NOT (sort OR merge)", 10),
    (3, "spark AND NOT zz_totally_oov", 10),     # NOT-OOV matches all
    (4, "zz_totally_oov OR window", 10),         # OOV positive drops out
    (5, "spark AND zz_totally_oov", 5),          # provably empty
    (6, "select AND not", 10),                   # lowercase 'not' = term
    (7, "decode AND NOT NOT encode", 10),        # double negation
]


@pytest.fixture(scope="module")
def bool_setup(spark, tmp_path_factory):
    from donkey_spark.plans.build import build_index
    base = tmp_path_factory.mktemp("boolq")
    pdf = gen_corpus(240, seed=53)
    build_index(spark, spark.createDataFrame(pdf), str(base / "idx"),
                range_size=64, facets=("lang",))
    shard_dirs = []
    for i in (0, 1, 2):
        build_index(spark, spark.createDataFrame(pdf[pdf.index % 3 == i]),
                    str(base / f"s{i}"), range_size=64, facets=("lang",))
        shard_dirs.append(str(base / f"s{i}"))
    ordered = pdf.sort_values(["repo", "path", "commit"]).reset_index()
    return str(base / "idx"), shard_dirs, ordered


def _expect(ordered, text, k, keep=None):
    """Python-oracle rows for one bool query, optionally restricted to
    docs where keep(ordered_row) is true (facet/tombstone twins).
    Restriction happens at RANKING time — stats stay full-corpus."""
    oracle = OracleIndex(list(enumerate(ordered["content"])))
    rows = oracle.search_bool(text, k=len(ordered))
    if keep is not None:
        rows = [(0, d, s) for _, d, s in rows if keep(d)]
    return [(r + 1, d, s) for r, (_, d, s) in enumerate(rows[:k])]


def _check(rows, ordered, queries, keep=None):
    by_q: dict[int, list] = {}
    for qid, rank, doc_id, score, _, _ in rows:
        by_q.setdefault(qid, []).append((rank, doc_id, score))
    for qid, text, k in queries:
        expect = _expect(ordered, text, k, keep)
        got = sorted(by_q.get(qid, []))
        assert [d for _, d, _ in got] == [d for _, d, _ in expect], \
            f"doc ids differ on query {qid}: {text!r}"
        np.testing.assert_allclose([s for _, _, s in got],
                                   [s for _, _, s in expect], atol=1e-9)
        assert [r for r, _, _ in got] == [r for r, _, _ in expect]


def test_bool_matches_oracle_both_paths(spark, bool_setup):
    from donkey_spark.plans.query import Index
    idx_dir, _, ordered = bool_setup
    for lb in (64 << 20, 0):             # driver-local and distributed
        rows = Index(spark, idx_dir,
                     local_bytes=lb).search_rows_bool(BOOL_QUERIES)
        _check(rows, ordered, BOOL_QUERIES)
    # the provably-empty query really is empty, the NOT-OOV one is not
    qids = {r[0] for r in rows}
    assert 5 not in qids and 3 in qids


def test_not_oov_equals_plain_query(spark, bool_setup):
    from donkey_spark.plans.query import Index
    idx = Index(spark, bool_setup[0])
    got = idx.search_rows_bool([(0, "spark AND NOT zz_totally_oov", 10)])
    plain = idx.search_rows([(0, "spark", 10)])
    assert got == plain


def test_purely_negative_refused_at_surface(spark, bool_setup):
    from donkey_spark.plans.query import Index
    idx = Index(spark, bool_setup[0])
    with pytest.raises(ValueError, match="purely negative"):
        idx.search_rows_bool([(0, "NOT spark", 10)])
    with pytest.raises(ValueError, match="needs a parsed tree"):
        idx.search_rows([(0, "spark", 10)], mode="bool")


def test_bool_composes_with_filters(spark, bool_setup):
    from donkey_spark.plans.query import Index
    idx_dir, _, ordered = bool_setup
    langs = list(ordered["lang"])
    rows = Index(spark, idx_dir).search_rows_bool(
        BOOL_QUERIES, filters={"lang": ["py", "go"]})
    _check(rows, ordered, BOOL_QUERIES,
           keep=lambda d: langs[d] in ("py", "go"))


def test_bool_composes_with_tombstones(spark, bool_setup, tmp_path):
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.delete import delete_docs
    from donkey_spark.plans.query import Index
    _, _, ordered = bool_setup
    out = str(tmp_path / "idx_del")
    build_index(spark, spark.createDataFrame(
        ordered.drop(columns=["index"])), out, range_size=64)
    delete_docs(spark, out, [d for d in range(len(ordered)) if d % 5 == 0])
    rows = Index(spark, out).search_rows_bool(BOOL_QUERIES)
    _check(rows, ordered, BOOL_QUERIES, keep=lambda d: d % 5 != 0)


def test_mixed_batch_routes_bool(spark, bool_setup):
    from donkey_spark.plans.query import Index
    idx = Index(spark, bool_setup[0])
    specs = [(0, "spark AND (shuffle OR join)", 10, "bool", None),
             (1, "filter AND NOT join", 10, "bool",
              {"lang": ["py", "go"]}),
             (2, "spark join", 10, None, None)]
    got = idx.search_rows_mixed(specs)
    want = sorted(
        idx.search_rows_bool([(0, specs[0][1], 10)])
        + idx.search_rows_bool([(1, specs[1][1], 10)],
                               filters=specs[1][4])
        + idx.search_rows([(2, "spark join", 10)]))
    assert sorted(got) == want


def test_explain_search_bool(spark, bool_setup):
    from donkey_spark.plans.query import Index
    idx = Index(spark, bool_setup[0])
    exp = idx.explain_search([(1, "filter AND NOT join", 10)],
                             mode="bool")
    q = exp["queries"][1]
    assert [t["term"] for t in q["terms"]] == ["filter"]   # scored
    assert q["mask_terms"] == ["join"]                     # NOT branch
    assert q["dropped_oov"] == []
    assert exp["path"] in ("local", "distributed")


# -- federation ---------------------------------------------------------------

def test_sharded_bool_equals_unified(spark, bool_setup):
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.sharded import (search_bool_sharded,
                                            search_rows_mixed_sharded)
    idx_dir, shard_dirs, _ = bool_setup
    want = Index(spark, idx_dir).search_rows_bool(BOOL_QUERIES)
    # shard ORDER must not matter either (merge keys on score/repo/path)
    for dirs in (shard_dirs, shard_dirs[::-1]):
        shards = [Index(spark, d) for d in dirs]
        rows = search_bool_sharded(shards, BOOL_QUERIES)
        # federated rows carry (shard, local doc_id); compare on the
        # (qid, rank, score, repo, path) identity
        got = [(q, rk, round(s, 9), repo, path)
               for q, rk, _, _, s, repo, path in rows]
        exp = [(q, rk, round(s, 9), repo, path)
               for q, rk, _, s, repo, path in want]
        assert got == exp
    # mixed federated batch routes bool specs through the same path
    specs = [(0, "spark AND (shuffle OR join)", 10, "bool", None)]
    assert (search_rows_mixed_sharded(shards, specs)
            == search_bool_sharded(shards, [(0, specs[0][1], 10)]))


def test_bool_single_query_decodes_each_block_once(spark, bool_setup,
                                                   monkeypatch):
    """r5 review: the mask eval and the scorer share one per-salt decode
    cache — a single interactive bool query (below the prefill
    threshold, so no batch cache exists) must varint-decode each term's
    blocks exactly once, not once for the mask and again for scoring."""
    from donkey_spark.kernels import wand
    from donkey_spark.plans.query import Index
    idx_dir, _, ordered = bool_setup
    idx = Index(spark, idx_dir, local_bytes=64 << 20)   # driver-local
    seen: list[int] = []
    real = wand.decode_term_blocks

    def spy(blocks, codec):
        seen.extend(id(b) for b in blocks)
        return real(blocks, codec)

    monkeypatch.setattr(wand, "decode_term_blocks", spy)
    rows = idx.search_rows_bool([(0, "spark AND (shuffle OR join)", 10)])
    _check(rows, ordered, [(0, "spark AND (shuffle OR join)", 10)])
    assert seen and len(seen) == len(set(seen)), \
        f"{len(seen) - len(set(seen))} blocks decoded more than once"
