"""Per-term query boosting (functions/boosts.py +
Index.search_rows_boosted + plans/sharded.search_boosted_sharded).

Contract: ``term^W`` multiplies that term's BM25 contribution by W —
verified rank-and-score against the pure-Python reference engine
(oracle_bm25 with the same weights) on BOTH execution paths, with the
kernel's block-max pruning active (small k, skewed weights are exactly
the case where an unsafe skip would mis-rank). Boost 1.0 must be
bit-identical to the unboosted query, and the federation must equal
the unified index exactly.
"""

import pytest

from fixtures.gen_corpus import gen_corpus
from tests.oracle_bm25 import OracleIndex


@pytest.fixture(scope="module")
def boost_setup(spark, tmp_path_factory):
    from donkey_spark.plans.build import build_index
    pdf = gen_corpus(300, seed=23)
    corpus = spark.createDataFrame(pdf)
    out = str(tmp_path_factory.mktemp("boostidx"))
    build_index(spark, corpus, out, range_size=64, facets=("lang",))
    ordered = pdf.sort_values(["repo", "path", "commit"]).reset_index()
    oracle = OracleIndex(list(enumerate(ordered["content"])))
    return pdf, ordered, out, oracle


def test_parse_boost_text():
    from donkey_spark.functions.boosts import parse_boost_text
    terms, bw = parse_boost_text("wand^2 block max^0.5")
    assert terms == ["block", "max", "wand"]
    assert bw == {"wand": 2.0, "max": 0.5}
    # largest wins across duplicates, implicit 1.0 included
    assert parse_boost_text("foo^2 foo")[1] == {"foo": 2.0}
    assert parse_boost_text("foo^0.5 foo")[1] == {}
    assert parse_boost_text("foo^0.5 foo^0.25")[1] == {"foo": 0.5}
    # an atom tokenizing into several terms boosts them all
    terms, bw = parse_boost_text("block-max^3")
    assert terms == ["block", "max"] and bw == {"block": 3.0, "max": 3.0}
    # any OTHER ^ shape is refused loudly — a malformed weight running
    # unboosted (or keeping only its last weight) would mis-rank with
    # no error
    for bad in ("a^b cd", "rust^2^3", "x^1e2", "x^1.", "x^2,5", "^2"):
        with pytest.raises(ValueError, match="malformed boost atom"):
            parse_boost_text(bad)
    with pytest.raises(ValueError, match="positive finite"):
        parse_boost_text("foo^0")
    with pytest.raises(ValueError, match="positive finite"):
        parse_boost_text("foo^1" + "0" * 400)   # float overflow → inf


def test_validate_boosts():
    from donkey_spark.functions.boosts import validate_boosts
    validate_boosts(None, "t")
    validate_boosts({0: {"a": 2.0}}, "t")
    for bad in (-1.0, 0, "2", None, True, float("inf"), float("nan")):
        with pytest.raises(ValueError):
            validate_boosts({0: {"a": bad}}, "t")


def test_boost_one_is_identity(spark, boost_setup):
    """All-unweighted text and explicit ^1 weights are bit-identical to
    the plain query, on the local and distributed paths."""
    from donkey_spark.plans.query import Index
    _, _, out, _ = boost_setup
    text = "def return class"
    for local_bytes in (64 << 20, 0):
        idx = Index(spark, out, local_bytes=local_bytes)
        plain = idx.search_rows([(0, text, 10)])
        assert idx.search_rows_boosted([(0, text, 10)]) == plain
        assert idx.search_rows_boosted(
            [(0, "def^1 return^1.0 class", 10)]) == plain


CASES = [
    ("def^2 return class^0.25", "or"),
    ("def return^4", "or"),
    ("import^0.1 filter^10", "or"),
    ("def^2 return", "and"),
    ("def^0.5 zz_oov^3", "or"),        # boost on an OOV term: no-op
]


def test_boost_matches_reference_engine(spark, boost_setup):
    """Boosted rankings equal the pure-Python reference with the same
    weights — ranks exact, scores to 9 dp — under pruning (k=5) and
    deep (k=50), or/and, both execution paths; and both paths agree
    bit-exactly with each other."""
    from donkey_spark.functions.boosts import parse_boost_text
    from donkey_spark.plans.query import Index
    _, _, out, oracle = boost_setup
    for text, mode in CASES:
        terms, bw = parse_boost_text(text)
        for k in (5, 50):
            want = (oracle.search_and(" ".join(terms), k, boosts=bw)
                    if mode == "and"
                    else oracle.search(" ".join(terms), k, boosts=bw))
            got_paths = []
            for local_bytes in (64 << 20, 0):
                idx = Index(spark, out, local_bytes=local_bytes)
                rows = idx.search_rows_boosted([(0, text, k)], mode=mode)
                got_paths.append(rows)
                assert ([(rk, d, round(s, 9)) for _, rk, d, s, _, _ in rows]
                        == [(rk, d, round(s, 9)) for rk, d, s in want]), \
                    (text, mode, k, local_bytes)
            assert got_paths[0] == got_paths[1], (text, mode, k)


def test_boost_composes_with_filters(spark, boost_setup):
    """Facet filters restrict the match set; surviving docs keep their
    boosted scores — the reference ranking filtered to the facet's
    docs."""
    from donkey_spark.functions.boosts import parse_boost_text
    from donkey_spark.plans.query import Index
    _, ordered, out, oracle = boost_setup
    lang_of = ordered["lang"].tolist()
    text = "def^3 return class^0.5"
    terms, bw = parse_boost_text(text)
    full = oracle.search(" ".join(terms), oracle.n_docs, boosts=bw)
    want = [(d, round(s, 9)) for _, d, s in full
            if lang_of[d] == "py"][:10]
    idx = Index(spark, out)
    rows = idx.search_rows_boosted([(0, text, 10)],
                                   filters={"lang": "py"})
    assert [(d, round(s, 9)) for _, _, d, s, _, _ in rows] == want
    assert [r[1] for r in rows] == list(range(1, len(rows) + 1))


def test_sharded_boosted_equals_unified(spark, boost_setup, tmp_path):
    """Federated boosted search must be invisible: same ranking, same
    scores (to 9 dp) as the unified boosted index, identity by
    (repo, path)."""
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.sharded import search_boosted_sharded
    pdf, _, out, _ = boost_setup
    sdirs = []
    for i, part in enumerate((pdf[pdf.index % 2 == 0],
                              pdf[pdf.index % 2 == 1])):
        d = str(tmp_path / f"shard{i}")
        build_index(spark, spark.createDataFrame(part), d, range_size=64,
                    facets=("lang",))
        sdirs.append(d)
    queries = [(0, "def^2 return class^0.25", 10),
               (1, "import^0.1 filter^10", 10)]
    uni = Index(spark, out)
    want = {}
    for qid, text, k in queries:
        for q, rk, d, s, repo, path in uni.search_rows_boosted(
                [(qid, text, k)]):
            want.setdefault(q, []).append((rk, repo, path, round(s, 9)))
    shards = [Index(spark, d) for d in sdirs]
    got = {}
    for q, rk, _si, _d, s, repo, path in search_boosted_sharded(
            shards, queries):
        got.setdefault(q, []).append((rk, repo, path, round(s, 9)))
    assert got == want


def test_boost_rejects_bad_modes_and_weights(spark, boost_setup):
    from donkey_spark.plans.query import Index
    _, _, out, _ = boost_setup
    idx = Index(spark, out)
    with pytest.raises(ValueError, match="or/and"):
        idx.search_rows_boosted([(0, "def^2", 10)], mode="bool")
    with pytest.raises(ValueError, match="positive"):
        idx.search_rows([(0, ["def"], 10)], boosts={0: {"def": -2.0}})


def test_mixed_batch_routes_boosted(spark, boost_setup, tmp_path):
    """search_rows_mixed accepts mode='boosted'/'boosted-and' specs
    alongside plain ones, and the federated mixed batch routes them
    through search_boosted_sharded."""
    from donkey_spark.plans.build import build_index
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.sharded import (search_boosted_sharded,
                                            search_rows_mixed_sharded)
    pdf, _, out, _ = boost_setup
    idx = Index(spark, out)
    specs = [(0, "def^2 return", 10, "boosted", None),
             (1, "def^2 return", 10, "boosted-and", None),
             (2, "def^3 class", 10, "boosted", {"lang": ["py"]}),
             (3, "def return", 10, None, None)]
    got = idx.search_rows_mixed(specs)
    want = sorted(
        idx.search_rows_boosted([(0, specs[0][1], 10)])
        + idx.search_rows_boosted([(1, specs[1][1], 10)], mode="and")
        + idx.search_rows_boosted([(2, specs[2][1], 10)],
                                  filters=specs[2][4])
        + idx.search_rows([(3, "def return", 10)]))
    assert sorted(got) == want
    sdirs = []
    for i, part in enumerate((pdf[pdf.index % 2 == 0],
                              pdf[pdf.index % 2 == 1])):
        d = str(tmp_path / f"mshard{i}")
        build_index(spark, spark.createDataFrame(part), d, range_size=64,
                    facets=("lang",))
        sdirs.append(d)
    shards = [Index(spark, d) for d in sdirs]
    spec = [(0, "def^2 return", 10, "boosted", None)]
    assert (search_rows_mixed_sharded(shards, spec)
            == search_boosted_sharded(shards, [(0, spec[0][1], 10)]))
