"""Rescore window (plans/rescore.py).

Contract: the top-``window`` primary candidates (full search surface:
modes/filters/min_match/tombstones) re-ranked by query_weight·bm25 +
field_weight·column; docs outside the window never rank BY DEFINITION.
"""

import pytest

from fixtures.gen_corpus import gen_corpus
from tests.oracle_bm25 import OracleIndex


@pytest.fixture(scope="module")
def rs_setup(spark, tmp_path_factory):
    from donkey_spark.plans.build import build_index
    pdf = gen_corpus(300, seed=37)
    out = str(tmp_path_factory.mktemp("rsidx"))
    build_index(spark, spark.createDataFrame(pdf), out, range_size=64,
                facets=("lang",))
    ordered = pdf.sort_values(["repo", "path", "commit"]).reset_index()
    oracle = OracleIndex(list(enumerate(ordered["content"])))
    dl = {r["doc_id"]: r["dl"] for r in
          spark.read.parquet(f"{out}/docs").collect()}
    return out, ordered, oracle, dl


def _brute(oracle, dl, text, window, k, qw, fw, keep=None):
    prim = [(d, s) for _, d, s in oracle.search(text, window)
            if keep is None or d in keep][:window]
    # NOTE: when keep is set the caller must pass the post-filter
    # primary ranking; here keep=None in all window-exact uses
    resc = sorted(((qw * s + fw * dl[d], s, d) for d, s in prim),
                  key=lambda r: (-r[0], r[2]))[:k]
    return [(rk, d, round(f, 9)) for rk, (f, _s, d)
            in enumerate(resc, start=1)]


def test_rescore_matches_brute_force_both_paths(spark, rs_setup):
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.rescore import rescore_rows
    out, _, oracle, dl = rs_setup
    qw, fw = 1.0, 0.01
    for local_bytes in (64 << 20, 0):
        idx = Index(spark, out, local_bytes=local_bytes)
        for text, window, k in (("def return class", 40, 10),
                                ("while yield", 25, 25),
                                ("v62_tmp", 10, 5)):
            want = _brute(oracle, dl, text, window, k, qw, fw)
            got = [(rk, d, round(f, 9)) for _, rk, d, f, _b, _r, _p in
                   rescore_rows(idx, [(0, text, k)], window=window,
                                by="dl", query_weight=qw,
                                field_weight=fw)]
            assert got == want and got, (text, local_bytes)
        # base_score column carries the primary bm25
        rows = rescore_rows(idx, [(0, "def return", 5)], window=20)
        prim = {d: s for _, d, s in oracle.search("def return", 20)}
        assert all(round(b, 9) == round(prim[d], 9)
                   for _, _, d, _f, b, _r, _p in rows)


def test_rescore_window_cuts_before_rescoring(spark, rs_setup):
    """A doc with a huge field value but primary rank > window must
    NOT appear — the window is the contract."""
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.rescore import rescore_rows
    out, _, oracle, dl = rs_setup
    idx = Index(spark, out)
    text = "def return class"
    full = oracle.search(text, 10_000)
    window = 15
    inside = {d for _, d, _ in full[:window]}
    rows = rescore_rows(idx, [(0, text, window)], window=window,
                        by="dl", field_weight=100.0)
    assert {d for _, _, d, _f, _b, _r, _p in rows} == inside
    # with a dominant field weight the order inside the window is
    # (almost) the field order — assert the top row maximizes dl
    top = rows[0][2]
    assert dl[top] == max(dl[d] for d in inside)


def test_rescore_composes_and_validates(spark, rs_setup):
    from donkey_spark.plans.query import Index
    from donkey_spark.plans.rescore import rescore_rows
    out, ordered, oracle, dl = rs_setup
    idx = Index(spark, out)
    text = "def return class"
    # facet filter: the window comes from the FILTERED primary ranking
    py = set(ordered.index[ordered["lang"] == "py"])
    prim = [(d, s) for _, d, s in oracle.search(text, len(ordered))
            if d in py][:20]
    want = sorted(((s + 0.01 * dl[d], d) for d, s in prim),
                  key=lambda r: (-r[0], r[1]))[:10]
    got = rescore_rows(idx, [(0, text, 10)], window=20, by="dl",
                       field_weight=0.01, filters={"lang": ["py"]})
    assert [(round(f, 9), d) for _, _, d, f, _b, _r, _p in got] \
        == [(round(f, 9), d) for f, d in want]
    # min_match flows through to the primary pass
    msm = {d for _, d, _ in oracle.search_msm(text, len(ordered), 3)}
    got2 = rescore_rows(idx, [(0, text, 10)], window=20, min_match=3)
    assert {d for _, _, d, *_ in got2} <= msm and got2
    # OOV -> empty; validation errors
    assert rescore_rows(idx, [(0, "zz_oov", 5)], window=10) == []
    with pytest.raises(ValueError, match="exceeds the rescore window"):
        rescore_rows(idx, [(0, text, 11)], window=10)
    with pytest.raises(ValueError, match="window must be"):
        rescore_rows(idx, [(0, text, 0)], window=0)
    with pytest.raises(ValueError, match="not numeric"):
        rescore_rows(idx, [(0, text, 5)], by="repo")
