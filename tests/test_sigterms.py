"""Significant-terms aggregation (plans/sigterms.py).

Contract: JLH-scored overrepresented vocabulary of the match set —
fg counts matching docs containing the term, bg is the dictionary df,
only p_fg > p_bg rank, (score desc, term asc) ordered. Exact under
filters and tombstones, identical across the broadcast and co-shuffle
join regimes, and facet presence tags never leak into results.
"""

import numpy as np
import pytest

from fixtures.gen_corpus import gen_corpus
from tests.oracle_bm25 import OracleIndex


def _brute_sig(oracle, n_docs, qterms, k, min_fg=1, keep=None):
    match = set()
    for t in qterms:
        match |= {d for d, _ in oracle.postings.get(t, [])}
    if keep is not None:
        match &= keep
    n_fg = len(match)
    if n_fg == 0:
        return []
    out = []
    for t, plist in oracle.postings.items():
        docs = {d for d, _ in plist}
        fg = len(docs & match)
        bg = len(docs)
        p_fg, p_bg = fg / n_fg, bg / n_docs
        if fg >= min_fg and p_fg > p_bg:
            out.append((t, fg, bg, (p_fg - p_bg) * (p_fg / p_bg)))
    out.sort(key=lambda r: (-round(r[3], 9), r[0]))
    return out[:k]


@pytest.fixture(scope="module")
def sig_setup(spark, tmp_path_factory):
    from donkey_spark.plans.build import build_index
    pdf = gen_corpus(300, seed=31)
    out = str(tmp_path_factory.mktemp("sigidx"))
    build_index(spark, spark.createDataFrame(pdf), out, range_size=64,
                facets=("lang",))
    ordered = pdf.sort_values(["repo", "path", "commit"]).reset_index()
    oracle = OracleIndex(list(enumerate(ordered["content"])))
    return pdf, out, ordered, oracle


def _rows(rows):
    return [(t, fg, bg, round(s, 9)) for t, fg, bg, s in rows]


def test_sigterms_matches_brute_force(spark, sig_setup, monkeypatch):
    import donkey_spark.plans.sigterms as st
    from donkey_spark.plans.query import Index
    _, out, ordered, oracle = sig_setup
    idx = Index(spark, out)
    for text in ("def return class", "while yield", "v62_tmp v82_node"):
        qterms = sorted(set(text.split()))
        want = _rows(_brute_sig(oracle, len(ordered), qterms, 12))
        got = _rows(st.significant_terms(idx, text, k=12))
        assert got == want and got, text
        # the co-shuffle regime (gate forced shut) is bit-identical
        monkeypatch.setattr(st, "SIG_BROADCAST_BYTES", 0)
        assert _rows(st.significant_terms(idx, text, k=12)) == want
        monkeypatch.setattr(st, "SIG_BROADCAST_BYTES", 64 << 20)
    # OOV: empty, not an error
    assert st.significant_terms(idx, "zz_oov_token", k=5) == []
    # min_fg prunes, exclusion drops the query's own tokens
    want3 = _rows(_brute_sig(oracle, len(ordered),
                             ["def", "return", "class"], 12, min_fg=5))
    assert _rows(st.significant_terms(idx, "def return class", k=12,
                                      min_fg=5)) == want3
    got_x = st.significant_terms(idx, "def return class", k=12,
                                 include_query_terms=False)
    assert got_x and not ({t for t, *_ in got_x}
                          & {"def", "return", "class"})
    with pytest.raises(ValueError, match="min_fg"):
        st.significant_terms(idx, "def", k=0)


def test_sigterms_filters_and_tombstones(spark, sig_setup, tmp_path):
    """Filters and deletions restrict the FOREGROUND only — bg is the
    frozen corpus df, like scoring."""
    import shutil

    import donkey_spark.plans.sigterms as st
    from donkey_spark.plans.delete import delete_docs
    from donkey_spark.plans.query import Index
    pdf, src, ordered, oracle = sig_setup
    out = str(tmp_path / "idx")
    shutil.copytree(src, out)
    text = "def return class"
    qterms = sorted(set(text.split()))
    py = set(ordered.index[ordered["lang"] == "py"])
    idx = Index(spark, out)
    want = _rows(_brute_sig(oracle, len(ordered), qterms, 10, keep=py))
    got = _rows(st.significant_terms(idx, text, k=10,
                                     filters={"lang": ["py"]}))
    assert got == want and got
    # no facet presence tag ever surfaces
    assert all(not t.startswith("\x01")
               for t, *_ in st.significant_terms(idx, text, k=200))
    # tombstone half the py docs: fg shrinks, bg frozen
    dead = sorted(py)[::2]
    delete_docs(spark, out, [int(d) for d in dead])
    idx2 = Index(spark, out)
    keep = set(range(len(ordered))) - set(dead)
    want2 = _rows(_brute_sig(oracle, len(ordered), qterms, 10,
                             keep=keep))
    assert _rows(st.significant_terms(idx2, text, k=10)) == want2


def test_sigterms_pattern_mode_excludes_expanded_terms(spark, sig_setup):
    """mode="pattern": the match set is the expansion's OR match set,
    and include_query_terms=False excludes the EXPANDED terms (return,
    read, ...), never tokens of the raw pattern text (re/turn/ad)."""
    import donkey_spark.plans.sigterms as st
    from donkey_spark.plans.query import Index
    _, out, _, _ = sig_setup
    idx = Index(spark, out)
    text = "/re(turn|ad)/"
    (_, terms, _), = idx.resolve_pattern_terms([(0, text, 1)])
    assert "return" in terms and len(terms) >= 2
    want = st.significant_terms(idx, " ".join(terms), k=12)
    assert st.significant_terms(idx, text, k=12, mode="pattern") == want
    got_x = st.significant_terms(idx, text, k=12, mode="pattern",
                                 include_query_terms=False)
    assert got_x and not ({t for t, *_ in got_x} & set(terms))
