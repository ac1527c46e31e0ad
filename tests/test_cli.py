"""CLI smoke tests — the spark-submit entry points run end to end as
plain subprocesses (build → query with every filter form → delete →
query again). Guards the scripts against bitrot: they are the deploy
surface the north rule ships via --py-files."""

import json
import os
import subprocess
import sys

import pandas as pd
import pytest

from fixtures.gen_corpus import gen_corpus

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, **env):
    e = dict(os.environ, PYTHONPATH=ROOT,
             SPARK_GRAFT_CPUS="4", **env)
    # scripts use a bare SparkSession.builder (spark-submit supplies the
    # master on a cluster); supply it here the same way spark-submit would
    e.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    e["PYSPARK_SUBMIT_ARGS"] = "--master local[4] pyspark-shell"
    out = subprocess.run([sys.executable] + args, capture_output=True,
                         text=True, cwd=ROOT, timeout=600, env=e)
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    return out.stdout


@pytest.fixture(scope="module")
def cli_corpus(tmp_path_factory):
    base = tmp_path_factory.mktemp("cli")
    pdf = gen_corpus(120, seed=19)
    pdf.to_parquet(base / "corpus.parquet", index=False)
    return base


def test_cli_pattern_mode_refuses_unsupported_combos():
    """--mode pattern/bool with --snippets/--phrase (and --mode bool
    with --facet-counts — pattern DOES compose with facet counts now
    that the match surfaces expand patterns) must be an argparse-level
    error (the dispatch chains check those flags FIRST and would
    otherwise feed these modes into surfaces that reject them deep in
    the stack). The guard sits before Spark starts, so these exits are
    fast."""
    combos = [("pattern", "va*", ["--snippets", "/x"]),
              ("pattern", "va*", ["--phrase"]),
              ("bool", "aa AND bb", ["--snippets", "/x"]),
              ("bool", "aa AND bb", ["--phrase"]),
              ("bool", "aa AND bb", ["--facet-counts", "lang"])]
    for mode, q, extra in combos:
        out = subprocess.run(
            [sys.executable, "scripts/query.py", "--index", "/nope",
             "--query", q, "--mode", mode] + extra,
            capture_output=True, text=True, cwd=ROOT, timeout=60,
            env=dict(os.environ, PYTHONPATH=ROOT))
        assert out.returncode == 2
        assert (f"--mode {mode} does not compose with"
                in out.stderr)


def test_cli_build_query_delete_roundtrip(cli_corpus):
    base = cli_corpus
    idx = str(base / "idx")
    out = _run(["scripts/build_index.py", "--corpus",
                str(base / "corpus.parquet"), "--out", idx,
                "--facets", "lang", "--chunks", "2"])
    info = json.loads(out.strip().splitlines()[-1])
    # chunk boundaries are range-size multiples, so a corpus smaller
    # than one range collapses to a single chunk
    assert info["n_docs"] == 120 and info["n_chunks"] >= 1

    res = str(base / "res")
    _run(["scripts/query.py", "--index", idx, "--query", "def return",
          "-k", "5", "--out", res])
    df = pd.read_parquet(res)
    assert len(df) == 5 and (df["score"] > 0).all()
    top_ids = df.sort_values("rank")["doc_id"].tolist()

    # pagination: the --after cursor (page 1's last row) and --offset 5
    # must print the SAME page 2
    last = df.sort_values("rank").iloc[-1]
    res2 = str(base / "res2")
    _run(["scripts/query.py", "--index", idx, "--query", "def return",
          "-k", "5", "--after", f"{last['score']!r}:{last['doc_id']}",
          "--out", res2])
    page_cur = pd.read_parquet(res2).sort_values("rank")
    _run(["scripts/query.py", "--index", idx, "--query", "def return",
          "-k", "5", "--offset", "5", "--out", res2])
    page_off = pd.read_parquet(res2).sort_values("rank")
    assert page_cur["doc_id"].tolist() == page_off["doc_id"].tolist()
    assert not set(page_cur["doc_id"]) & set(top_ids)

    # every filter form parses and runs
    for filt in (["--filter", "lang=en"],
                 ["--filter", "lang=en,de"],
                 ["--filter", "lang!=en"],
                 ["--filter", "lang!=en,de", "--mode", "and"]):
        _run(["scripts/query.py", "--index", idx, "--query", "def return",
              "-k", "3", "--out", res] + filt)
        assert set(pd.read_parquet(res).columns) >= {"doc_id", "score"}

    # boolean-expression mode end to end (grammar/guardedness refusals
    # are covered argparse-cheap above and in tests/test_boolquery.py)
    _run(["scripts/query.py", "--index", idx, "--query",
          "def AND (return OR class) AND NOT zz_oov", "-k", "3",
          "--mode", "bool", "--out", res])
    bdf = pd.read_parquet(res)
    assert len(bdf) >= 1 and (bdf["score"] > 0).all()

    # per-term boosting end to end: ^9 on a term must reorder the page
    # (equality with the unboosted ranking would mean the weights were
    # dropped); --boost with a ranking-incompatible flag is an
    # argparse-level error
    _run(["scripts/query.py", "--index", idx, "--query",
          "def return^9", "-k", "5", "--boost", "--out", res])
    boosted = pd.read_parquet(res).sort_values("rank")
    assert (boosted["score"] > 0).all()
    # every ranked doc matches the query, so every score carries the
    # 9x return component — the score SETS cannot coincide
    assert (set(zip(boosted["doc_id"], boosted["score"]))
            != set(zip(df["doc_id"], df["score"])))
    bad = subprocess.run(
        [sys.executable, "scripts/query.py", "--index", idx, "--query",
         "def^2", "--boost", "--phrase"],
        capture_output=True, text=True, cwd=ROOT, timeout=120)
    assert bad.returncode == 2 and "--boost composes" in bad.stderr

    # bulk export: the full match set as metadata parquet; its
    # cardinality must equal --count's number on the same query+filter
    exp = str(base / "export")
    _run(["scripts/query.py", "--index", idx, "--query", "def return",
          "--export", "doc_id,repo,path,dl", "--filter", "lang=py",
          "--out", exp])
    edf = pd.read_parquet(exp)
    assert list(edf.columns) == ["doc_id", "repo", "path", "dl"]
    out = _run(["scripts/query.py", "--index", idx, "--query",
                "def return", "--count", "--filter", "lang=py"])
    assert len(edf) == int(out.strip().splitlines()[-1]) > 0
    bad = subprocess.run(
        [sys.executable, "scripts/query.py", "--index", idx, "--query",
         "def", "--export", "--count"],
        capture_output=True, text=True, cwd=ROOT, timeout=120)
    assert bad.returncode == 2 and "--export takes" in bad.stderr

    out = _run(["scripts/delete_docs.py", "--index", idx,
                "--ids", f"{top_ids[0]},{top_ids[1]}"])
    assert "tombstones: 2" in out
    _run(["scripts/query.py", "--index", idx, "--query", "def return",
          "-k", "5", "--out", res])
    left = pd.read_parquet(res)["doc_id"].tolist()
    assert not {top_ids[0], top_ids[1]} & set(left)

    # delete-by-query takedown: everything matching under a filter dies
    out = _run(["scripts/delete_docs.py", "--index", idx,
                "--query", "def return", "--filter", "lang=en"])
    assert "tombstones:" in out
    out = _run(["scripts/query.py", "--index", idx, "--query",
                "def return", "--count", "--filter", "lang=en"])
    assert int(out.strip().splitlines()[-1]) == 0

    # resume is a no-op when all chunks committed
    out = _run(["scripts/build_index.py", "--corpus",
                str(base / "corpus.parquet"), "--out", idx, "--resume",
                "--facets", "lang", "--chunks", "2"])
    info = json.loads(out.strip().splitlines()[-1])
    assert info["chunks_built"] == 0
    assert info["chunks_skipped"] == info["n_chunks"]


def test_cli_positional_build_and_phrase_query(cli_corpus):
    """r5: --positions build (format v3) + --phrase query end to end."""
    base = cli_corpus
    idx = str(base / "posidx")
    out = _run(["scripts/build_index.py", "--corpus",
                str(base / "corpus.parquet"), "--out", idx, "--positions"])
    info = json.loads(out.strip().splitlines()[-1])
    assert info["n_docs"] == 120 and "positions_write" in info["phases"]

    res = str(base / "pres")
    _run(["scripts/query.py", "--index", idx, "--query", "def return",
          "-k", "5", "--phrase", "--out", res])
    df = pd.read_parquet(res)
    assert len(df) >= 1 and (df["score"] > 0).all()
    assert df.sort_values("rank")["rank"].tolist() == \
        list(range(1, len(df) + 1))


def test_cli_facet_counts_snippets_upsert(cli_corpus):
    """r5: --facet-counts histogram, --snippets annotation, and the
    upsert entry point, end to end as subprocesses."""
    base = cli_corpus
    idx = str(base / "svcidx")
    _run(["scripts/build_index.py", "--corpus",
          str(base / "corpus.parquet"), "--out", idx, "--facets", "lang"])

    fres = str(base / "fcounts")
    _run(["scripts/query.py", "--index", idx, "--query", "def return",
          "--facet-counts", "lang", "--out", fres])
    fdf = pd.read_parquet(fres)
    assert set(fdf.columns) == {"value", "n_docs"}
    assert len(fdf) >= 2 and (fdf["n_docs"] > 0).all()

    # faceted navigation from the CLI: --filter restricts the histogram's
    # match set (r5 review — this composition was unreachable before)
    langs = sorted(fdf["value"])[:2]
    fres2 = str(base / "fcounts_filtered")
    _run(["scripts/query.py", "--index", idx, "--query", "def return",
          "--facet-counts", "lang", "--filter", f"lang={','.join(langs)}",
          "--out", fres2])
    fdf2 = pd.read_parquet(fres2).set_index("value")["n_docs"]
    full = fdf.set_index("value")["n_docs"]
    # the filter restricts the match set: selected values keep their
    # counts, unselected values drop out
    assert fdf2.to_dict() == {v: c for v, c in full.to_dict().items()
                              if v in langs}

    # --stats: JSON numeric aggregation over the SAME match set (every
    # gen_corpus doc has a lang, so the histogram total is the match
    # count) — filtered form rides the same --filter grammar
    out = _run(["scripts/query.py", "--index", idx, "--query",
                "def return", "--stats", "dl"])
    s = json.loads(out.strip().splitlines()[-1])
    assert s["n_docs"] == s["n_values"] == int(full.sum())
    assert s["min"] <= s["avg"] <= s["max"] \
        and s["avg"] == s["sum"] / s["n_values"]
    out = _run(["scripts/query.py", "--index", idx, "--query",
                "def return", "--stats", "dl",
                "--filter", f"lang={langs[0]}"])
    sf = json.loads(out.strip().splitlines()[-1])
    assert sf["n_docs"] == int(full[langs[0]]) and sf["sum"] < s["sum"]

    sres = str(base / "snips")
    _run(["scripts/query.py", "--index", idx, "--query", "def return",
          "-k", "5", "--snippets", str(base / "corpus.parquet"),
          "--window", "2", "--out", sres])
    sdf = pd.read_parquet(sres)
    assert len(sdf) == 5
    assert sdf["snippet"].notna().all()
    assert sdf["snippet"].str.split().map(len).le(5).all()   # 2W+1

    pdf = gen_corpus(120, seed=19)
    newv = pdf.iloc[:10].copy()
    newv["commit"] = "z" + newv["commit"].str.slice(1)
    newv["content"] = newv["content"] + " cli_upsert_marker"
    newv.to_parquet(base / "newv.parquet", index=False)
    out = _run(["scripts/upsert_docs.py", "--index", idx,
                "--docs", str(base / "newv.parquet")])
    info = json.loads(out.strip().splitlines()[-1])
    assert info["n_appended"] == 10 and info["n_tombstones"] == 10

    ures = str(base / "ures")
    _run(["scripts/query.py", "--index", idx, "--query",
          "cli_upsert_marker", "-k", "20", "--out", ures])
    udf = pd.read_parquet(ures)
    assert len(udf) == 10
    assert set(zip(udf["repo"], udf["path"])) == \
        set(zip(newv["repo"], newv["path"]))


def test_cli_sharded_search(cli_corpus):
    """--shards: federated global-stats search must equal --index over
    the same (unified) corpus, modulo the shard/doc_id columns."""
    base = cli_corpus
    pdf = gen_corpus(120, seed=19)
    pdf.iloc[::2].to_parquet(base / "half0.parquet", index=False)
    pdf.iloc[1::2].to_parquet(base / "half1.parquet", index=False)
    s0, s1, uni = (str(base / d) for d in ("sh0", "sh1", "shuni"))
    _run(["scripts/build_index.py", "--corpus",
          str(base / "half0.parquet"), "--out", s0, "--positions"])
    _run(["scripts/build_index.py", "--corpus",
          str(base / "half1.parquet"), "--out", s1, "--positions"])
    _run(["scripts/build_index.py", "--corpus",
          str(base / "corpus.parquet"), "--out", uni, "--positions"])
    sres, ures = str(base / "sres"), str(base / "ures_sh")
    _run(["scripts/query.py", "--shards", f"{s0},{s1}",
          "--query", "def return", "-k", "8", "--out", sres])
    _run(["scripts/query.py", "--index", uni,
          "--query", "def return", "-k", "8", "--out", ures])
    sh = pd.read_parquet(sres).sort_values("rank")
    un = pd.read_parquet(ures).sort_values("rank")
    assert list(zip(sh["repo"], sh["path"], sh["score"].round(6))) == \
        list(zip(un["repo"], un["path"], un["score"].round(6)))
    assert set(sh["shard"]) == {0, 1}       # both shards contributed

    # --phrase composes with --shards (positional shards, global stats)
    pres, pures = str(base / "pres"), str(base / "pures")
    _run(["scripts/query.py", "--shards", f"{s0},{s1}",
          "--query", "def return", "--phrase", "-k", "8", "--out", pres])
    _run(["scripts/query.py", "--index", uni,
          "--query", "def return", "--phrase", "-k", "8", "--out", pures])
    ph = pd.read_parquet(pres).sort_values("rank")
    un_ph = pd.read_parquet(pures).sort_values("rank")
    assert len(ph) > 0
    assert list(zip(ph["repo"], ph["path"], ph["score"].round(6))) == \
        list(zip(un_ph["repo"], un_ph["path"], un_ph["score"].round(6)))

    # --snippets composes with --shards (content fetched per hit)
    snres, snures = str(base / "snres"), str(base / "snures")
    _run(["scripts/query.py", "--shards", f"{s0},{s1}",
          "--query", "def return", "-k", "5",
          "--snippets", str(base / "corpus.parquet"), "--out", snres])
    _run(["scripts/query.py", "--index", uni,
          "--query", "def return", "-k", "5",
          "--snippets", str(base / "corpus.parquet"), "--out", snures])
    sn = pd.read_parquet(snres).sort_values("rank")
    un_sn = pd.read_parquet(snures).sort_values("rank")
    assert list(zip(sn["repo"], sn["path"], sn["snippet"])) == \
        list(zip(un_sn["repo"], un_sn["path"], un_sn["snippet"]))


def test_cli_range_facets_end_to_end(cli_corpus):
    """--range-facets build → --filter col=lo..hi (open ends, negation)
    → --facet-counts col --bin-shift: the full T25 surface as a user
    drives it, checked against pandas on the same corpus."""
    base = cli_corpus
    pdf = gen_corpus(120, seed=19)
    nc = pdf["content"].str.len()
    idx, res = str(base / "ridx"), str(base / "rres")
    _run(["scripts/build_index.py", "--corpus",
          str(base / "corpus.parquet"), "--out", idx,
          "--facets", "lang", "--range-facets", "n_chars"])

    _run(["scripts/query.py", "--index", idx, "--query", "def return",
          "-k", "200", "--out", res])
    base_hits = pd.read_parquet(res)      # k > corpus: the FULL match set
    lo, hi = int(nc.quantile(0.3)), int(nc.quantile(0.7))
    truth = dict(zip(pdf["path"], nc))

    for filt, keep in [
            (f"n_chars={lo}..{hi}", lambda v: lo <= v <= hi),
            (f"n_chars=..{hi}", lambda v: v <= hi),
            (f"n_chars={lo}..", lambda v: v >= lo),
            (f"n_chars!={lo}..{hi}", lambda v: not lo <= v <= hi)]:
        _run(["scripts/query.py", "--index", idx, "--query",
              "def return", "-k", "200", "--filter", filt, "--out", res])
        got = pd.read_parquet(res)
        want = {p for p in base_hits["path"] if keep(truth[p])}
        assert set(got["path"]) == want, filt

    # binned histogram over the match set + an active equality filter
    _run(["scripts/query.py", "--index", idx, "--query", "def return",
          "--facet-counts", "n_chars", "--bin-shift", "4",
          "--filter", "lang=py", "--out", res])
    hist = pd.read_parquet(res)
    en_paths = set(pdf.loc[pdf["lang"] == "py", "path"])
    vals = [truth[p] for p in base_hits["path"] if p in en_paths]
    want_bins = {}
    for v in vals:
        b = (v >> 4) << 4
        want_bins[(b, b + 15)] = want_bins.get((b, b + 15), 0) + 1
    got_bins = {(r.bin_lo, r.bin_hi): r.n_docs
                for r in hist.itertuples()}
    assert got_bins == want_bins and got_bins

    # --bin-shift without --facet-counts is an argparse-level error
    out = subprocess.run(
        [sys.executable, "scripts/query.py", "--index", idx,
         "--query", "x", "--bin-shift", "8"],
        capture_output=True, text=True, cwd=ROOT, timeout=600,
        env=dict(os.environ, PYTHONPATH=ROOT,
                 SPARK_LOCAL_IP="127.0.0.1",
                 PYSPARK_SUBMIT_ARGS="--master local[4] pyspark-shell"))
    assert out.returncode == 2 and "--bin-shift needs" in out.stderr

    # unknown derived column refused before Spark work begins
    out = subprocess.run(
        [sys.executable, "scripts/build_index.py", "--corpus",
         str(base / "corpus.parquet"), "--out", str(base / "nope_idx"),
         "--range-facets", "stars"],
        capture_output=True, text=True, cwd=ROOT, timeout=600,
        env=dict(os.environ, PYTHONPATH=ROOT,
                 SPARK_LOCAL_IP="127.0.0.1",
                 PYSPARK_SUBMIT_ARGS="--master local[4] pyspark-shell"))
    assert out.returncode != 0 and "stars" in (out.stderr + out.stdout)


def test_cli_backfill_and_count(cli_corpus):
    """scripts/add_facet.py (equality + --range) then --count: the ops
    path for 'we now need to filter by X' followed by the total-hits
    number, checked against pandas on the same corpus."""
    base = cli_corpus
    pdf = gen_corpus(120, seed=19)
    idx = str(base / "bfidx")
    _run(["scripts/build_index.py", "--corpus",
          str(base / "corpus.parquet"), "--out", idx])
    # equality backfill from the docs table's own lang column
    _run(["scripts/add_facet.py", "--index", idx, "--column", "lang"])
    # range backfill from caller values (n_chars has no docs column)
    vals = str(base / "nchars.parquet")
    res = str(base / "cres")
    _run(["scripts/query.py", "--index", idx, "--query", "def return",
          "-k", "200", "--out", res])
    hits = pd.read_parquet(res)
    docs_pdf = pd.DataFrame({
        "path": pdf["path"], "value": pdf["content"].str.len()})
    # map path -> doc_id through the index's own docs table
    all_ids = pd.read_parquet(f"{idx}/docs")[["doc_id", "path"]]
    docs_pdf = docs_pdf.merge(all_ids, on="path")[["doc_id", "value"]]
    docs_pdf.to_parquet(vals, index=False)
    _run(["scripts/add_facet.py", "--index", idx, "--column", "n_chars",
          "--range", "--values", vals])
    truth = dict(zip(pdf["path"], pdf["content"].str.len()))
    lang_of = dict(zip(pdf["path"], pdf["lang"]))
    lo = int(pd.Series(list(truth.values())).quantile(0.4))
    out = _run(["scripts/query.py", "--index", idx, "--query",
                "def return", "--count"])
    assert int(out.strip().splitlines()[-1]) == len(hits)
    out = _run(["scripts/query.py", "--index", idx, "--query",
                "def return", "--count", "--filter", f"n_chars={lo}..",
                "--filter", "lang=py"])
    want = sum(1 for p in hits["path"]
               if truth[p] >= lo and lang_of[p] == "py")
    assert int(out.strip().splitlines()[-1]) == want
    # --percentiles: exact dl quantiles over the same match set,
    # checked against numpy on the engine's own docs table
    out = _run(["scripts/query.py", "--index", idx, "--query",
                "def return", "--percentiles", "dl:0.5,0.95"])
    got = json.loads(out.strip().splitlines()[-1])
    import numpy as np
    dl_of = pd.read_parquet(f"{idx}/docs").set_index("path")["dl"]
    vals = dl_of.loc[hits["path"]].to_numpy(dtype=float)
    assert got["n_docs"] == len(hits) == got["n_values"]
    for q in ("0.5", "0.95"):
        assert abs(got["percentiles"][q]
                   - float(np.quantile(vals, float(q)))) < 1e-9
    # --suggest: top terms by (distance, df) for a misspelling
    out = _run(["scripts/query.py", "--index", idx,
                "--suggest", "retur", "-k", "3"])
    lines = [ln.split("\t") for ln in out.strip().splitlines()
             if "\t" in ln]
    assert lines and lines[0][0] == "return" and lines[0][1] == "1"
    # --count composes with nothing that ranks
    bad = subprocess.run(
        [sys.executable, "scripts/query.py", "--index", idx,
         "--query", "x", "--count", "--phrase"],
        capture_output=True, text=True, cwd=ROOT, timeout=600,
        env=dict(os.environ, PYTHONPATH=ROOT,
                 SPARK_LOCAL_IP="127.0.0.1",
                 PYSPARK_SUBMIT_ARGS="--master local[4] pyspark-shell"))
    assert bad.returncode == 2 and "--count takes" in bad.stderr


def test_engine_zip_is_self_contained(tmp_path):
    """scripts/make_engine_zip.py produces the --py-files artifact the
    north rule ships; importing the package from the ZIP ALONE (cwd
    outside the repo, no PYTHONPATH) must find every module — a
    missing file in the walk would only surface at cluster submit
    time otherwise."""
    out = subprocess.run([sys.executable, "scripts/make_engine_zip.py"],
                         capture_output=True, text=True, cwd=ROOT,
                         timeout=120)
    assert out.returncode == 0, out.stderr[-500:]
    zip_path = out.stdout.strip().splitlines()[-1]
    assert os.path.isfile(zip_path)
    probe = (
        "import sys; sys.path.insert(0, sys.argv[1])\n"
        "import importlib, pkgutil\n"
        "import donkey_spark\n"
        "mods = [m.name for m in pkgutil.walk_packages(\n"
        "    donkey_spark.__path__, 'donkey_spark.')]\n"
        "assert len(mods) > 30, mods\n"
        "skip = ('plans', 'streaming', 'sources', 'pipeline',\n"
        "        'operators', 'contract')   # import pyspark at module "
        "scope\n"
        "light = [m for m in mods if not any(s in m for s in skip)]\n"
        "for m in light: importlib.import_module(m)\n"
        "from donkey_spark.functions.boosts import parse_boost_text\n"
        "from donkey_spark.kernels.varint import varint_encode\n"
        "print(parse_boost_text('a bb^2')[1])\n")
    got = subprocess.run([sys.executable, "-c", probe, zip_path],
                         capture_output=True, text=True,
                         cwd=str(tmp_path), timeout=120,
                         env={"PATH": os.environ["PATH"]})
    assert got.returncode == 0, (got.stdout, got.stderr[-800:])
    assert "{'bb': 2.0}" in got.stdout


def test_cli_collapse(cli_corpus):
    """--collapse COL[:N] end to end: builds on the roundtrip test's
    index (rebuilt here if this test runs first), group rows with
    exact ranks and inner hits, plus the composition guard."""
    base = cli_corpus
    idx = str(base / "colidx")
    _run(["scripts/build_index.py", "--corpus",
          str(base / "corpus.parquet"), "--out", idx,
          "--facets", "lang"])
    res = str(base / "colres")
    _run(["scripts/query.py", "--index", idx, "--query", "def return",
          "-k", "3", "--collapse", "repo", "--out", res])
    df = pd.read_parquet(res).sort_values("rank")
    assert list(df.columns) == ["query_id", "rank", "grp", "hit_rank",
                                "doc_id", "score", "group_hits",
                                "repo", "path"]
    assert df["rank"].tolist() == [1, 2, 3]
    assert df["grp"].nunique() == 3 and (df["grp"] == df["repo"]).all()
    assert (df["hit_rank"] == 1).all() and (df["group_hits"] >= 1).all()
    # inner hits: 2 rows per surviving group, same group rank (collapse
    # on lang — repo groups are singletons at 120 docs / 161 repos)
    _run(["scripts/query.py", "--index", idx, "--query", "def return",
          "-k", "2", "--collapse", "lang:2", "--out", res])
    df2 = pd.read_parquet(res)
    assert sorted(df2["hit_rank"].tolist()) == [1, 1, 2, 2]
    assert df2.groupby("rank")["grp"].nunique().max() == 1
    # composition guard fires before Spark starts
    out = subprocess.run(
        [sys.executable, "scripts/query.py", "--index", idx,
         "--query", "def return", "--collapse", "repo",
         "--sort", "dl"],
        capture_output=True, text=True, cwd=ROOT, timeout=60,
        env=dict(os.environ, PYTHONPATH=ROOT))
    assert out.returncode == 2 and "--collapse composes" in out.stderr
