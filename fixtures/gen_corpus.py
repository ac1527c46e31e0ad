"""Deterministic fixture generator (FIXTURES.md; SURVEY §5.3, milestone M0).

Generates the `corpus_files` table (north_rule input shape, BASELINE.json
input_hint: repo/path/commit/lang/content), `ref_hashes`, and the §Q frozen
query set — all from numpy.random.default_rng(seed), no external data.

Usage:
    python fixtures/gen_corpus.py --scale t1 --out /tmp/fixtures_t1
Scales: t1=2,000 rows, t2=20,000, bench=200,000 (BASELINE.md).
"""

from __future__ import annotations

import argparse
import hashlib
import os

import numpy as np
import pandas as pd

SCALES = {"t1": 2_000, "t2": 20_000, "bench": 200_000}

_DIRS = ("core util io net sql exec plan scan sort agg join hash index store "
         "cache meta log conf api cli fmt enc dec buf mem task job stage row "
         "col type expr func lex parse opt rule stat").split()
_EXTS = {"py": "py", "java": "java", "scala": "scala", "c": "c", "go": "go",
         "md": "md"}
_LANGS = ["py", "java", "scala", "c", "go", "md"]
_LANG_P = [0.3, 0.2, 0.15, 0.15, 0.1, 0.1]

_KEYWORDS = ("def class return import if else for while try except with as "
             "lambda yield pass break continue not and or in is None True "
             "False spark select filter join group agg window partition "
             "shuffle broadcast index posting term score query merge block "
             "encode decode hash sort scan read write table column row").split()
_PUNCT = ["(", ")", "{", "}", "==", "->", "+", "*", ":", ",", ".", ";", "#",
          "=", "<=", ">=", "&&", "||"]


def _vocab(rng: np.random.Generator, size: int = 20_000) -> list[str]:
    words = list(_KEYWORDS)
    base = ("data val ptr buf ctx cfg tmp arg res out src dst len cnt idx "
            "pos key num obj str map arr vec ref err msg buf2 node leaf").split()
    i = 0
    while len(words) < size:
        w = f"v{i}_{base[i % len(base)]}"
        words.append(w)
        i += 1
    return words[:size]


def gen_corpus(n_rows: int, seed: int = 42) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    vocab = np.array(_vocab(rng))
    v = len(vocab)
    # Zipf(a=1.3) ranks over the vocabulary → hot-term skew + df=1 tail
    rows = []
    for i in range(n_rows):
        repo = f"org{i % 7}/proj{i % 23}"
        lang = str(rng.choice(_LANGS, p=_LANG_P))
        d = rng.choice(_DIRS, size=2)
        path = f"src/{d[0]}/{d[1]}_{i}.{_EXTS[lang]}"
        commit = rng.bytes(20).hex()
        n_lines = int(rng.integers(20, 601))
        lines = []
        for _ in range(n_lines):
            n_tok = int(rng.integers(3, 13))
            ranks = np.minimum(rng.zipf(1.3, size=n_tok) - 1, v - 1)
            toks = vocab[ranks].tolist()
            if rng.random() < 0.7:
                toks.insert(int(rng.integers(0, len(toks) + 1)),
                            str(rng.choice(_PUNCT)))
            lines.append(" ".join(toks))
        rows.append((repo, path, commit, lang, "\n".join(lines)))
    df = pd.DataFrame(rows, columns=["repo", "path", "commit", "lang",
                                     "content"])
    # ~2% duplicate content (distinct PK, identical sha256)
    n_dup = max(1, n_rows // 50)
    dup_src = rng.choice(n_rows, size=n_dup, replace=False)
    dup_dst = rng.choice(n_rows, size=n_dup, replace=False)
    for s, t in zip(dup_src, dup_dst):
        if s != t:
            df.loc[t, "content"] = df.loc[s, "content"]
    # edge docs (overwrite the first six rows' content)
    edges = ["", "   \n\t  ", "(((|||)))==->", "x" * 70 + " ok_token",
             "naïve café 日本語 x9", " ".join(["loop_token"] * 1000)]
    for j, c in enumerate(edges):
        df.loc[j, "content"] = c
    return df


def gen_ref_hashes(corpus: pd.DataFrame) -> pd.DataFrame:
    h = corpus["content"].map(
        lambda c: hashlib.sha256(c.encode("utf-8")).hexdigest())
    return pd.DataFrame({"repo": corpus["repo"], "path": corpus["path"],
                         "commit": corpus["commit"], "sha256": h})


def gen_queries(corpus: pd.DataFrame, seed: int = 42,
                n_queries: int = 50) -> pd.DataFrame:
    """§Q: 20 single-term (10 hot / 10 rare), 20 two-term, 8 three, 2 four;
    ≥3 with one OOV term; 1 fully OOV; k=10 except two k=100."""
    from tests.oracle_bm25 import tokenize  # frozen §T tokenizer
    rng = np.random.default_rng(seed + 1)
    from collections import Counter
    df_counter: Counter = Counter()
    for c in corpus["content"]:
        df_counter.update(set(tokenize(c)))
    terms = sorted(df_counter.items(), key=lambda kv: (-kv[1], kv[0]))
    hot = [t for t, _ in terms[:40]]
    rare = [t for t, c in terms if c <= 2][:200] or [t for t, _ in terms[-40:]]
    mid = [t for t, _ in terms[40:2000]] or hot
    qs = []
    for i in range(10):
        qs.append(hot[i % len(hot)])
    for i in range(10):
        qs.append(rare[int(rng.integers(0, len(rare)))])
    for _ in range(20):
        qs.append(" ".join(rng.choice(mid, size=2, replace=False)))
    for _ in range(8):
        qs.append(" ".join(rng.choice(mid, size=3, replace=False)))
    for _ in range(2):
        qs.append(" ".join(rng.choice(mid, size=4, replace=False)))
    qs[25] = qs[25] + " zz_oov_1"
    qs[26] = qs[26] + " zz_oov_2"
    qs[27] = qs[27] + " zz_oov_3"
    qs[49] = "zz_oov_only qq_oov_only"
    ks = [10] * len(qs)
    ks[5], ks[30] = 100, 100
    return pd.DataFrame({"query_id": range(len(qs)), "query": qs, "k": ks})


def write_fixture(scale: str, out_dir: str, seed: int = 42) -> None:
    os.makedirs(out_dir, exist_ok=True)
    corpus = gen_corpus(SCALES[scale], seed)
    corpus.to_parquet(os.path.join(out_dir, "corpus_files.parquet"),
                      index=False)
    gen_ref_hashes(corpus).to_parquet(
        os.path.join(out_dir, "ref_hashes.parquet"), index=False)
    gen_queries(corpus, seed).to_parquet(
        os.path.join(out_dir, "queries.parquet"), index=False)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", choices=list(SCALES), default="t1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    a = ap.parse_args()
    write_fixture(a.scale, a.out, a.seed)
    print(f"wrote {a.scale} fixture ({SCALES[a.scale]} rows) to {a.out}")
