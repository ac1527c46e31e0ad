"""Deterministic fixture generator (FIXTURES.md; SURVEY §5.3, milestone M0).

Generates the `corpus_files` table (north_rule input shape, BASELINE.json
input_hint: repo/path/commit/lang/content), `ref_hashes`, and the §Q frozen
query set — all from numpy.random.default_rng, no external data.

Generation is **vectorized and chunked** (one Zipf draw per chunk, per-chunk
seed = (seed, chunk_id)) so the 200k-file bench corpus generates in minutes;
chunking also parallelizes across processes. Determinism contract: content
depends only on (seed, global row index) partitioning into fixed CHUNK-sized
chunks — independent of process count.

Usage:
    python fixtures/gen_corpus.py --scale bench --out /tmp/fixtures_bench -j 16
Scales: t1=2,000 rows, t2=20,000, bench=200,000 (BASELINE.md).
"""

from __future__ import annotations

import argparse
import hashlib
import os
from multiprocessing import Pool

import numpy as np
import pandas as pd

SCALES = {"t1": 2_000, "t2": 20_000, "bench": 400_000,
          "bench250k": 250_000,    # weak-scaling curve: 125k files/core
          "bench500k": 500_000,    # ... at local[2]/local[4]/local[8]
          "bench1m": 1_000_000}
CHUNK = 2_000
VOCAB_SIZE = 20_000
TOKENS_LO, TOKENS_HI = 60, 2_400   # per-doc token count range
PUNCT_P = 0.08

_DIRS = ("core util io net sql exec plan scan sort agg join hash index store "
         "cache meta log conf api cli fmt enc dec buf mem task job stage row "
         "col type expr func lex parse opt rule stat").split()
_EXTS = {"py": "py", "java": "java", "scala": "scala", "c": "c", "go": "go",
         "md": "md"}
_LANGS = ["py", "java", "scala", "c", "go", "md"]
_LANG_P = [0.3, 0.2, 0.15, 0.15, 0.1, 0.1]

_KEYWORDS = ("def class return import if else for while try except with as "
             "lambda yield pass break continue not and or in is none true "
             "false spark select filter join group agg window partition "
             "shuffle broadcast index posting term score query merge block "
             "encode decode hash sort scan read write table column row").split()
_PUNCT = np.array(["(", ")", "{", "}", "==", "->", "+", "*", ":", ",", ".",
                   ";", "#", "=", "<=", ">=", "&&", "||"])

_EDGE_DOCS = ["", "   \n\t  ", "(((|||)))==->", "x" * 70 + " ok_token",
              "naïve café 日本語 x9", " ".join(["loop_token"] * 1000)]


def _vocab() -> np.ndarray:
    words = list(_KEYWORDS)
    base = ("data val ptr buf ctx cfg tmp arg res out src dst len cnt idx "
            "pos key num obj str map arr vec ref err msg node leaf").split()
    i = 0
    while len(words) < VOCAB_SIZE:
        words.append(f"v{i}_{base[i % len(base)]}")
        i += 1
    return np.array(words[:VOCAB_SIZE])


_VOCAB = _vocab()


def _gen_chunk(args: tuple[int, int, int]) -> pd.DataFrame:
    """(chunk_id, n_rows, seed) -> chunk of corpus rows (vectorized)."""
    chunk_id, n, seed = args
    rng = np.random.default_rng((seed, chunk_id))
    start = chunk_id * CHUNK
    gidx = np.arange(start, start + n)

    n_tok = rng.integers(TOKENS_LO, TOKENS_HI, size=n)
    total = int(n_tok.sum())
    ranks = np.minimum(rng.zipf(1.3, size=total) - 1, VOCAB_SIZE - 1)
    toks = _VOCAB[ranks]
    pm = rng.random(total) < PUNCT_P
    toks[pm] = rng.choice(_PUNCT, size=int(pm.sum()))
    ends = np.cumsum(n_tok)
    starts = ends - n_tok
    contents = [" ".join(toks[s:e]) for s, e in zip(starts, ends)]

    # ~2% duplicate content (distinct PK, identical sha256)
    n_dup = max(1, n // 50)
    src = rng.integers(0, n, size=n_dup)
    dst = rng.integers(0, n, size=n_dup)
    for s, t in zip(src, dst):
        if s != t:
            contents[t] = contents[s]
    if chunk_id == 0:                      # edge docs (FIXTURES.md §1)
        for j, c in enumerate(_EDGE_DOCS):
            contents[j] = c

    langs = rng.choice(_LANGS, size=n, p=_LANG_P)
    d1 = rng.choice(_DIRS, size=n)
    d2 = rng.choice(_DIRS, size=n)
    commits = rng.bytes(20 * n).hex()
    return pd.DataFrame({
        "repo": [f"org{i % 7}/proj{i % 23}" for i in gidx],
        "path": [f"src/{a}/{b}_{i}.{_EXTS[lg]}"
                 for a, b, i, lg in zip(d1, d2, gidx, langs)],
        "commit": [commits[i * 40:(i + 1) * 40] for i in range(n)],
        "lang": langs,
        "content": contents,
    })


def gen_corpus(n_rows: int, seed: int = 42, workers: int = 1) -> pd.DataFrame:
    chunks = [(c, min(CHUNK, n_rows - c * CHUNK), seed)
              for c in range((n_rows + CHUNK - 1) // CHUNK)]
    if workers > 1 and len(chunks) > 1:
        with Pool(workers) as pool:
            parts = pool.map(_gen_chunk, chunks)
    else:
        parts = [_gen_chunk(c) for c in chunks]
    return pd.concat(parts, ignore_index=True)


def gen_ref_hashes(corpus: pd.DataFrame) -> pd.DataFrame:
    h = corpus["content"].map(
        lambda c: hashlib.sha256(c.encode("utf-8")).hexdigest())
    return pd.DataFrame({"repo": corpus["repo"], "path": corpus["path"],
                         "commit": corpus["commit"], "sha256": h})


def gen_queries(corpus: pd.DataFrame, seed: int = 42) -> pd.DataFrame:
    """§Q: 20 single-term (10 hot / 10 rare), 20 two-term, 8 three, 2 four;
    ≥3 with one OOV term; 1 fully OOV; k=10 except two k=100."""
    from donkey_spark.functions.tokenize import tokenize_py as tokenize  # §T
    rng = np.random.default_rng(seed + 1)
    from collections import Counter
    df_counter: Counter = Counter()
    sample = corpus["content"].iloc[:5000]   # df ranking from a fixed prefix
    for c in sample:
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


def write_fixture(scale: str, out_dir: str, seed: int = 42,
                  workers: int = 1) -> None:
    os.makedirs(out_dir, exist_ok=True)
    corpus = gen_corpus(SCALES[scale], seed, workers)
    # small row groups => the file splits across Spark input tasks
    corpus.to_parquet(os.path.join(out_dir, "corpus_files.parquet"),
                      index=False, row_group_size=2048)
    gen_ref_hashes(corpus).to_parquet(
        os.path.join(out_dir, "ref_hashes.parquet"), index=False)
    gen_queries(corpus, seed).to_parquet(
        os.path.join(out_dir, "queries.parquet"), index=False)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", choices=list(SCALES), default="t1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("-j", "--workers", type=int, default=1)
    a = ap.parse_args()
    write_fixture(a.scale, a.out, a.seed, a.workers)
    print(f"wrote {a.scale} fixture ({SCALES[a.scale]} rows) to {a.out}")
