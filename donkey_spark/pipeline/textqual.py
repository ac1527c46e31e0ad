"""Text analysis for training-data pipelines: language id, quality scoring,
token stats, document fingerprinting.

lang_id / quality_score are pure built-in expressions (◇ DuckDB-checked);
winnowing fingerprints [Schleimer et al., SIGMOD 2003] are engine-side
numpy, tested against a transparent Python oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokenize_expr

# tiny per-language stopword lists — a deterministic n-gram/stopword
# heuristic, not a model (the container has no langid libs; the heuristic
# IS the product: both engines compute the identical expression)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "on"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "un", "une", "dans"],
    "es": ["el", "la", "los", "las", "es", "no", "un", "una", "por"],
}


def _hits(tokens, lang: str):
    return F.size(F.array_intersect(
        tokens, F.array(*[F.lit(w) for w in STOPWORDS[lang]])))


def lang_id(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """(doc_id, pred_lang, best_hits): argmax of stopword overlap, ties
    broken alphabetically ('xx' when nothing matches)."""
    toks = F.array_distinct(tokenize_expr(F.col(text_col)))
    d = df.select(id_col, toks.alias("ts"))
    for lg in STOPWORDS:
        d = d.withColumn(f"hits_{lg}", _hits(F.col("ts"), lg))
    best = F.greatest(*[F.col(f"hits_{lg}") for lg in STOPWORDS])
    pred = F.lit("xx")
    for lg in sorted(STOPWORDS, reverse=True):
        pred = F.when((F.col(f"hits_{lg}") == best) & (best > 0),
                      F.lit(lg)).otherwise(pred)
    return d.select(id_col, pred.alias("pred_lang"),
                    best.cast("long").alias("best_hits"))


def quality_score(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Length / punctuation / stopword heuristics, all codegen:
    (doc_id, n_tokens, alnum_ratio, stop_ratio, quality)."""
    toks = tokenize_expr(F.col(text_col))
    n_tok = F.size(toks)
    text_len = F.length(F.col(text_col))
    alnum_len = F.length(F.regexp_replace(
        F.lower(F.col(text_col)), "[^a-z0-9_]", ""))
    all_stop = F.array(*[F.lit(w) for ws in STOPWORDS.values() for w in ws])
    stop_hits = F.size(F.array_intersect(F.array_distinct(toks), all_stop))
    alnum_ratio = F.when(text_len > 0, alnum_len / text_len).otherwise(0.0)
    stop_ratio = F.when(n_tok > 0, stop_hits / n_tok).otherwise(0.0)
    quality = (F.least(n_tok / 100.0, F.lit(1.0)) * 0.4
               + alnum_ratio * 0.4 + F.least(stop_ratio * 10, F.lit(1.0))
               * 0.2)
    return df.select(
        id_col, n_tok.cast("long").alias("n_tokens"),
        F.round(alnum_ratio, 4).alias("alnum_ratio"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(quality, 4).alias("quality"))


# --- winnowing fingerprints ---------------------------------------------------

#: polynomial base for k-gram hashes (FNV-1a prime — odd, so multiplication
#: is a bijection mod 2^64 and the rolling combine loses no entropy)
_WINNOW_B = 1099511628211


def winnow_py(tokens: list[str], k: int = 4, w: int = 5) -> list[int]:
    """Transparent oracle: per-token sha256 hashes combined into k-gram
    hashes by Horner's rule mod 2^64, window-min (standard winnowing),
    distinct, sorted. The hash spec is polynomial-over-token-hashes (not
    sha256 of the joined k-gram) so the engine path can compute it with
    pure numpy vector ops over a once-per-unique-token hash table."""
    import hashlib
    n = len(tokens) - k + 1
    if n <= 0:
        return []
    th = [int.from_bytes(hashlib.sha256(t.encode()).digest()[:8], "big")
          for t in tokens]
    hs = []
    for i in range(n):
        h = 0
        for j in range(k):
            h = (h * _WINNOW_B + th[i + j]) % (1 << 64)
        hs.append(h)
    out = set()
    for s in range(max(1, n - w + 1)):
        win = hs[s:s + w]
        m = min(win)
        out.add(m)
    return sorted(out)


def winnow_fingerprints(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 4,
                        w: int = 5) -> DataFrame:
    """(doc_id, fingerprint:long) winnowed k-gram fingerprints (exploded).

    Batch-vectorized twin of ``winnow_py``: unique tokens of the Arrow
    batch are sha256-hashed once (factorize → table lookup), k-gram hashes
    are k fused uint64 vector ops (Horner), and the window minimum is one
    ``sliding_window_view(...).min(axis=1)`` — no per-token or per-k-gram
    Python anywhere."""
    from pyspark.sql import types as T

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _winnow(content: pd.Series) -> pd.Series:
        return winnow_batch(content, k, w)

    return (df.select(id_col, _winnow(F.col(text_col)).alias("fps"))
            .select(id_col, F.explode("fps").alias("fingerprint")))


def winnow_batch(content: pd.Series, k: int = 4, w: int = 5) -> pd.Series:
    """Batch kernel for winnow_fingerprints (plain pandas in/out — directly
    microbenchable, bench/micro_pipeline.py). Returns a Series of signed
    int64 fingerprint lists, one per document."""
    import hashlib
    import unicodedata
    from numpy.lib.stride_tricks import sliding_window_view

    from ..config import MAX_TOKENS_PER_DOC
    from ..functions.tokenize import _RE_LEN

    B = np.uint64(_WINNOW_B)
    cap = MAX_TOKENS_PER_DOC            # §T.3 — every engine path caps
    tok_lists = [(_RE_LEN.findall(
        unicodedata.normalize("NFC", x).lower())[:cap]
        if x else []) for x in content]
    flat = np.array([t for toks in tok_lists for t in toks], dtype=object)
    if flat.size:
        codes, uniques = pd.factorize(flat)
        table = np.fromiter(
            (int.from_bytes(hashlib.sha256(u.encode()).digest()[:8],
                            "big") for u in uniques),
            dtype=np.uint64, count=len(uniques))
        hashes = table[codes]
    else:
        hashes = np.empty(0, dtype=np.uint64)
    out, pos = [], 0
    with np.errstate(over="ignore"):     # uint64 wrap IS the hash spec
        for toks in tok_lists:
            m = len(toks)
            th = hashes[pos:pos + m]
            pos += m
            n = m - k + 1
            if n <= 0:
                out.append([])
                continue
            H = np.zeros(n, dtype=np.uint64)
            for j in range(k):
                H = H * B + th[j:j + n]
            if n <= w:
                fps = H.min(keepdims=True)
            else:
                fps = sliding_window_view(H, w).min(axis=1)
            out.append(np.unique(fps).view(np.int64))   # ndarray: Arrow
    return pd.Series(out, dtype=object)                 # boxes no per-fp int
