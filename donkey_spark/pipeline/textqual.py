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

def winnow_py(tokens: list[str], k: int = 4, w: int = 5) -> list[int]:
    """Transparent oracle: k-gram rolling hashes, window-min with rightmost
    tie position (standard winnowing), distinct, sorted."""
    import hashlib
    n = len(tokens) - k + 1
    if n <= 0:
        return []
    hs = [int.from_bytes(hashlib.sha256(
        " ".join(tokens[i:i + k]).encode()).digest()[:8], "big")
        for i in range(n)]
    out = set()
    for s in range(max(1, n - w + 1)):
        win = hs[s:s + w]
        m = min(win)
        out.add(m)
    return sorted(out)


def winnow_fingerprints(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 4,
                        w: int = 5) -> DataFrame:
    """(doc_id, fingerprint:long) winnowed k-gram fingerprints (exploded)."""
    import hashlib
    import unicodedata
    from pyspark.sql import types as T
    from ..functions.tokenize import _RE_LEN

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _winnow(content: pd.Series) -> pd.Series:
        out = []
        for x in content:
            toks = (_RE_LEN.findall(
                unicodedata.normalize("NFC", x).lower()) if x else [])
            fps = winnow_py(toks, k, w)
            out.append([f - (1 << 64) if f >= (1 << 63) else f
                        for f in fps])
        return pd.Series(out)

    return (df.select(id_col, _winnow(F.col(text_col)).alias("fps"))
            .select(id_col, F.explode("fps").alias("fingerprint")))
