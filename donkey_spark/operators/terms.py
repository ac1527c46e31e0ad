"""Op 11 — per-doc term frequencies, vectorized (SURVEY §2.3).

Donkey's feature weights within an object; here `(doc_id, dl, term, tf)`.

Engine path: one Arrow pandas UDF counts tokens per doc and returns two
aligned arrays, which explode to exactly one row per UNIQUE (doc, term) —
no groupBy shuffle to compute tf, and the big downstream exchange moves
`unique pairs`, not raw token occurrences (≈3–10× fewer rows on code).
Oracle path (◇, built-ins only): explode + groupBy — functions.tokenize.doc_terms_expr.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PAIRS_T = T.StructType([
    T.StructField("terms", T.ArrayType(T.StringType())),
    T.StructField("tfs", T.ArrayType(T.IntegerType())),
])


@F.pandas_udf(_PAIRS_T)
def _term_freqs_udf(tokens: pd.Series) -> pd.DataFrame:
    out_t, out_f = [], []
    for toks in tokens:
        items = sorted(Counter(toks).items())
        out_t.append([t for t, _ in items])
        out_f.append([int(n) for _, n in items])
    return pd.DataFrame({"terms": out_t, "tfs": out_f})


def doc_terms_vectorized(tokens_df: DataFrame, id_col: str = "doc_id",
                         tokens_col: str = "tokens") -> DataFrame:
    """tokens_df(id, tokens) -> (id, dl:int, term, tf:int); zero-token docs
    drop out (their dl lives on the docs table)."""
    pairs = (tokens_df
             .select(id_col,
                     F.size(F.col(tokens_col)).cast("int").alias("dl"),
                     _term_freqs_udf(F.col(tokens_col)).alias("p")))
    return (pairs
            .select(id_col, "dl",
                    F.explode(F.arrays_zip("p.terms", "p.tfs")).alias("e"))
            .select(id_col, "dl",
                    F.col("e.terms").alias("term"),
                    F.col("e.tfs").alias("tf")))
