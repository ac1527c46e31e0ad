"""Tokenizer — donkey's Extractor analog (SURVEY op 10).

Donkey plugs a per-media extractor (raw bytes → feature bag) into its
pipeline `[donkey:src/donkey.h plugin contract — unverified, SURVEY §0]`;
here the extractor is a deterministic code tokenizer, frozen in FIXTURES.md
§T so the engine, the pure-Python oracle, and the fixtures can never drift.

Two implementations, tested equal on every fixture:

* ``tokenize_pandas_udf`` — Arrow-vectorized pandas UDF (true NFC normalize);
  the engine default, per BASELINE.json input_hint ("vectorized pandas/Arrow
  UDFs, no per-row Python").
* ``tokenize_expr`` — pure JVM Catalyst expression (lower → regexp_extract_all
  → filter → slice). Whole-stage-codegen'd, no Python worker at all; used by
  the ◇ oracle queries and available as the fast path for NFC-clean corpora
  (it cannot NFC-normalize — the one behavior difference, covered by a test).
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import (MAX_TOKEN_LEN, MAX_TOKENS_PER_DOC, MIN_TOKEN_LEN,
                      TOKEN_RE)


_RE = re.compile(TOKEN_RE)
# Length-enforcing twin of TOKEN_RE: same token set as findall+filter, but
# the length bounds live in the pattern (lookarounds reject longer runs), so
# no Python-level filter loop runs over hundreds of millions of tokens.
_RE_LEN = re.compile(
    rf"(?<![a-z0-9_])[a-z0-9_]{{{MIN_TOKEN_LEN},{MAX_TOKEN_LEN}}}(?![a-z0-9_])")


def tokenize_py(content: str | None) -> list[str]:
    """Driver-side §T tokenizer (query parsing — a handful of strings)."""
    if content is None:
        return []
    s = unicodedata.normalize("NFC", content).lower()
    return _RE_LEN.findall(s)[:MAX_TOKENS_PER_DOC]


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_pandas_udf(content: pd.Series) -> pd.Series:
    findall, norm, cap = _RE_LEN.findall, unicodedata.normalize, \
        MAX_TOKENS_PER_DOC
    return content.map(
        lambda x: findall(norm("NFC", x).lower())[:cap] if x else [])


def tokenize_expr(content: Column) -> Column:
    """JVM twin of the §T tokenizer (assumes NFC-normalized input)."""
    toks = F.regexp_extract_all(F.lower(content), F.lit(TOKEN_RE), 0)
    toks = F.filter(toks, lambda t: (F.length(t) >= MIN_TOKEN_LEN)
                    & (F.length(t) <= MAX_TOKEN_LEN))
    return F.slice(toks, 1, MAX_TOKENS_PER_DOC)


_FEATURES_T = T.StructType([
    T.StructField("terms", T.ArrayType(T.StringType())),
    T.StructField("tfs", T.ArrayType(T.IntegerType())),
    T.StructField("dl", T.IntegerType()),
])


@F.pandas_udf(_FEATURES_T)
def doc_features_udf(content: pd.Series) -> pd.DataFrame:
    """Fused extractor: content -> (unique terms, tfs, dl) in ONE Arrow pass.

    Donkey's Extractor emits the full feature bag; fusing tokenize + count
    here means raw token arrays never cross the Arrow boundary (≈3–10×
    fewer bytes than tokens on code corpora) and no second UDF stage runs.
    """
    from collections import Counter
    findall, norm = _RE_LEN.findall, unicodedata.normalize
    cap = MAX_TOKENS_PER_DOC
    out_t, out_f, out_dl = [], [], []
    for x in content:
        toks = findall(norm("NFC", x).lower())[:cap] if x else []
        c = Counter(toks)
        out_t.append(list(c.keys()))
        out_f.append(list(c.values()))
        out_dl.append(len(toks))
    return pd.DataFrame({"terms": out_t, "tfs": out_f, "dl": out_dl})


#: mapInArrow output schema for doc_features_arrow (struct mirrors
#: doc_features_udf so downstream plans are extractor-agnostic)
FEATURES_STRUCT_DDL = ("f struct<terms:array<string>,tfs:array<int>,"
                       "dl:int>")


def doc_features_arrow(batches):
    """mapInArrow twin of doc_features_udf — the fully-vectorized extractor
    (kernels/exttok.py: LUT byte scan + dictionary-encode + key-sort tf).

    MEASURED ALTERNATIVE, not the default: on this host the per-doc
    C-level regex+Counter path is faster (the numpy passes are memory-
    bandwidth-bound and this box's single-core bandwidth is weak —
    BENCH/BASELINE.md 'extractor A/B'); on hardware with healthy memory
    subsystems the vectorized path is the scale bet. Select with
    build_index(extractor='arrow'). Results are exactly equal (tested).

    Expects 'content' in the batch; emits all other columns + struct 'f'.
    """
    import pyarrow as pa

    from ..kernels.exttok import extract_doc_features
    for b in batches:
        names = b.schema.names
        content = b.column(names.index("content"))
        terms, tfs, dl = extract_doc_features(content)
        f = pa.StructArray.from_arrays(
            [terms, tfs, pa.array(dl, pa.int32())],
            names=["terms", "tfs", "dl"])
        keep = [b.column(i) for i, nm in enumerate(names) if nm != "content"]
        yield pa.RecordBatch.from_arrays(
            keep + [f], names=[nm for nm in names if nm != "content"] + ["f"])


def doc_terms_expr(df, id_col: str = "doc_id", tokens_col: str = "tokens"):
    """Exploded (doc_id, dl, term, tf) from a tokens column — built-ins only
    (SURVEY op 11 ◇ oracle path). dl counts ALL kept tokens, including those
    of tf>1; docs with zero tokens drop out here (rejoined via the docs
    table where needed)."""
    return (df
            .withColumn("dl", F.size(F.col(tokens_col)))
            .select(id_col, "dl", F.explode(tokens_col).alias("term"))
            .groupBy(id_col, "dl", "term")
            .agg(F.count("*").cast("int").alias("tf")))
