from .tokenize import tokenize_pandas_udf, tokenize_expr, doc_terms_expr  # noqa: F401
