"""Pure-numpy index kernels — no Spark imports.

These fill the gaps Spark has no built-in for (SURVEY §2.8 K1–K8): posting
compression, skip/block-max metadata, BM25 scoring, block-max WAND. They run
inside Arrow-vectorized pandas UDFs (applyInPandas / cogrouped applyInPandas)
on executors; everything here is deterministic and unit-tested without Spark.
"""
