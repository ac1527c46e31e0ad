"""Large-scale training-data pipeline operators (beyond the reference's own
retrieval ops): deduplication, similarity search, text analysis, multimodal
column plumbing. Each SQL-expressible op has a DuckDB-checked ◇ entry in
donkey_spark/contract.py; engine-only ops are tested against pure-Python
oracles in tests/.
"""

from .dedup import (minhash_bands, neardup_pairs, jaccard_pairs,   # noqa: F401
                    simhash64, shingle_tokens)
from .similarity import cosine_topk, lsh_ann_topk                  # noqa: F401
from .textqual import lang_id, quality_score, winnow_fingerprints  # noqa: F401
