from .doc_ids import assign_doc_ids          # noqa: F401
from .terms import doc_terms_vectorized      # noqa: F401
from .postings import build_segments, merge_segments, segments_digest  # noqa: F401
