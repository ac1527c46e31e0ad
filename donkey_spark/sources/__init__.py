from .corpus import (CORPUS_SCHEMA, scan_corpus, documents_as_corpus,  # noqa: F401
                     check_sha256)
