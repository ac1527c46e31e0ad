from .ingest import (stream_ingest, compact_index,          # noqa: F401
                     merge_dictionary_partials)
