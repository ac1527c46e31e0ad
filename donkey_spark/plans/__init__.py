from .build import build_index           # noqa: F401
from .delete import delete_docs          # noqa: F401
from .query import Index                 # noqa: F401
