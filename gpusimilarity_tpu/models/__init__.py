from .fingerprint_db import FingerprintDB  # noqa: F401
from .registry import DatabaseRegistry, merge_results, ID_JOIN  # noqa: F401
from .results import SearchResult  # noqa: F401
