"""Query catalog. Importing this package registers every query."""

from .registry import REGISTRY, Query, register  # noqa: F401

# Side-effect imports: each module registers its queries on import.
from . import relational_queries  # noqa: F401,E402
from . import sentiment_queries  # noqa: F401,E402
from . import text_queries  # noqa: F401,E402
from . import dedup_queries  # noqa: F401,E402
from . import similarity_queries  # noqa: F401,E402
from ..operators import multimodal  # noqa: F401,E402

__all__ = ["REGISTRY", "Query", "register"]
