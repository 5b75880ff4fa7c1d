from .text import (
    clean_text,
    tokens,
    token_hash60,
    stable_fingerprint,
)
from .sentiment import (
    LEXICON,
    lexicon_df,
    lexicon_values_cte,
    classify_expr,
    confidence_expr,
    scored_documents,
)

__all__ = [
    "clean_text",
    "tokens",
    "token_hash60",
    "stable_fingerprint",
    "LEXICON",
    "lexicon_df",
    "lexicon_values_cte",
    "classify_expr",
    "confidence_expr",
    "scored_documents",
]
