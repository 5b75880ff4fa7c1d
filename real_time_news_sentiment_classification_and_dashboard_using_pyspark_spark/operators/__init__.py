from . import asof, multimodal, skew  # noqa: F401

from .asof import asof_join
from .skew import salted_agg

__all__ = ["asof_join", "salted_agg", "asof", "multimodal", "skew"]
