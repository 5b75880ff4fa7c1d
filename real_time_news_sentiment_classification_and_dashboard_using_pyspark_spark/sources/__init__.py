from .tables import TABLE_NAMES, table, load_all

__all__ = ["TABLE_NAMES", "table", "load_all"]
