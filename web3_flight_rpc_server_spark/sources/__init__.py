from .tables import TABLE_NAMES, load_tables, register_views  # noqa: F401
