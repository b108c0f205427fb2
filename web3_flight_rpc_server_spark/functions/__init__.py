from .rounding import ORACLE_ROUND4, round4  # noqa: F401
