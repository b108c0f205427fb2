"""Declared queries (SURVEY.md §2). Importing this package populates
the registry in ``..registry``."""

from . import (  # noqa: F401
    aggregates,
    curation,
    dedup,
    grouping,
    joins,
    lm,
    ranking,
    sampling,
    scans,
    scalar,
    strings,
    text,
    udfs,
    vectors,
    windows,
)
