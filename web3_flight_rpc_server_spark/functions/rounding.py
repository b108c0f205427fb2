"""Cross-engine deterministic rounding.

``round(double, 4)`` is NOT portable: Spark rounds via BigDecimal
HALF_UP on the exact binary expansion, DuckDB via a different scheme,
and values like 17947.60995 (exact products of 2-decimal inputs) land
on opposite sides. Both engines do see bit-identical IEEE doubles, so a
rounding built only from exact IEEE ops (*, +, floor, /) is
deterministic and identical across engines:

    round4(x) = floor(x * 10000 + 0.5) / 10000

Use ``round4`` on the Spark side and ``ORACLE_ROUND4.format(expr)`` in
oracle SQL wherever a float leaves the engine for value-hashing.
Per-row arithmetic over identical inputs (same operation order) needs
no rounding at all — products/sums of the same doubles are bit-equal —
but rounding aggregates is required because shuffle accumulation order
differs run to run.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ORACLE_ROUND4 = "floor(({}) * 10000 + 0.5) / 10000"


def round4(c: Column) -> Column:
    """floor(x*1e4 + 0.5)/1e4 — portable 4-decimal half-up rounding."""
    return F.floor(c * 10000 + F.lit(0.5)) / 10000
