"""Cross-engine deterministic 60-bit string hash.

The fingerprint operators (SimHash, winnowing) default to
``xxhash64`` — a single JVM-side codegen call, the right production
hash. But xxhash64 exists only in Spark, so results built on it admit
no DuckDB oracle. This module provides the bridge tier: the first 15
hex chars of md5 parsed as a base-16 integer. Both engines compute
md5 over identical UTF-8 bytes, and 15 hex digits = 60 bits always
fit a signed 64-bit integer, so the value is bit-identical across
engines (verified for ASCII, UTF-8 multibyte, and empty strings):

    Spark:  conv(substring(md5(x), 1, 15), 16, 10)::long
    DuckDB: ('0x' || substr(md5(x), 1, 15))::BIGINT

md5 costs ~3x an xxhash64 call, which is why it is the oracle-bridge
tier and not the default — the declared queries use it so the DRIVER
can hash-check fingerprint semantics end-to-end; production callers
keep the xxhash64 default. Uniformity over 60 bits is ample for
SimHash bit votes and winnowing minima (the top 4 bits of the 64-bit
fingerprint space are simply never set, mirrored exactly on both
sides).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_prefix60(c: Column) -> Column:
    """60-bit hash of a string column: md5 hex prefix as an integer.
    Bit-identical to :data:`MD5_PREFIX60_SQL` in DuckDB."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


# DuckDB twin — .format(expr) with the string SQL expression to hash.
MD5_PREFIX60_SQL = "('0x' || substr(md5({}), 1, 15))::BIGINT"
