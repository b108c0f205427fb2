"""Canonical dataset schemas and ingest decoders.

Mirrors the reference's two fixed Arrow schemas
(reference server/src/main/java/net/broscorp/web3/converter/
Converter.java:41-52 for logs, :81-107 for blocks):

- every field nullable (Field.nullable throughout Converter.java:42-106)
- hex quantities decoded to int64/int32 at ingest
  (Converter.java:322-336, Numeric.decodeQuantity semantics)
- unbounded quantities (difficulty, totalDifficulty, nonce) kept as RAW
  HEX STRINGS — they can exceed int64 (Converter.java:265-268 uses
  getDifficultyRaw etc.); do NOT "helpfully" cast them
- timestamp is epoch-seconds int64, not a timestamp type
  (Converter.java:85,258); expose timestamp_seconds() for time ops
- nested data is List<Utf8> only — no maps/structs anywhere
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_S = T.StringType()
_LIST_S = T.ArrayType(T.StringType(), containsNull=True)

# logs: 9 fields (Converter.java:41-52; README.md:68-80)
LOGS_SCHEMA = T.StructType(
    [
        T.StructField("address", _S, True),
        T.StructField("data", _S, True),
        T.StructField("topics", _LIST_S, True),
        T.StructField("blockNumber", T.LongType(), True),
        T.StructField("transactionHash", _S, True),
        T.StructField("transactionIndex", T.IntegerType(), True),
        T.StructField("blockHash", _S, True),
        T.StructField("logIndex", T.IntegerType(), True),
        T.StructField("removed", T.BooleanType(), True),
    ]
)

# blocks: 22 fields (Converter.java:81-107)
BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("number", T.LongType(), True),
        T.StructField("hash", _S, True),
        T.StructField("parentHash", _S, True),
        T.StructField("nonce", _S, True),          # raw hex, unbounded
        T.StructField("sha3Uncles", _S, True),
        T.StructField("logsBloom", _S, True),
        T.StructField("transactionsRoot", _S, True),
        T.StructField("stateRoot", _S, True),
        T.StructField("receiptsRoot", _S, True),
        T.StructField("author", _S, True),
        T.StructField("miner", _S, True),
        T.StructField("mixHash", _S, True),
        T.StructField("difficulty", _S, True),      # raw hex, unbounded
        T.StructField("totalDifficulty", _S, True),  # raw hex, unbounded
        T.StructField("extraData", _S, True),
        T.StructField("size", T.LongType(), True),
        T.StructField("gasLimit", T.LongType(), True),
        T.StructField("gasUsed", T.LongType(), True),
        T.StructField("timestamp", T.LongType(), True),  # epoch seconds
        T.StructField("transactions", _LIST_S, True),
        T.StructField("uncles", _LIST_S, True),
        T.StructField("sealFields", _LIST_S, True),
    ]
)


def _strip_0x(c: Column) -> Column:
    """Strip an optional 0x/0X prefix (Numeric.decodeQuantity accepts
    the prefixed form; the cleaned value must be pure hex digits)."""
    return F.when(
        F.lower(F.substring(c, 1, 2)) == "0x", F.substring(c, 3, 2_000_000)
    ).otherwise(c)


def hex_to_long(c: Column | str) -> Column:
    """Null-safe hex-quantity decode to int64 (Converter.java:322-328,
    setNullableHexAsLong). Malformed or int64-overflowing input -> null
    (the reference throws on malformed input; a distributed scan
    prefers null + downstream filter — documented deviation)."""
    col = F.col(c) if isinstance(c, str) else c
    cleaned = _strip_0x(col)
    valid = cleaned.rlike("^[0-9a-fA-F]{1,16}$")
    return F.when(valid, F.conv(cleaned, 16, 10).try_cast("long")).otherwise(
        F.lit(None).cast("long")
    )


def hex_to_int(c: Column | str) -> Column:
    """Null-safe hex decode to int32 (Converter.java:330-336).
    try_cast keeps the malformed->null contract under Spark 4's
    default ANSI mode: a plain cast of an out-of-int32-range quantity
    would throw at runtime and fail the whole scan."""
    return hex_to_long(c).try_cast("int")


def timestamp_seconds_col(c: Column | str = "timestamp") -> Column:
    """Epoch-seconds int64 -> TIMESTAMP, the notebook's
    pd.to_datetime(unit='s') (cell 22)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.timestamp_seconds(col)
