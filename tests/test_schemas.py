"""Ingest-layer golden tests mirroring the reference's ConverterTest
(reference server/src/test/java/net/broscorp/web3/converter/
ConverterTest.java): hex decode per field, null propagation, empty
lists distinct from null."""

from __future__ import annotations

from pyspark.sql import functions as F

from web3_flight_rpc_server_spark.schemas import (
    BLOCKS_SCHEMA,
    LOGS_SCHEMA,
    hex_to_int,
    hex_to_long,
    timestamp_seconds_col,
)


def test_logs_schema_shape():
    # 9 fields, all nullable (Converter.java:41-52)
    assert len(LOGS_SCHEMA.fields) == 9
    assert all(f.nullable for f in LOGS_SCHEMA.fields)
    assert LOGS_SCHEMA["topics"].dataType.simpleString() == "array<string>"
    assert LOGS_SCHEMA["blockNumber"].dataType.simpleString() == "bigint"
    assert LOGS_SCHEMA["logIndex"].dataType.simpleString() == "int"


def test_blocks_schema_shape():
    # 22 fields; difficulty/totalDifficulty/nonce stay strings
    # (Converter.java:81-107, 265-268)
    assert len(BLOCKS_SCHEMA.fields) == 22
    for raw_hex in ("difficulty", "totalDifficulty", "nonce"):
        assert BLOCKS_SCHEMA[raw_hex].dataType.simpleString() == "string"
    for quantity in ("number", "timestamp", "gasLimit", "gasUsed", "size"):
        assert BLOCKS_SCHEMA[quantity].dataType.simpleString() == "bigint"


def test_hex_decode_golden_values(spark):
    # ConverterTest golden: blockNumber=1 from '0x1'; plus edges.
    rows = spark.createDataFrame(
        [
            ("0x1",), ("0X1",), ("1",), ("0xff",), ("0x0",),
            ("0xdeadBEEF",), ("0x7fffffffffffffff",),
            ("0xffffffffffffffff",),  # exceeds int64 -> null
            ("zzz",),                  # malformed -> null
            ("",), (None,),
        ],
        "h string",
    )
    got = [r.v for r in rows.select(hex_to_long("h").alias("v")).collect()]
    assert got == [
        1, 1, 1, 255, 0, 0xDEADBEEF, 0x7FFFFFFFFFFFFFFF, None, None, None, None,
    ]


def test_hex_to_int_and_timestamp(spark):
    df = spark.createDataFrame([("0x2", "0x3", 1672531200)], "ti string, li string, ts long")
    row = df.select(
        hex_to_int("ti").alias("ti"),
        hex_to_int("li").alias("li"),
        timestamp_seconds_col("ts").cast("string").alias("t"),
    ).collect()[0]
    # ConverterTest.java:43-70: txIndex=2, logIndex=3;
    # block fixture timestamp 1672531200 = 2023-01-01T00:00:00Z
    assert (row.ti, row.li) == (2, 3)
    assert row.t == "2023-01-01 00:00:00"


def test_empty_list_distinct_from_null(spark):
    # ConverterTest.java:92-116, 178-197: empty topics != null topics
    df = spark.createDataFrame(
        [("a", []), ("b", None)],
        "id string, topics array<string>",
    )
    got = {r.id: (r.empty, r.isnull) for r in df.select(
        "id",
        (F.size("topics") == 0).alias("empty"),
        F.col("topics").isNull().alias("isnull"),
    ).collect()}
    assert got["a"] == (True, False)
    assert got["b"] == (None, True)
