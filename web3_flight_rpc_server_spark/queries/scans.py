"""Scan / filter / projection queries (reference §2A semantics).

These reproduce the server-side operator semantics of the reference on
the synthetic tables (role mapping in FIXTURES.md: events ≈ logs,
event_id ≈ blockNumber, user_id ≈ address, split(text) ≈ topics):

- bounded range scan          (LogsService.java:505-527 paging over
                               [startBlock, endBlock])
- projection + cast           (Converter.java:126-175 row->columnar)
- pushdown IN-list filter     (LogsService.java:548-556)
- case-insensitive address    (LogSubscription.java:43-45)
- topic0 quirk                (LogSubscription.java:40-42 — only
                               topics[0] is tested AND empty-topics
                               rows pass the filter regardless)
- chunked pagination          (LogsService.java:509-521 — 500-unit
                               inclusive pages)

Scale notes: every filter here is a deterministic predicate on scan
columns — Catalyst pushes them into the parquet reader (row-group +
page pruning), so at 100 TB these are IO-bound scans that read only
matching row groups. The pagination query is a single map-side
projection + hash aggregate (partial agg before the shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import round4
from ..registry import query
from ..sources import tables


@query(
    "q_range_scan",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props
    FROM events
    WHERE event_id BETWEEN 100 AND 499
    """,
)
def q_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded historical range scan [start, end], inclusive both ends
    (reference LogsService.java:505-527; notebook cell 5)."""
    ev = tables.load_table(spark, sf_dir, "events")
    return ev.where(F.col("event_id").between(100, 499)).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


@query(
    "q_scan_project",
    oracle="""
    SELECT l_orderkey,
           CAST(l_linenumber AS BIGINT) AS linenumber,
           CAST(l_quantity AS BIGINT)   AS quantity_int,
           l_returnflag,
           floor((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 10000 + 0.5) / 10000 AS charge,
           floor((100.0 * l_discount) * 10000 + 0.5) / 10000 AS discount_pct
    FROM lineitem
    """,
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + type cast, the Converter's row->columnar convert
    re-expressed as select/cast (Converter.java:126-175,322-336), plus
    derived arithmetic columns (notebook cell 18: gas_utilization =
    gasUsed/gasLimit*100) — projection and expression evaluation are
    the same codegen stage, so the fold costs nothing and keeps the
    registry inside the driver's CORRECTNESS window."""
    li = tables.load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("linenumber"),
        F.col("l_quantity").cast("long").alias("quantity_int"),
        "l_returnflag",
        round4(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
        ).alias("charge"),
        round4(F.lit(100.0) * F.col("l_discount")).alias("discount_pct"),
    )


@query(
    "q_filter_in_list",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE event_type IN ('click', 'purchase')
    """,
)
def q_filter_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pushdown IN-list filter, the contractAddresses predicate of the
    reference (LogsService.java:548-556; notebook cell 26)."""
    ev = tables.load_table(spark, sf_dir, "events")
    return ev.where(F.col("event_type").isin("click", "purchase")).select(
        "event_id", "user_id", "event_type", "value"
    )


@query(
    "q_filter_case_insensitive",
    oracle="""
    SELECT event_id, event_type
    FROM events
    WHERE lower(event_type) IN ('click', 'signup')
    """,
    declared=False,
)
def q_filter_case_insensitive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive IN-list: the reference matches addresses with
    equalsIgnoreCase (LogSubscription.java:43-45). The request side is
    lowered too, so mixed-case needles match. Undeclared since r7
    (ceded to the behavior-analytics rotation; A9 stays attested by
    this oracle-parity-run query + the q_filter_in_list family)."""
    ev = tables.load_table(spark, sf_dir, "events")
    needles = ["CLICK", "Signup"]  # deliberately mixed-case
    return ev.where(
        F.lower(F.col("event_type")).isin([n.lower() for n in needles])
    ).select("event_id", "event_type")


@query(
    "q_topic0_filter",
    oracle="""
    SELECT doc_id, string_split(text, ' ')[1] AS topic0
    FROM documents
    WHERE string_split(text, ' ')[1] IN ('key', 'batch', 'spark')
       OR len(string_split(text, ' ')) = 0
    """,
)
def q_topic0_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The topic0 quirk (LogSubscription.java:40-42): ONLY the first
    array element is tested against the filter set, and rows whose
    array is empty pass regardless. Reproduced exactly — including the
    empty-array escape hatch — on split(text) as the topics stand-in."""
    docs = tables.load_table(spark, sf_dir, "documents")
    tokens = F.split(F.col("text"), " ")
    topic0 = F.try_element_at(tokens, F.lit(1))
    return docs.where(
        topic0.isin("key", "batch", "spark") | (F.size(tokens) == 0)
    ).select("doc_id", topic0.alias("topic0"))


@query(
    "q_blocks_scan",
    declared=False,  # r12 rotation: ceded its slot to q_span_ingest;
    # A2 stays driver-attested by the live-source pytest suite
    # (tests/test_ethereum_rpc_source.py) and this query remains
    # oracle-parity-run in tests/test_oracle_parity.py (declared r1-r11)
    oracle="""
    SELECT CAST(b AS BIGINT)                          AS number,
           printf('0xblk%08d', b)                     AS hash,
           printf('0xminer%02d', b % 5)               AS miner,
           CAST((b * 1337) % 30000000 AS BIGINT)      AS gas_used,
           CAST(30000000 AS BIGINT)                   AS gas_limit,
           floor((((b * 1337) % 30000000) / 30000000.0 * 100)
                 * 10000 + 0.5) / 10000               AS gas_util,
           CAST(1600000000 + b * 12 AS BIGINT)        AS ts_sec,
           CAST(2 AS BIGINT)                          AS tx_count
    FROM range(50, 150) t(b)
    """,
)
def q_blocks_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded blocks request through the LIVE point-lookup source
    (A2/A10: BlocksService.java:137-154 pages getBlockByNumber over
    the range; blocks are never row-filtered beyond it,
    BlockSubscription.java:36-38), plus the notebook's blocks
    analytics on top: gas utilization arithmetic (cell 18) and
    transaction count via array length (cell 20). The mock transport
    emits the real node's response shape (quantities as hex strings),
    so this also oracle-checks the hex->int64 Converter path
    (Converter.java:81-107); the DuckDB twin rebuilds the deterministic
    mock formulas from range(). sf_dir is unused by design — the query
    verifies live-source plumbing, not parquet."""
    from ..sources.ethereum_rpc import EthereumBlocksDataSource

    spark.dataSource.register(EthereumBlocksDataSource)
    blocks = (
        spark.read.format("ethereum_blocks")
        .option("startBlock", 50).option("endBlock", 149)
        .option("transport", "mock").option("maxBlockRange", 20)
        .load()
    )
    return blocks.select(
        "number",
        "hash",
        "miner",
        F.col("gasUsed").alias("gas_used"),
        F.col("gasLimit").alias("gas_limit"),
        round4(F.col("gasUsed") / F.col("gasLimit") * 100).alias("gas_util"),
        F.col("timestamp").alias("ts_sec"),
        F.size("transactions").cast("long").alias("tx_count"),
    )


@query(
    "q_batch_partition",
    oracle="""
    SELECT CAST(event_id // 500 AS BIGINT) AS page,
           CAST(count(*) AS BIGINT)        AS n_rows,
           min(event_id)                   AS first_id,
           max(event_id)                   AS last_id
    FROM events
    GROUP BY 1
    """,
    # ceded from the declared window in r5 (A12 paging is also attested
    # by the live-source partition tests); still oracle-checked by
    # tests/test_oracle_parity.py's whole-registry parametrize
    declared=False,
)
def q_batch_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunked pagination: inclusive fixed-size pages, the reference's
    maxBlockRange paging loop (LogsService.java:509-521, page size 500
    per FlightRpcServer.java:60) re-expressed as a bucketed aggregate."""
    ev = tables.load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.expr("event_id div 500").alias("page"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min("event_id").alias("first_id"),
            F.max("event_id").alias("last_id"),
        )
    )
