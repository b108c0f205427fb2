"""Local replica of the driver's DuckDB-oracle comparison.

For each declared query: run the Spark plan and the oracle SQL on the
same parquet tables, then compare row count, sorted column names, and
an order-insensitive multiset of normalized row values (floats rounded,
timestamps to naive µs, arrays to tuples).
"""

from __future__ import annotations

import math
from datetime import datetime

import duckdb
import numpy as np
import pandas as pd

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return round(f, 6)
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, (np.bool_, bool)):
        return bool(v)
    if isinstance(v, pd.Timestamp):
        return v.tz_localize(None).floor("us").isoformat() if v.tzinfo else v.floor("us").isoformat()
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, pd.Interval):
        return str(v)
    if v is pd.NaT:
        return None
    return v


def normalize(pdf: pd.DataFrame) -> tuple[tuple, ...]:
    pdf = pdf[sorted(pdf.columns)]
    rows = []
    for row in pdf.itertuples(index=False, name=None):
        rows.append(tuple(_norm_cell(v) for v in row))
    return tuple(sorted(rows, key=repr))


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == parity)."""
    problems: list[str] = []
    spark_pdf = spark_df.toPandas()
    oracle_pdf = con.execute(sql).df()
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        problems.append(f"columns: spark={s_cols} oracle={o_cols}")
        return problems
    s_rows, o_rows = normalize(spark_pdf), normalize(oracle_pdf)
    if s_rows != o_rows:
        diff_s = [r for r in s_rows if r not in set(o_rows)][:3]
        diff_o = [r for r in o_rows if r not in set(s_rows)][:3]
        problems.append(
            f"values differ; spark-only sample={diff_s} oracle-only sample={diff_o}"
        )
    return problems
