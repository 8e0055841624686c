"""Local mirror of the driver's DuckDB-oracle differential check.

Stricter than the driver: values must match exactly after dtype normalization
(no tolerance), so anything that passes here should hash-match in
CORRECTNESS_r{N}.json regardless of how the driver normalizes.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math

import duckdb
import pandas as pd

from trafficanalysisbigdata_spark.io import TABLES, table_path

_SENTINEL = "<NULL>"


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return _SENTINEL
    if isinstance(v, float):
        if math.isnan(v):
            return _SENTINEL
        return repr(v)  # full precision — bit-identical floats required
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if pd.isna(v):
        return _SENTINEL
    return str(v)


def canonical_rows(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in pdf[cols].itertuples(index=False)]
    return sorted(rows)


def compare(name: str, spark_df, duck_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    spark_pdf = spark_df.toPandas()
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(
            f"{name}: columns differ spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"{name}: row count spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s_rows, d_rows = canonical_rows(spark_pdf), canonical_rows(duck_pdf)
    if s_rows != d_rows:
        diff_at = next(
            (i for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b),
            min(len(s_rows), len(d_rows)),
        )
        problems.append(
            f"{name}: values differ at sorted-row {diff_at}:\n"
            f"  spark={s_rows[diff_at] if diff_at < len(s_rows) else '<missing>'}\n"
            f"  duck ={d_rows[diff_at] if diff_at < len(d_rows) else '<missing>'}"
        )
    return problems
