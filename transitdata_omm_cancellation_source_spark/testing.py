"""Local oracle-parity harness mirroring the driver's correctness gate.

Runs a Spark DataFrame and a DuckDB SQL over the same parquet tables
and compares row count, column names, and order-insensitive values —
floats with a tolerance, everything else exactly.  Used by pytest so
every registered query is verified locally before the driver ever sees
it.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from .catalog import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out.columns = [c.lower() for c in out.columns]
    out = out[sorted(out.columns)]
    if len(out) == 0:
        return out
    # stringify for a stable sort across dtypes, keep originals for compare
    key = out.astype(str).agg("\x1f".join, axis=1)
    out = out.loc[key.sort_values(kind="mergesort").index].reset_index(drop=True)
    return out


#: numpy dtype kind -> canonical family.  The driver's external hash is
#: dtype-sensitive (it serializes values), so a local pass must require
#: the same numeric family on both sides — an int64 Spark sum vs a
#: DuckDB HUGEINT/float oracle column is a real mismatch even when the
#: values print identically (the round-1 red row).
_KIND_FAMILY = {
    "i": "int", "u": "int",
    "f": "float",
    "b": "bool",
    "M": "timestamp",
    "m": "interval",
    "O": "object",
    "S": "object", "U": "object",
}


def _dtype_family(series: pd.Series) -> str:
    return _KIND_FAMILY.get(series.dtype.kind, series.dtype.kind)


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of human-readable mismatches (empty = parity)."""
    problems: list[str] = []
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    if list(a.columns) != list(b.columns):
        return [f"columns differ: spark={list(a.columns)} oracle={list(b.columns)}"]
    for col in a.columns:
        fa, fb = _dtype_family(a[col]), _dtype_family(b[col])
        if fa != fb:
            problems.append(
                f"{col}: dtype family differs: spark={a[col].dtype} ({fa})"
                f" oracle={b[col].dtype} ({fb})"
            )
    if problems:
        return problems
    if len(a) != len(b):
        return [f"row count differs: spark={len(a)} oracle={len(b)}"]
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None and y is None:
                continue
            xf = isinstance(x, float)
            yf = isinstance(y, float)
            if xf and yf and math.isnan(x) and math.isnan(y):
                continue
            if xf or yf:
                try:
                    if not math.isclose(float(x), float(y), rel_tol=1e-9, abs_tol=1e-9):
                        problems.append(f"{col}[{i}]: {x!r} != {y!r}")
                except (TypeError, ValueError):
                    problems.append(f"{col}[{i}]: {x!r} != {y!r}")
            elif str(x) != str(y):
                problems.append(f"{col}[{i}]: {x!r} != {y!r}")
            if len(problems) >= 10:
                return problems
    return problems


def assert_oracle_parity(spark_df, oracle_sql: str, sf_dir: str) -> None:
    con = duckdb_connection(sf_dir)
    try:
        oracle_pdf = con.execute(oracle_sql).df()
    finally:
        con.close()
    spark_pdf = spark_df.toPandas()
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert not problems, "oracle mismatch:\n" + "\n".join(problems)
