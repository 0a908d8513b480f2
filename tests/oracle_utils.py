"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs a registered Spark query and its oracle SQL side by side on the
same parquet directory, then compares row count, column names, and
(order-insensitively) every value. Used by tests so a driver-gate
failure is caught before the round's verify runs.

The comparison goes through the PANDAS materialization path
(``toPandas()`` / ``fetchdf()``) because that is the path the driver
hashes: round 1's q50 failure was DuckDB's windowed SUM(BIGINT)
returning HUGEINT, which pandas materializes as float64 (``123.0``)
against Spark's int64 (``123``) — invisible to ``fetchall()`` (both
sides yield Python ints) but a driver hash mismatch. Cell
canonicalization here is deliberately dtype-sensitive: ints render
``123``, floats ``123.0``.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

from hive_clone_spark.catalog import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql)


def _norm(v) -> str:
    """Normalize a pandas/numpy cell to a canonical string. Deliberately
    dtype-sensitive for int-vs-float (``123`` vs ``123.0``) — the class
    of mismatch the driver's pandas value-hash sees and ``fetchall()``
    hides — while collapsing engine-specific widths (int32/int64,
    numpy vs Python scalars)."""
    if v is None:
        return "\x00NULL"
    if isinstance(v, (bool, np.bool_)):
        return f"bool:{bool(v)}"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "\x00NULL"  # pandas renders SQL NULL in numeric cols as NaN
        # collapse -0.0 / 0.0 and format with enough digits to be exact
        return repr(f + 0.0)
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    try:
        if pd.isna(v):  # NaT / pd.NA
            return "\x00NULL"
    except (TypeError, ValueError):
        pass
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    return str(v)


def _canon_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    """Driver-style canonicalization: columns sorted by name, every cell
    normalized, rows sorted."""
    df = df.reindex(sorted(df.columns), axis=1)
    return sorted(
        tuple(_norm(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    )


def compare(spark_df, oracle_sql: str, sf_dir: str, float_tol: float = 0.0):
    """Return (ok, message). float_tol=0 demands exact value equality —
    the same bar the driver's value-hash imposes."""
    s_pd = spark_df.toPandas()
    spark_cols = list(s_pd.columns)

    res = run_oracle(oracle_sql, sf_dir)
    d_pd = res.fetchdf()
    duck_cols = list(d_pd.columns)

    if sorted(spark_cols) != sorted(duck_cols):
        return False, f"schema mismatch: spark={spark_cols} duck={duck_cols}"
    if len(s_pd) != len(d_pd):
        return False, f"row count mismatch: spark={len(s_pd)} duck={len(d_pd)}"

    s_sorted = _canon_rows(s_pd)
    d_sorted = _canon_rows(d_pd)

    if float_tol == 0.0:
        if s_sorted != d_sorted:
            diffs = [
                (a, b) for a, b in zip(s_sorted, d_sorted) if a != b
            ][:5]
            return False, f"value mismatch; first diffs: {diffs}"
        return True, "ok"

    for a, b in zip(s_sorted, d_sorted):
        for x, y in zip(a, b):
            if isinstance(x, str) and isinstance(y, str) and x != y:
                try:
                    fx, fy = float(x), float(y)
                    if abs(fx - fy) > float_tol * max(1.0, abs(fy)):
                        return False, f"float diff {x} vs {y}"
                    continue
                except ValueError:
                    pass
            if x != y:
                return False, f"value diff {x!r} vs {y!r} in rows {a} vs {b}"
    return True, "ok"
