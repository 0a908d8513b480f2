"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs a registered Spark query and its oracle SQL side by side on the
same parquet directory, then compares row count, column names, and
(order-insensitively) every value. Used by tests so a driver-gate
failure is caught before the round's verify runs.
"""

from __future__ import annotations

import math

import duckdb

from hive_clone_spark.catalog import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql)


def _norm(v) -> str:
    """Normalize a cell to a canonical string (so mixed None/str/num rows
    stay sortable and engine-specific types collapse)."""
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return f"bool:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / 0.0 and format with enough digits to be exact
        return repr(v + 0.0)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    return str(v)


def compare(spark_df, oracle_sql: str, sf_dir: str, float_tol: float = 0.0):
    """Return (ok, message). float_tol=0 demands exact value equality —
    the same bar the driver's value-hash imposes."""
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = spark_df.columns

    res = run_oracle(oracle_sql, sf_dir)
    duck_cols = [d[0] for d in res.description]
    duck_rows = [tuple(r) for r in res.fetchall()]

    if sorted(spark_cols) != sorted(duck_cols):
        return False, f"schema mismatch: spark={spark_cols} duck={duck_cols}"
    if len(spark_rows) != len(duck_rows):
        return False, f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"

    # Sort columns by name (the driver's convention), then rows.
    s_order = [spark_cols.index(c) for c in sorted(spark_cols)]
    d_order = [duck_cols.index(c) for c in sorted(duck_cols)]
    s_sorted = sorted(
        tuple(_norm(r[i]) for i in s_order) for r in spark_rows
    )
    d_sorted = sorted(
        tuple(_norm(r[i]) for i in d_order) for r in duck_rows
    )

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
