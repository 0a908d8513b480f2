"""As-of (point-in-time) join — the canonical custom operator Spark
lacks as a built-in (SURVEY.md §2 custom-op slot; DuckDB/kdb/Flink
all ship it natively for exactly this workload).

Semantics: for each left row, the single right row with the greatest
timestamp <= the left timestamp within the same key — here, for every
click, the same user's most recent prior (or simultaneous) view.

Implementation is the SCALE idiom, not the naive one: tag both sides,
UNION them, and run ONE merge-scan window per key (last non-null
carry-forward over (ts, side) order), then keep only left-side rows.
Cost: a single hash shuffle on the key + one sorted scan — the same
shape as a sort-merge join. The naive alternative (range join + argmax)
explodes to |clicks|x|views| pairs per user before pruning; at 100 TB
of events that quadratic blowup is the difference between a job that
finishes and one that doesn't. Ties are deterministic: views dedup to
one row per (user, ts) keeping the max event_id, and at equal ts the
view row sorts BEFORE the click (side 0 < 1), matching the oracle's
`v.ts <= c.ts` ASOF bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hive_clone_spark.catalog import table
from hive_clone_spark.registry import register


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Generic as-of join: left rows + `r_<col>` columns of the most
    recent right row with right_ts <= left_ts per `on` key (NULL when
    none). Right side must be unique per (on, right_ts).

    The matched right row is carried as ONE struct (non-null on every
    right row, even when individual payload fields are null), so the
    output's r_* columns always come from the same right row — a
    per-column last(ignorenulls) carry would otherwise composite a
    null-payload row's timestamp with an older row's payload.
    """
    r_cols = [c for c in right.columns if c not in (on, right_ts)]
    reserved = {f"r_{right_ts}", *(f"r_{c}" for c in r_cols)}
    for c in left.columns:
        if c.startswith("__") or c in reserved:
            raise ValueError(
                f"asof_join: left column {c!r} collides with the reserved "
                f"__* / r_* output namespace (outputs: {sorted(reserved)})"
            )
    for c in right.columns:
        if c.startswith("__"):
            raise ValueError(
                f"asof_join: right column {c!r} collides with the reserved "
                "__* internal namespace"
            )
    r_row = F.struct(
        F.col(right_ts).alias(right_ts), *[F.col(c).alias(c) for c in r_cols]
    )
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        r_row.alias("__r_row"),
    )
    l = left.select(
        F.col(on),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left.columns if c != on],
    )
    # unionByName fills the sides' missing columns (left's __r_row, right's
    # left-payload columns) with typed NULLs — no manual cast needed.
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("__carry", F.last("__r_row", ignorenulls=True).over(w))
    return carried.where(F.col("__side") == 1).select(
        on,
        left_ts,
        *[c for c in left.columns if c not in (on, left_ts)],
        F.col("__carry").getField(right_ts).alias(f"r_{right_ts}"),
        *[F.col("__carry").getField(c).alias(f"r_{c}") for c in r_cols],
    )


@register(
    "q61_asof_join",
    oracle="""
    WITH v AS (
      SELECT user_id, ts, MAX(event_id) AS view_id
      FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
    c AS (
      SELECT event_id AS click_id, user_id, ts
      FROM events WHERE event_type = 'click')
    SELECT c.click_id, c.user_id,
      strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
      v.view_id,
      epoch_us(c.ts) - epoch_us(v.ts) AS gap_us
    FROM c ASOF LEFT JOIN v
      ON c.user_id = v.user_id AND v.ts <= c.ts
    ORDER BY click_id
    """,
)
def q61_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    views = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_id"))
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    joined = asof_join(clicks, views, on="user_id")
    return joined.select(
        "click_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.col("r_view_id").alias("view_id"),
        (F.unix_micros("ts") - F.unix_micros("r_ts")).alias("gap_us"),
    ).orderBy("click_id")


# ---------------------------------------------------------------------------
# Q132 — as-of join with a TOLERANCE bound (pandas merge_asof's
# `tolerance`, kdb's windowed join): the most recent prior view counts
# only if it happened within the last hour; staler matches become
# NULL. This is the semantically-honest form for attribution windows —
# an unbounded as-of silently credits a week-old view.
#
# Composition, not reimplementation: the same single-shuffle
# merge-scan asof_join runs first, then the bound is a row-local
# CASE on the carried gap — zero extra shuffles, so the tolerance
# costs nothing at any scale. matched=FALSE rows keep the left side
# (it's a LEFT join); every column nulls together because the carry is
# one struct.
# ---------------------------------------------------------------------------
_ASOF_TOL_US = 3_600_000_000  # 1 hour


@register(
    "q132_asof_tolerance_join",
    oracle=f"""
    WITH v AS (
      SELECT user_id, ts, MAX(event_id) AS view_id
      FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
    c AS (
      SELECT event_id AS click_id, user_id, ts
      FROM events WHERE event_type = 'click'),
    j AS (
      SELECT c.click_id, c.user_id, c.ts AS cts, v.view_id,
        epoch_us(c.ts) - epoch_us(v.ts) AS gap_us
      FROM c ASOF LEFT JOIN v
        ON c.user_id = v.user_id AND v.ts <= c.ts)
    SELECT click_id, user_id,
      strftime(cts, '%Y-%m-%d %H:%M:%S') AS click_ts,
      CASE WHEN gap_us <= {_ASOF_TOL_US} THEN view_id END AS view_id,
      CASE WHEN gap_us <= {_ASOF_TOL_US} THEN gap_us END AS gap_us,
      COALESCE(gap_us <= {_ASOF_TOL_US}, FALSE) AS matched
    FROM j ORDER BY click_id
    """,
)
def q132_asof_tolerance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    views = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_id"))
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    joined = asof_join(clicks, views, on="user_id")
    gap = F.unix_micros("ts") - F.unix_micros("r_ts")
    in_tol = gap <= F.lit(_ASOF_TOL_US)
    return joined.select(
        "click_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.when(in_tol, F.col("r_view_id")).alias("view_id"),
        F.when(in_tol, gap).alias("gap_us"),
        F.coalesce(in_tol, F.lit(False)).alias("matched"),
    ).orderBy("click_id")
