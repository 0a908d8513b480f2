"""Keyed stateful processing (M4): the reference's per-key EMA
animation state (S1, ui_app.cpp:242-299 — alpha 0.2/frame smoothing
with eviction) generalized to a per-user event-value EMA.

Two forms:
  * `p_ema` (registered): batch applyInPandas per user, ordered by
    event time — DuckDB-oracle-checked via a recursive CTE that walks
    the same sequence with the same double arithmetic.
  * `ema_stream` : the Structured Streaming form with
    applyInPandasWithState (per-key mutable state + timeout eviction),
    exercised by the streaming tests on a file stream.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_clone_spark.catalog import table
from hive_clone_spark.registry import register

ALPHA = 0.2  # reference smoothing rate (ui_app.cpp:15)

EMA_SCHEMA = "user_id BIGINT, seq BIGINT, ema DOUBLE"


@register(
    "p_ema",
    oracle=f"""
    WITH RECURSIVE ev AS (
      SELECT user_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events),
    ema(user_id, rn, ema) AS (
      SELECT user_id, rn, value FROM ev WHERE rn = 1
      UNION ALL
      SELECT e.user_id, e.rn, {ALPHA} * e.value + {1 - ALPHA} * m.ema
      FROM ema m JOIN ev e ON e.user_id = m.user_id AND e.rn = m.rn + 1)
    SELECT user_id, CAST(rn AS BIGINT) AS seq, ROUND(ema, 6) AS ema
    FROM ema ORDER BY user_id, seq
    """,
)
def p_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EMA of `value` over event-time order.

    Scale shape: groupBy().applyInPandas pays a JVM↔Python round trip
    PER GROUP (~4 ms each — 1500 users cost ~6 s at sf0.1), so this
    uses mapInPandas over user-partitioned, user-then-time-sorted rows:
    one Python crossing per Arrow batch, per-user ewm inside, and a
    carry dict for users whose rows straddle a batch boundary. pandas
    ewm(adjust=False) computes y_t = a*x_t + (1-a)*y_{t-1}, y_0 = x_0 —
    bit-identical to the oracle's recursive CTE."""
    from collections.abc import Iterator

    e = table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    part = e.repartition("user_id").sortWithinPartitions("user_id", "ts", "event_id")

    def ema_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        alpha = 0.2  # self-contained closure (workers lack repo sys.path)
        carry: dict = {}  # user_id -> (n_seen, last unrounded ema)
        for pdf in batches:
            outs = []
            for uid, grp in pdf.groupby("user_id", sort=False):
                vals = grp["value"].astype("float64").reset_index(drop=True)
                n0, e0 = carry.get(uid, (0, None))
                if e0 is None:
                    ema = vals.ewm(alpha=alpha, adjust=False).mean()
                else:
                    # seed continuation: y_0 = carried ema, then drop it
                    seeded = pd.concat([pd.Series([e0]), vals], ignore_index=True)
                    ema = (
                        seeded.ewm(alpha=alpha, adjust=False)
                        .mean()
                        .iloc[1:]
                        .reset_index(drop=True)
                    )
                carry[uid] = (n0 + len(vals), float(ema.iloc[-1]))
                outs.append(
                    pd.DataFrame(
                        {
                            "user_id": uid,
                            "seq": range(n0 + 1, n0 + len(vals) + 1),
                            "ema": ema.round(6).to_numpy(),
                        }
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return part.mapInPandas(ema_batches, EMA_SCHEMA).orderBy("user_id", "seq")


# ---------------------------------------------------------------------------
# Structured Streaming form: applyInPandasWithState with per-key float
# state and processing-time timeout eviction (the reference's fade-out +
# evict-below-0.02, ui_app.cpp:254-263, maps to state timeout/removal).
# ---------------------------------------------------------------------------
STREAM_OUT_SCHEMA = "user_id BIGINT, n_seen BIGINT, ema DOUBLE"
STREAM_STATE_SCHEMA = "n_seen BIGINT, ema DOUBLE"


def ema_stream(events_stream: DataFrame) -> DataFrame:
    """events stream (user_id, ts, event_id, value) → running per-user
    EMA emitted on every micro-batch."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    import pandas as pd

    def update(
        key: tuple, batches: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        (user_id,) = key
        n_seen, ema = state.get if state.exists else (0, None)
        # a group's rows can arrive split across several Arrow batches
        # in arbitrary relative order — concat THEN sort, or the fold
        # order (and therefore the EMA) depends on batch boundaries
        pdf = pd.concat(list(batches)).sort_values(["ts", "event_id"])
        for v in pdf["value"]:
            v = float(v)
            ema = v if ema is None else ALPHA * v + (1 - ALPHA) * ema
            n_seen += 1
        state.update((n_seen, float(ema)))
        yield pd.DataFrame({"user_id": [user_id], "n_seen": [n_seen], "ema": [ema]})

    return events_stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=STREAM_OUT_SCHEMA,
        stateStructType=STREAM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
