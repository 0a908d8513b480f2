"""Property test for the MERGE clause-cascade lowering.

test_sql_dml.py pins handpicked corners; this drives RANDOM clause
cascades (matched / not-matched-by-source x update / delete, with and
without AND conditions, insert on/off) through the txlog lowering and
checks the surviving table against a row-by-row Python reference
model of SQL MERGE semantics: per target row, first-true clause wins;
NULL conditions never fire; all SET RHS read the pre-merge row;
unmatched source rows insert only under an INSERT clause whose
condition passes — with 0-2 conditioned INSERT * clauses, where the
cascade reduces to the OR of the clause conditions (the round-10
advice fix: later insert clauses used to be silently dropped).

Round-10 history: this test's random cascade found the full-delete
crash (ValueError: txlog: empty table) that round; the falsifying
example is pinned deterministically in test_sql_dml.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hive_clone_spark.sqlapi import txlog_sql_dml
from hive_clone_spark.sources.txlog import (
    TxLog,
    _bucket_stats,
    _with_bucket,
)

M = 24  # target keys 1..M

# condition pool: expressions over the joined row the model mirrors.
# index 0 = no condition.
CONDS = [
    (None, lambda t_key, t_price, s_price: True),
    ("t.o_orderkey % 2 = 0", lambda t_key, t_price, s_price: t_key % 2 == 0),
    ("s.o_totalprice > 5.0",
     lambda t_key, t_price, s_price: s_price is not None and s_price > 5.0),
    ("t.o_totalprice < 100.0",
     lambda t_key, t_price, s_price: t_price < 100.0),
]

clause_strategy = st.tuples(
    st.sampled_from(["matched", "by_source"]),
    st.sampled_from(["update", "delete"]),
    st.integers(min_value=0, max_value=len(CONDS) - 1),
)

# insert-clause condition pool (source columns only — an unmatched
# target row has no t.* values). Index 0 = unconditioned.
INS_CONDS = [
    (None, lambda k, s_price: True),
    ("s.o_orderkey % 2 = 0", lambda k, s_price: k % 2 == 0),
    ("s.o_totalprice > 27.0", lambda k, s_price: s_price > 27.0),
]

# 0-2 WHEN NOT MATCHED [AND cond] THEN INSERT * clauses: a source row
# inserts when the FIRST not-matched clause whose condition holds is an
# INSERT — with INSERT * that reduces to the OR of the conditions
# (round-10 advice: later clauses used to be silently dropped)
insert_strategy = st.lists(
    st.integers(min_value=0, max_value=len(INS_CONDS) - 1),
    min_size=0, max_size=2,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    clauses=st.lists(clause_strategy, min_size=1, max_size=3),
    src_keys=st.sets(st.integers(min_value=1, max_value=M + 6),
                     min_size=1, max_size=10),
    ins_clauses=insert_strategy,
)
def test_merge_cascade_matches_reference_model(
    spark, tmp_path_factory, clauses, src_keys, ins_clauses
):
    # fresh log per example: keys 1..M priced key*10
    tl = TxLog(str(tmp_path_factory.mktemp("dmlprop") / "log")).create()
    df = spark.range(1, M + 1).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") * 10.0).alias("o_totalprice"),
    )
    bucketed = _with_bucket(df, M)
    tl.commit(
        "append",
        add=tl.stage_data_partitioned(bucketed, "bucket", _bucket_stats(bucketed)),
    )

    src = sorted(src_keys)
    src_price = {k: float(k) for k in src}  # source price = the key
    spark.createDataFrame(
        [(k, src_price[k]) for k in src],
        "o_orderkey BIGINT, o_totalprice DOUBLE",
    ).createOrReplaceTempView("dml_prop_src")

    stmt = (
        "MERGE INTO t USING dml_prop_src AS s ON t.o_orderkey = s.o_orderkey"
    )
    for side, kind, ci in clauses:
        cond_sql = CONDS[ci][0]
        w = "WHEN MATCHED" if side == "matched" else "WHEN NOT MATCHED BY SOURCE"
        a = (
            "UPDATE SET o_totalprice = t.o_totalprice + 1.0"
            if kind == "update"
            else "DELETE"
        )
        stmt += f" {w}{' AND ' + cond_sql if cond_sql else ''} THEN {a}"
    for ci in ins_clauses:
        cond_sql = INS_CONDS[ci][0]
        stmt += (
            f" WHEN NOT MATCHED{' AND ' + cond_sql if cond_sql else ''}"
            " THEN INSERT *"
        )
    txlog_sql_dml(spark, tl, M, stmt)

    # reference model
    expected = {}
    for k in range(1, M + 1):
        t_price = k * 10.0
        s_price = src_price.get(k)
        matched = k in src_keys
        action = ("keep", None)
        for side, kind, ci in clauses:
            applies = matched if side == "matched" else not matched
            if applies and CONDS[ci][1](k, t_price, s_price):
                action = (kind, None)
                break
        if action[0] == "update":
            expected[k] = t_price + 1.0
        elif action[0] == "keep":
            expected[k] = t_price
        # delete: absent
    for k in src:
        if k > M and any(
            INS_CONDS[ci][1](k, src_price[k]) for ci in ins_clauses
        ):
            expected[k] = src_price[k]

    got = {
        r["o_orderkey"]: r["o_totalprice"]
        for r in tl.read(spark, tl.latest_version()).collect()
    }
    assert got == expected, (stmt, sorted(set(expected) ^ set(got)))
