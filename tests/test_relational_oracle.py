"""Driver-gate replica: every registered query must match its DuckDB
oracle exactly (row count + schema + order-insensitive values) at the
test scale factor."""

from __future__ import annotations

import pytest

from hive_clone_spark import registry

registry.load_all_modules()

NAMES = sorted(registry.QUERIES)


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, sf_dir, name):
    from tests.oracle_utils import compare

    fn = registry.QUERIES[name]
    df = fn(spark, sf_dir)
    assert df is not None
    if name not in registry.ORACLE:
        # rows-only check (driver's weaker gate for non-SQL-expressible ops)
        assert df.count() >= 0
        return
    ok, msg = compare(df, registry.ORACLE[name], sf_dir)
    assert ok, f"{name}: {msg}"
