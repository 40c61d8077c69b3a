"""The big gate: every registered query with an oracle must hash-match
DuckDB on the same fixtures (mirrors the driver's CORRECTNESS harness);
oracle-less queries must at least run and return a stable schema.
"""

import pytest

from philotes_spark import registry
from tests.oracle import compare

registry.load_all()

WITH_ORACLE = sorted(registry.ORACLES)
ROWS_ONLY = sorted(set(registry.QUERIES) - set(registry.ORACLES))


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(spark, duck, sf_dir, name):
    ok, msg = compare(
        spark, duck, registry.QUERIES[name], registry.ORACLES[name], sf_dir
    )
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    rows = df.collect()
    assert df.columns, "schema must be non-empty"
    assert rows is not None
