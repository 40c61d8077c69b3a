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


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_backed_nonempty(spark, sf_dir, name):
    """r16 (VERDICT r15 next-round #6): EVERY oracle-backed query must
    return rows at the pytest SF, asserted explicitly and independently
    of compare()'s vacuous-pass guard — so a refactor of the compare
    plumbing (or a future rotation graduating a query that recently
    became vacuous) trips THIS test, not just the guard inside the
    harness. No ``allow_empty`` exemptions exist today; any future one
    must be excluded here with its reason inline. Cheap: the prepared-
    query cache means the plan was already built by test_oracle_match,
    and take(1) stops at the first row."""
    df = registry.QUERIES[name](spark, sf_dir)
    assert df.take(1), f"{name}: vacuous (0 rows) at {sf_dir}"


def test_compare_refuses_vacuous_pass(spark, duck, sf_dir):
    """The harness-side guard itself (r15): a compare where BOTH sides
    return 0 rows must refuse, not hash-match trivially."""

    def empty_q(s, _sf):
        return s.range(0).selectExpr("id AS x")

    ok, msg = compare(spark, duck, empty_q, "SELECT 1 AS x WHERE 1=0", sf_dir)
    assert not ok and "vacuous" in msg
