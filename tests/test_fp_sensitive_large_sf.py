"""FP-reassociation pins at the SFs the driver never checks (VERDICT r16
"what's wrong" #5): q7's rejected r16 restructure flipped a one-cent
ROUND only at sf1, and q10's r16 restructure carries the same shape
(ROUND after a reassociated double sum). The driver window stops at
sf0.1, so a flip at sf0.3/sf1 would ship silently — these tests compare
the FP-carrying queries directly against the DuckDB oracle on the scaled
fixtures (tools/make_scaled_fixtures.py, gitignored; skipped when
absent).
"""

import os

import pytest

from philotes_spark import registry
from tests.oracle import compare

registry.load_all()

_FIXTURES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".fixtures"
)
_SFS = [
    d for d in ("sf0.3", "sf1") if os.path.isdir(os.path.join(_FIXTURES, d))
]

# the queries whose r16 restructures reassociated double sums under a
# final ROUND — exactly the shape that flipped q7 at sf1
FP_SENSITIVE = ["q10_returned_items", "q7_volume_shipping"]


@pytest.mark.slow
@pytest.mark.skipif(not _SFS, reason="scaled fixtures not generated")
@pytest.mark.parametrize("sf", _SFS)
@pytest.mark.parametrize("name", FP_SENSITIVE)
def test_fp_sensitive_oracle_at_large_sf(spark, sf, name):
    import duckdb

    from philotes_spark.sources.catalog import TABLES

    sf_dir = os.path.join(_FIXTURES, sf)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    try:
        ok, msg = compare(
            spark, con, registry.QUERIES[name], registry.ORACLES[name], sf_dir
        )
        assert ok, f"{name} at {sf}: {msg}"
    finally:
        con.close()
