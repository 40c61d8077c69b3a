"""A15 object-store write path: the s3a committer recipe (no object store
in this sandbox — assert the recipe and its application, the same way the
reference's s3 tests mock the uploader; parity: iceberg/writer/s3.go).
"""

from pyspark.sql import SparkSession

from philotes_spark.sources.object_store import (
    S3A_COMMITTER_CONF,
    apply_s3a_committer,
    validate_s3a_committer,
)


def test_recipe_covers_the_unsafe_defaults():
    # the three failure classes: rename-based commit, non-magic committer,
    # undersized multipart
    assert "spark.hadoop.fs.s3a.committer.name" in S3A_COMMITTER_CONF
    assert S3A_COMMITTER_CONF["spark.hadoop.fs.s3a.committer.name"] == "magic"
    assert (
        S3A_COMMITTER_CONF["spark.hadoop.fs.s3a.multipart.size"] == "134217728"
    )  # 128 MB, reference parquet.go:84 row-group target
    assert "PathOutputCommitProtocol" in S3A_COMMITTER_CONF[
        "spark.sql.sources.commitProtocolClass"
    ]


def test_apply_chains_on_builder():
    b = apply_s3a_committer(SparkSession.builder)
    # builder accumulates into its options dict
    opts = b._options
    for k, v in S3A_COMMITTER_CONF.items():
        assert opts.get(k) == v


def test_validate_reports_missing_keys(spark):
    missing = validate_s3a_committer(spark)
    # the local test session is NOT s3-configured: every key reports
    assert set(missing) == set(S3A_COMMITTER_CONF)
