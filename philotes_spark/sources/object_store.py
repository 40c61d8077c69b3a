"""Object-store write path (SURVEY §2A A15) — configuration recipe.

The reference uploads parquet to S3 itself (``internal/iceberg/writer/
s3.go:74-140``: multipart upload, retry, path layout). On Spark none of
that is custom code — the Hadoop S3A connector ships with every
distribution — but writing to S3 *correctly at scale* requires a specific
committer configuration: the default FileOutputCommitter does a
sequential driver-side rename pass that is both slow (S3 rename = copy)
and unsafe (non-atomic). This module is the working recipe, applied to a
SparkSession builder or validated against a live session.

No object store exists in this sandbox, so the test surface asserts the
recipe itself (keys/values), exactly like the reference's own s3 tests
mock the uploader.
"""

from __future__ import annotations

# The magic committer writes task output directly to the destination via
# S3 multipart uploads held open until job commit — zero renames, atomic
# completion, no driver-side copy storm. (Hadoop 3.x, hadoop-aws on the
# classpath.)
S3A_COMMITTER_CONF: dict[str, str] = {
    # route all parquet/ORC committers through the S3A committer factory
    "spark.hadoop.mapreduce.outputcommitter.factory.scheme.s3a": (
        "org.apache.hadoop.fs.s3a.commit.S3ACommitterFactory"
    ),
    "spark.hadoop.fs.s3a.committer.name": "magic",
    "spark.hadoop.fs.s3a.committer.magic.enabled": "true",
    "spark.sql.sources.commitProtocolClass": (
        "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
    ),
    "spark.sql.parquet.output.committer.class": (
        "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter"
    ),
    # upload tuning in the reference's ballpark (s3.go: 128 MB parts)
    "spark.hadoop.fs.s3a.multipart.size": "134217728",
    "spark.hadoop.fs.s3a.fast.upload": "true",
    "spark.hadoop.fs.s3a.connection.maximum": "96",
    # retries live in the connector, not application code (vs retry.go)
    "spark.hadoop.fs.s3a.attempts.maximum": "3",
    "spark.hadoop.fs.s3a.retry.limit": "7",
}


def apply_s3a_committer(builder):
    """Apply the recipe to a ``SparkSession.builder`` (chainable)."""
    for k, v in S3A_COMMITTER_CONF.items():
        builder = builder.config(k, v)
    return builder


def validate_s3a_committer(spark) -> list[str]:
    """Return the recipe keys a live session is missing/mismatching —
    empty list means the session writes to s3a:// safely."""
    problems = []
    for k, v in S3A_COMMITTER_CONF.items():
        try:
            got = spark.conf.get(k)
        except Exception:
            got = None
        if got != v:
            problems.append(k)
    return problems
