"""Object-store write path (SURVEY §2A A15).

Two tiers:

1. **The Spark bulk path** — on a cluster, executors write parquet
   through the Hadoop S3A connector; the custom code is the *committer
   recipe* below (magic committer: zero-rename atomic commits), because
   the default FileOutputCommitter's driver-side rename pass is slow and
   non-atomic on S3.
2. **The control-plane path** — manifest/metadata files and
   snapshot-publish uploads go through the stdlib SigV4 client
   (:mod:`philotes_spark.sources.s3_client`, the working equivalent of
   the reference's MinIO wrapper ``internal/iceberg/writer/s3.go:74-140``)
   — exercised for real in tests against a local mock S3 server.
   :func:`upload_snapshot_to_s3` mirrors the reference's
   upload-then-commit-with-rollback flow (``writer.go:126-180``).
"""

from __future__ import annotations

import os

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


def upload_snapshot_to_s3(
    s3,
    bucket: str,
    snap,
    prefix: str = "data",
    version: int | None = None,
    catalog=None,
    namespace: str | None = None,
    table: str | None = None,
) -> list[str]:
    """Upload one SnapshotTable version's newly-added parquet files to
    the object store, then (optionally) commit them to an Iceberg REST
    catalog — deleting every uploaded object if the commit fails, the
    reference's rollback (``writer.go:166-173``). Returns the uploaded
    keys."""
    import pyarrow.parquet as pq

    manifest = snap._resolve(version=version)
    parent: set[str] = set()
    if manifest["version"] > 1:
        parent = set(snap._resolve(version=manifest["version"] - 1)["files"])
    new_files = [f for f in manifest["files"] if f not in parent]

    s3.ensure_bucket(bucket)
    uploaded: list[str] = []
    try:
        for f in new_files:
            rel = os.path.relpath(f, snap.data_dir)
            key = f"{prefix}/v{manifest['version']:08d}/{rel}"
            with open(f, "rb") as fh:
                s3.put_object(bucket, key, fh.read(), "application/octet-stream")
            uploaded.append(key)
        if catalog is not None:
            data_files = [
                {
                    "content": "data",
                    "file-path": s3.object_url(bucket, key),
                    "file-format": "parquet",
                    "record-count": pq.ParquetFile(f).metadata.num_rows,
                    "file-size-in-bytes": os.path.getsize(f),
                }
                for key, f in zip(uploaded, new_files)
            ]
            catalog.create_table(
                namespace,
                table,
                snap.read(version=version).schema,
                partition_by=manifest.get("partition_by"),
            )
            if data_files:
                catalog.commit_append(namespace, table, data_files)
    except Exception:
        for key in uploaded:  # roll back orphaned uploads
            try:
                s3.delete_object(bucket, key)
            except Exception:
                pass
        raise
    return uploaded
