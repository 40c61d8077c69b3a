"""Control-plane (A32-A35) and maintenance (A7) tests: pipeline CRUD +
lifecycle through a real file-fed ingest run, catalog browsing over
registered fixture views, partition retention, and small-file compaction.
"""

import datetime as dt
import os

import pytest

from philotes_spark.control import (
    PipelineRegistry,
    PipelineSpec,
    describe_table,
    list_schemas,
    list_tables,
    validate_identifier,
)
from philotes_spark.sources.writer import (
    compact_partition,
    expire_partitions,
    read_lake_table,
    write_cdc_batch,
)
from philotes_spark.streaming.ingest import IngestConfig
from philotes_spark.types import CDC_EVENT_SCHEMA

T0 = dt.datetime(2024, 3, 1, 12, 0, 0)


def test_validate_identifier():
    assert validate_identifier("users_v2") == "users_v2"
    for bad in ("1abc", "a-b", "a.b", "", "x; DROP TABLE"):
        with pytest.raises(ValueError):
            validate_identifier(bad)


def _config(tmp_path):
    return IngestConfig(
        source_dir=str(tmp_path / "feed"),
        lake_dir=str(tmp_path / "lake"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        dlq_dir=str(tmp_path / "dlq"),
    )


def test_pipeline_crud_and_lifecycle(spark, tmp_path):
    reg = PipelineRegistry(spark)
    spec = PipelineSpec(name="pg_main", config=_config(tmp_path))
    reg.create(spec)
    assert reg.list() == ["pg_main"]
    with pytest.raises(ValueError):
        reg.create(PipelineSpec(name="pg_main", config=_config(tmp_path)))
    with pytest.raises(ValueError):
        reg.create(PipelineSpec(name="bad-name", config=_config(tmp_path)))

    reg.add_mapping("pg_main", "public.users")
    reg.add_mapping("pg_main", "public.orders")
    reg.remove_mapping("pg_main", "public.orders")
    assert reg.get("pg_main").table_mappings == ["public.users"]

    # lifecycle against a real (empty-feed) streaming run
    ev = spark.createDataFrame(
        [("e1", "0/1", 1, T0, "public", "users", "INSERT", None, '{"id":1}', ["id"], {})],
        CDC_EVENT_SCHEMA,
    )
    ev.coalesce(1).write.parquet(reg.get("pg_main").config.source_dir)
    pipe = reg.start("pg_main", available_now=True)
    pipe.query.awaitTermination(120)
    assert reg.status("pg_main")["state"] == "running"
    with pytest.raises(RuntimeError):
        reg.start("pg_main")
    reg.stop("pg_main")
    assert reg.status("pg_main")["state"] == "stopped"
    assert (
        read_lake_table(spark, os.path.join(reg.get("pg_main").config.lake_dir, "public.users")).count()
        == 1
    )
    reg.delete("pg_main")
    assert reg.list() == []


def test_catalog_browsing(spark, sf_dir):
    from philotes_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    assert "default" in list_schemas(spark)
    tables = list_tables(spark)
    for t in ("lineitem", "orders", "events", "documents"):
        assert t in tables
    desc = {r.col_name: r.data_type for r in describe_table(spark, "lineitem").collect()}
    assert desc["l_orderkey"] == "bigint"
    with pytest.raises(ValueError):
        describe_table(spark, "lineitem; DROP")


def _lake(spark, tmp_path, days=(1, 2, 10)):
    path = str(tmp_path / "t")
    rows = [
        (f"e{d}-{i}", dt.datetime(2024, 3, d, 8, 0), "INSERT", f"0/{d}{i}")
        for d in days
        for i in range(3)
    ]
    df = spark.createDataFrame(
        rows, "id string, _cdc_timestamp timestamp, _cdc_operation string, _cdc_lsn string"
    )
    write_cdc_batch(df, path)
    return path


def test_expire_partitions(spark, tmp_path):
    path = _lake(spark, tmp_path)
    dropped = expire_partitions(path, dt.date(2024, 3, 5))
    assert dropped == ["_cdc_date=2024-03-01", "_cdc_date=2024-03-02"]
    remaining = read_lake_table(spark, path)
    assert remaining.count() == 3
    assert {str(r._cdc_date) for r in remaining.select("_cdc_date").collect()} == {
        "2024-03-10"
    }


def test_compact_partition(spark, tmp_path):
    path = str(tmp_path / "t")
    # simulate many micro-batch appends → many small files in one partition
    for i in range(5):
        df = spark.createDataFrame(
            [(f"e{i}", dt.datetime(2024, 3, 1, 8, i), "INSERT", f"0/{i}")],
            "id string, _cdc_timestamp timestamp, _cdc_operation string, _cdc_lsn string",
        )
        write_cdc_batch(df, path)
    part = os.path.join(path, "_cdc_date=2024-03-01")
    files_before = [f for f in os.listdir(part) if f.endswith(".parquet")]
    assert len(files_before) >= 5
    n = compact_partition(spark, path, "2024-03-01", target_files=1)
    assert n == len(files_before)
    files_after = [f for f in os.listdir(part) if f.endswith(".parquet")]
    assert len(files_after) == 1
    out = read_lake_table(spark, path)
    assert out.count() == 5, "compaction must preserve every row"
    assert sorted(r.id for r in out.select("id").collect()) == [f"e{i}" for i in range(5)]
