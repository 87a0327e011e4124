"""Connector interface tests (SURVEY.md §2.1 note): the Cassandra/Solr
drop-ins must build the real format wiring when asked and run correctly on
the parquet emulation here (no connector jars in this container)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from trireme_spark.sources.connectors import (
    CASSANDRA_FORMAT,
    CassandraSource,
    SolrSink,
)


def test_cassandra_source_emulated_read(spark):
    src = CassandraSource(
        keyspace="tpch",
        table="customer",
        emulate_path=f"{SF_SMOKE}/customer.parquet",
        partition_cols=("c_nationkey",),
    )
    df = src.read(spark)
    assert df.count() > 0
    assert "c_custkey" in df.columns


def test_cassandra_source_without_jar_and_path_raises(spark):
    src = CassandraSource(keyspace="tpch", table="orders")
    with pytest.raises(FileNotFoundError):
        src.read(spark)


def test_cassandra_real_path_uses_connector_format(spark):
    """The non-emulated reader must target the documented format string —
    building the reader fails only at load() (jar absent), so the wiring
    itself is checkable."""
    src = CassandraSource(keyspace="tpch", table="orders")
    with pytest.raises(Exception) as exc:
        src.read(spark, emulate=False)
    assert CASSANDRA_FORMAT in str(exc.value) or "ClassNotFound" in str(
        exc.value
    ) or "Failed to find" in str(exc.value)


def test_solr_sink_upsert_last_write_wins(spark, tmp_path):
    sink = SolrSink(
        collection="events",
        unique_key="event_id",
        emulate_dir=str(tmp_path / "solr_events"),
    )
    df = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2), (2, "c", 1)],
        "event_id long, payload string, version int",
    )
    sink.write(df, order_col="version")
    back = sink.read_back(spark)
    rows = {r["event_id"]: r["payload"] for r in back.collect()}
    assert rows == {1: "b", 2: "c"}
    # idempotent re-write (Solr overwrite semantics)
    sink.write(df, order_col="version")
    assert sink.read_back(spark).count() == 2


def test_solr_sink_batch_commit_visible_atomically(spark, tmp_path):
    sink = SolrSink(
        collection="docs",
        unique_key="doc_id",
        emulate_dir=str(tmp_path / "solr_docs"),
    )
    df = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("body")
    )
    sink.write(df)
    assert sink.read_back(spark).count() == 100
