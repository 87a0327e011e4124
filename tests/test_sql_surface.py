"""SQL lifecycle parity (SURVEY.md §3.2): the spark.sql() path must reach
the same results as the DataFrame path — same Catalyst pipeline, one parser
stage earlier."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from trireme_spark import sql as tsql
from trireme_spark.sources.io import table


def _canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_views_cover_all_tables(spark):
    tsql.register_views(spark, SF_SMOKE)
    for name in ("lineitem", "events", "documents", "embeddings"):
        assert spark.sql(f"SELECT COUNT(*) AS n FROM {name}").first()["n"] > 0


def test_sql_matches_dataframe_flagship(spark):
    from trireme_spark import registry

    got = tsql.run_sql(
        spark, SF_SMOKE, tsql.SPARK_SQL_DEMOS["agg_pricing_summary"]
    )
    df = registry.QUERIES["agg_pricing_summary"](spark, SF_SMOKE).select(
        "l_returnflag", "l_linestatus", "sum_qty", "count_order"
    )
    assert _canon(got) == _canon(df)


def test_sql_matches_dataframe_topk(spark):
    from trireme_spark import registry

    got = tsql.run_sql(
        spark, SF_SMOKE, tsql.SPARK_SQL_DEMOS["win_topk_per_group"]
    )
    df = registry.QUERIES["win_topk_per_group"](spark, SF_SMOKE)
    assert _canon(got.select(sorted(got.columns))) == _canon(
        df.select(sorted(got.columns))
    )


def test_sql_session_window_matches_builder(spark):
    from trireme_spark.streaming.builders import session_windows

    got = tsql.run_sql(
        spark, SF_SMOKE, tsql.SPARK_SQL_DEMOS["stream_session_batch_form"]
    )
    want = session_windows(table(spark, SF_SMOKE, "events"))
    assert _canon(got) == _canon(want)
