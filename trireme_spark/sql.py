"""SQL-string entry point (SURVEY.md §3.2, lifecycle #2).

Every fixture table is exposed as a temp view, so the full engine surface
is reachable through ``spark.sql(...)`` exactly as through the DataFrame
API — both converge on the same Catalyst pipeline one parser stage later.
`SPARK_SQL_DEMOS` holds Spark-dialect statements for representative
inventory keys; tests assert each matches its DataFrame twin row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from trireme_spark.sources.io import TABLES, table


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Create/refresh one temp view per fixture table (idempotent)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


def run_sql(spark: SparkSession, sf_dir: str, statement: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(statement)


# Spark-dialect mirrors of representative inventory keys (the DuckDB oracle
# texts live next to each registered query; these are the Spark-side twins).
SPARK_SQL_DEMOS: dict[str, str] = {
    "agg_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE)
                   AS sum_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "join_inner_equi": """
        SELECT o_orderkey, o_totalprice, c_name
        FROM orders JOIN customer ON o_custkey = c_custkey
    """,
    "win_topk_per_group": """
        SELECT * FROM (
            SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
            FROM orders
        ) WHERE rn <= 3
    """,
    "fn_json": """
        SELECT event_id, get_json_object(props, '$.k') AS k_raw
        FROM events
    """,
    "stream_session_batch_form": """
        SELECT user_id, session_window.start AS session_start,
               session_window.end AS session_end,
               COUNT(*) AS n_events
        FROM (SELECT user_id, ts FROM events)
        GROUP BY session_window(ts, '30 minutes'), user_id
    """,
}
