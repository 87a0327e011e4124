"""Driver contract for the spark-graft builder (PySpark target).

Thin delegation to :mod:`trireme_spark.registry` — importing
``trireme_spark`` registers every implemented SURVEY.md §2 key with its
DuckDB oracle SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from trireme_spark import registry  # noqa: E402

_SMOKE_SF = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §2.4 a1) on sf0.001; driver checks rows>0."""
    return registry.QUERIES["agg_pricing_summary"](spark, _SMOKE_SF)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
