"""Query/oracle registry — the driver-contract surface.

Every operator from SURVEY.md §2 registers here as
  key -> fn(spark, sf_dir) -> DataFrame          (QUERIES)
  key -> ANSI SQL string for the DuckDB oracle   (ORACLES; omitted => the
         driver records a weaker rows-only check, used only where §2 says so)

``__spark_entry__.py`` exposes these dicts verbatim to the driver.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(key: str, oracle: Optional[str] = None):
    """Decorator: register a query implementation (and its oracle SQL).

    The wrapped callable first normalizes runtime session conf (UTC timezone,
    Arrow) so results are stable even under the driver's own SparkSession,
    whose conf we don't control.
    """

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        from trireme_spark.session import prep

        def wrapped(spark: SparkSession, sf_dir: str, **kwargs) -> DataFrame:
            prep(spark)
            return fn(spark, sf_dir, **kwargs)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[key] = wrapped
        if oracle is not None:
            ORACLES[key] = oracle
        return wrapped

    return deco
