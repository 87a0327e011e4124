"""As-of join (SURVEY.md §2.3 j7, §4).

Spark SQL has no native as-of physical operator (pandas-on-Spark's
``merge_asof`` exists but routes through a cogrouped pandas UDF). This is
the classic distributed formulation instead: tag + union both sides,
partition by key, one window pass carrying the right side's values forward.

Scale: one shuffle on the join key — the same cost as any equi-join — and
the window carries O(1) state (just the carried columns). No per-key data
must fit in memory, unlike a pandas-cogroup implementation; at 100 TB this
is the difference between working and OOM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    right_tie_col: str | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` within the same ``on`` key (backward as-of,
    inclusive: equal timestamps match).

    Returns all left columns plus ``asof_ts`` and ``asof_<col>`` for each
    requested right value column (null when no right row precedes).
    ``right_tie_col`` makes the survivor deterministic when several right
    rows share a timestamp.
    """
    carry = [c for c in left.columns if c != on]

    r = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        (
            F.col(right_tie_col) if right_tie_col else F.lit(0)
        ).cast("long").alias("__tie"),
        F.col(right_ts).alias("__asof_ts"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in carry
        ],
    )
    l = left.select(
        F.col(on),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(0).cast("long").alias("__tie"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__asof_ts"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}")
            for c in value_cols
        ],
        *[F.col(c) for c in carry],
    )

    # Right rows sort before left rows at equal ts → inclusive semantics.
    w = (
        Window.partitionBy(on)
        .orderBy("__ts", "__side", "__tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l).select(
        "*",
        F.last("__asof_ts", ignorenulls=True).over(w).alias("asof_ts"),
        *[
            F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    return carried.where(F.col("__side") == 1).select(
        on,
        *carry,
        "asof_ts",
        *[f"asof_{c}" for c in value_cols],
    )
