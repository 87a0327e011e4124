"""Fixture table loader + generic source/sink helpers.

Scale note: ``spark.read.parquet`` gives Catalyst the native vectorized
parquet scan — predicate pushdown, column pruning and partition pruning all
land here for free (verify with ``df.explain('formatted')`` →
``PushedFilters`` / ``ReadSchema``). At 100 TB the same call reads a
partitioned directory tree; nothing in the engine assumes single-file
inputs.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table (TESTDATA.md:15).

    ``events.ts`` is TIMESTAMP(NANOS) parquet, which Spark 4 refuses to read
    natively (PARQUET_TYPE_ILLEGAL — verified on 4.1.2). We read it as raw
    nanos via the ``nanosAsLong`` legacy conf and floor-truncate to µs —
    exactly what DuckDB's reader does — so both engines see identical
    timestamps. This stays fully distributed (a column projection, no
    driver-side rewrite).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        # Convert only when ts actually arrived as raw nanos — an events
        # table the engine itself wrote (or any µs source) already carries
        # a proper timestamp, and re-converting would corrupt it.
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        return df
    return spark.read.parquet(path)


def write_read_roundtrip(
    df: DataFrame, fmt: str, tag: str, **writer_options
) -> DataFrame:
    """Write ``df`` out in ``fmt`` and read it back with the same schema.

    Used by the s3/s4 source round-trip checks. The explicit read schema
    mirrors production practice: schema inference is a full extra pass over
    the data — never acceptable at 100 TB.
    """
    out = os.path.join(
        tempfile.gettempdir(), f"trireme_spark_roundtrip_{fmt}_{tag}"
    )
    df.write.mode("overwrite").options(**writer_options).format(fmt).save(out)
    reader = df.sparkSession.read.schema(df.schema).options(**writer_options)
    return reader.format(fmt).load(out)
