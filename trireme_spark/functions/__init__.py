"""Scalar-function helpers shared by query modules (SURVEY.md §2.8, §2.11).

Everything here is built-in `pyspark.sql.functions` composition — JVM-side,
whole-stage-codegen'd, no Python in the row path.
"""

from trireme_spark.functions.text import (  # noqa: F401
    tokenize,
    STOPWORDS,
)
