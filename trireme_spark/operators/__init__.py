"""Reusable operator compositions for semantics Spark has no native
physical operator for (SURVEY.md §4: zero custom Catalyst rules — each of
these is pure DataFrame algebra that Catalyst plans like any other query).

* :mod:`asof` — as-of join via union + running ``last(ignorenulls)``.
* :mod:`similarity` — MinHash/LSH, set-similarity join, cosine kNN/ANN.
"""

from trireme_spark.operators.asof import asof_join  # noqa: F401
