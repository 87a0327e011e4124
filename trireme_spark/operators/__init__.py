"""Reusable operator compositions for semantics Spark has no native
physical operator for (SURVEY.md §4: zero custom Catalyst rules — each of
these is pure DataFrame algebra that Catalyst plans like any other query).

* :mod:`asof` — as-of join via union + running ``last(ignorenulls)``.
* :mod:`similarity` — MinHash/LSH signatures, prefix-filter
  set-similarity candidates, distributed block-pair-GEMM exact cosine
  kNN / threshold pairs, hyperplane LSH bucketing.
* :mod:`clustering` — distributed Lloyd's k-means (k×d driver state),
  IVF coarse quantizer, product quantization train/encode.
* :mod:`graph` — min-label-propagation connected components,
  k-core peeling (both localCheckpoint-truncated, loud round budgets).
* :mod:`winframes` — distributed two-pass global-order machinery
  (bucket row_number + broadcast prefix offsets) used by the
  rank/gini/lorenz/skyline family.
* :mod:`skew` — salted joins and two-phase skewed aggregation.
* :mod:`multimodal` — Arrow ``mapInPandas`` binary decode plumbing
  (stubbed decoder, real schema/batch shape).
* :mod:`hints` — size-gated ``broadcast_if_small`` (Catalyst
  plan-size estimate vs an executor budget) and ``cache_once``.
"""

from trireme_spark.operators.asof import asof_join  # noqa: F401
