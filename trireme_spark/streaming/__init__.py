"""Structured Streaming builders (SURVEY.md §2.9).

Each streaming transformation is a plain function over a DataFrame, applied
identically to the batch table and to ``readStream`` — equivalence between
the two is therefore structural, and the pytest replay harness
(tests/test_streaming.py) proves it empirically with
``trigger(availableNow=True)``.
"""

from trireme_spark.streaming.builders import (  # noqa: F401
    events_stream,
    run_to_memory,
    session_windows,
    sliding_counts,
    tumbling_counts,
)
