"""Query modules — importing this package registers every SURVEY.md §2 key.

One module per §2 group; each module registers (query fn, oracle SQL) pairs
into :mod:`trireme_spark.registry`.
"""

from trireme_spark.queries import aggregates  # noqa: F401
from trireme_spark.queries import filters  # noqa: F401
from trireme_spark.queries import functions_scalar  # noqa: F401
from trireme_spark.queries import joins  # noqa: F401
from trireme_spark.queries import llm_sim  # noqa: F401
from trireme_spark.queries import llm_text  # noqa: F401
from trireme_spark.queries import multimodal  # noqa: F401
from trireme_spark.queries import windows  # noqa: F401
from trireme_spark.queries import scans  # noqa: F401
from trireme_spark.queries import sorts_sets  # noqa: F401
from trireme_spark.queries import streaming  # noqa: F401
from trireme_spark.queries import udfs  # noqa: F401
