"""Text primitives for the documents pipeline (SURVEY.md §2.11).

Pure column expressions — tokenization stays inside codegen; the only
Python is plan construction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from trireme_spark.functions.core import let

# Small deterministic stopword list — mirrored literally in oracle SQL.
STOPWORDS = ["the", "a", "and", "of", "to", "in"]


def tokenize(text: Column | str, drop_stopwords: bool = False) -> Column:
    """Lowercase + split on whitespace runs → array<string>.

    Mirrors the oracle's ``string_split_regex(lower(text), '\\s+')``.
    """
    c = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.lower(c), r"\s+")
    if drop_stopwords:
        # F.filter, NOT array_except: array_except deduplicates, which
        # silently destroys term frequencies downstream (tf-idf, counts).
        toks = F.filter(toks, lambda t: ~t.isin(STOPWORDS))
    return toks


def char_ngrams(text: Column | str, n: int = 4) -> Column:
    """Distinct character n-grams of the lowercased text → array<string>.

    Oracle mirror: ``list_distinct(list_transform(range(len - n + 1),
    i -> substr(lower(text), i+1, n)))``. The text expression is
    let-bound, so raw chains (``lower(text)``) evaluate once per row —
    callers no longer need a materialization barrier before this."""
    c = F.col(text) if isinstance(text, str) else text

    def build(s: Column) -> Column:
        idx = F.sequence(F.lit(1), F.length(s) - (n - 1))
        # Guard, don't clamp: sequence(1, 0) is DESCENDING [1, 0] in
        # Spark, so a short text would fabricate n-grams instead of
        # yielding none.
        return F.when(
            F.length(s) < n, F.array().cast("array<string>")
        ).otherwise(
            F.array_distinct(
                F.transform(idx, lambda i: F.substring(s, i, n))
            )
        )

    return let(c, build)
