"""Text primitives for the documents pipeline (SURVEY.md §2.11).

Pure column expressions — tokenization stays inside codegen; the only
Python is plan construction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

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
