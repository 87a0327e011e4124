"""Engine-neutral Catalyst expression utilities.

Not text-specific: anything that shapes HOW an expression evaluates
(sharing, once-per-row semantics) rather than WHAT it computes lives
here, so operator modules don't have to import from a domain module.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def let(col: Column, body) -> Column:
    """Once-per-row let-binding for column expressions.

    Catalyst has no common-subexpression elimination across a lambda
    boundary: a higher-order-function lambda that CAPTURES an outer
    expression (``transform(idx, i -> element_at(tokens, i))``) inlines a
    private copy of that expression into every capture site, and after
    CollapseProject the copy is the WHOLE upstream chain — so
    ``tokens = split(lower(text))`` re-executes per element instead of
    per row (measured 18.2 s → 0.74 s on the 3-gram explode at sf0.1;
    the same trap previously needed repartition barriers at call sites).

    The one once-per-row slot Catalyst does guarantee is a HOF's INPUT:
    it is evaluated exactly once, and the lambda variable is a cheap
    bound reference. Wrapping the expression as a single-element array
    and reading the transformed element back out is therefore a
    let-binding: ``let(e, x -> body(x))`` evaluates ``e`` once however
    many times ``x`` appears in ``body``.

    The single-evaluation property rests on the optimizer NOT inlining
    transform-over-literal-array; tests/test_plans.py pins the plan
    shape (the transform wrapper must survive optimization) so a future
    Catalyst rule that re-inlines it fails the default suite instead of
    silently reintroducing the per-element re-execution.
    """
    return F.element_at(F.transform(F.array(col), body), 1)
