"""Dense-vector math over ``array<float|double>`` columns.

All JVM-side higher-order-function expressions (``zip_with`` +
``aggregate``) — no Python in the hot path, so brute-force similarity
scans stay inside whole-stage codegen and scale with the cluster.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def normalize(a: Column) -> Column:
    """Unit-norm copy of the vector (double elements).

    The norm is bound ONCE through a one-element ``transform`` before
    the per-element division: higher-order-function lambdas evaluate
    interpreted, and a captured aggregate re-evaluates per element
    (O(dim^2) folds per row — the gram-operator trap)."""
    return F.transform(
        F.array(l2_norm(a)),
        lambda n: F.transform(a, lambda v: v / n),
    )[0]
