"""Vector math over array<float> columns as pure Catalyst expressions.

No UDFs: ``zip_with`` + ``aggregate`` stay inside whole-stage codegen, so the
dot product of a 100 TB embedding table never crosses the Python boundary.
Accumulation is in DOUBLE, left-to-right — deterministic and engine-neutral
(a float32 accumulator would diverge from any double-precision oracle).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Sum_i a[i]*b[i], double accumulation in element order."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    """L2 norm."""
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity (no zero-norm guard: embeddings are unit-ish)."""
    return dot(a, b) / (norm(a) * norm(b))
