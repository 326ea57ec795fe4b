"""Vector math as JVM-side column expressions (no UDFs).

Embeddings arrive as ``array<float>``; every expression first promotes to
double so arithmetic matches the DuckDB oracle's double lists. All built on
``zip_with``/``aggregate``/``transform`` — whole-stage-codegen'd, scale with
the scan, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ a_i*b_i, left-to-right (same fold order as DuckDB list_dot_product)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; null/zero-norm safe (returns null)."""
    return dot(a, b) / (norm(a) * norm(b))


def hash_bucket_signs(a: Column, hyperplanes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: one sign bit per hyperplane.

    ``hyperplanes`` is a small driver-side constant (h planes x dim floats),
    inlined into the plan as literals — no broadcast needed, fully codegen'd.
    """
    bits = []
    for i, plane in enumerate(hyperplanes):
        plane_col = F.array(*[F.lit(float(v)) for v in plane])
        bit = (dot(a, plane_col) >= 0).cast("int")
        bits.append(bit * (1 << i))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.alias("bucket")
