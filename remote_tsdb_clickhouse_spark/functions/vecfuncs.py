"""Vector column expressions over ``array<float>`` embeddings.

Pure Catalyst higher-order functions (``zip_with`` + ``aggregate``): the dot
product and norms run JVM-side inside codegen, no Python round-trip.  For
very wide vectors (>4k dims) a Pandas-UDF/numpy path wins on SIMD; see
``operators/similarity.py`` for that variant.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column | str) -> Column:
    c = F.col(vec) if isinstance(vec, str) else vec
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (matches the oracle's list_dot_product)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0 when either vector has zero norm."""
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb)).otherwise(F.lit(0.0))


def cosine_with_norms(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """Cosine with pre-computed norms — avoids recomputing norms per pair
    in self-joins (O(n²) pairs but O(n) norm computations)."""
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb)).otherwise(F.lit(0.0))


def sign_bucket(vec: Column, n_bits: int) -> Column:
    """Hyperplane-free LSH bucket id: sign pattern of the first ``n_bits``
    dimensions packed into an integer.

    Deterministic (axis-aligned hyperplanes), identical in any engine —
    unlike random-hyperplane LSH it needs no shared RNG state.  Vectors in
    the same bucket agree on the orthant of their leading dimensions, a
    standard quantization-bucket ANN scheme.
    """
    bits = F.transform(
        F.slice(vec, 1, n_bits),
        lambda x, i: F.when(x >= 0, F.pow(F.lit(2.0), i.cast("double")).cast("long")).otherwise(
            F.lit(0).cast("long")
        ),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda acc, x: acc + x)
