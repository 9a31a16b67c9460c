"""Vector math as Column expressions (B9 / C14 support).

The reference delegates vector similarity to Azure Search HNSW
(``db_utils.py:93-110``, cosine metric); here similarity is ordinary
columnar math: higher-order functions (``zip_with`` + ``aggregate``)
that run JVM-side inside codegen — no UDF, no Python, no shuffle.

Scale notes: dot/norm over array<float> columns is O(dim) per row in
generated code; a brute-force top-k at 100 TB is a full scan + global
TakeOrderedAndProject (map-side partial top-k, tiny reduce). The ANN
path (operators/similarity.py) cuts the scan with LSH bucketing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array<numeric> columns (JVM-side, no UDF)."""
    prod = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            _c(a), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm (matches
    the zero-vector error-fallback semantics of the embed provider)."""
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(dot(a, b) / (na * nb))


def l2_distance(a: Column | str, b: Column | str) -> Column:
    diff = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") - y.cast("double"))
    return F.sqrt(F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x * x))
