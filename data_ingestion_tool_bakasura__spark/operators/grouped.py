"""Grouped pandas-UDF surface (SURVEY §2.C18): applyInPandas and
GROUPED_AGG pandas UDFs — the per-group escape hatch for logic the
built-in aggregates can't express (numpy linear algebra per group,
custom normalization), kept off the hot path per the UDF-is-slow rule.

Scale notes: both forms shuffle on the group key and hold ONE group in
memory at a time on the executor — safe when group cardinality is high
and group size bounded (labels, users, files), wrong for whale groups
(pre-split or pre-aggregate those). Arrow moves the batches, so the
Python tax is per-group, not per-row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def centroid_per_group(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Per-group embedding centroid via applyInPandas: (group, centroid
    array<double>, n_members). One numpy mean per group.

    ``dim`` short-circuits the schema-inference ``first()`` probe and is
    enforced inside the UDF: a group containing a vector of any other
    length (or a null) fails that task with a ValueError naming the
    group, instead of silently emitting a wrong-length centroid."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    schema = T.StructType(
        [
            T.StructField(group_col, df.schema[group_col].dataType),
            T.StructField("centroid", T.ArrayType(T.DoubleType())),
            T.StructField("n_members", T.LongType()),
        ]
    )

    def _centroid(pdf: pd.DataFrame) -> pd.DataFrame:
        try:
            V = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        except ValueError:  # ragged lengths fail ndarray construction
            V = np.empty(0)
        if V.ndim != 2 or V.shape[1] != dim:
            raise ValueError(
                f"centroid_per_group(dim={dim}): group "
                f"{pdf[group_col].iloc[0]!r} has ragged, null, or "
                f"wrong-dimension {vec_col!r} vectors"
            )
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "centroid": [V.mean(axis=0).tolist()],
                "n_members": [len(pdf)],
            }
        )

    return df.select(group_col, vec_col).groupBy(group_col).applyInPandas(_centroid, schema)


def zscore_within_group(
    df: DataFrame, group_col: str, value_col: str, out: str = "zscore"
) -> DataFrame:
    """Per-group z-score normalization via applyInPandas (population
    stddev; 0.0 for degenerate groups). Returns the input rows + the
    normalized column — the grouped-map shape (N rows in, N rows out)."""
    fields = [*df.schema.fields, T.StructField(out, T.DoubleType())]

    def _z(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].astype(float)
        sd = v.std(ddof=0)
        pdf[out] = 0.0 if (sd == 0 or np.isnan(sd)) else (v - v.mean()) / sd
        return pdf

    return df.groupBy(group_col).applyInPandas(_z, T.StructType(fields))


@F.pandas_udf(T.DoubleType())
def geometric_mean(v: pd.Series) -> float:
    """GROUPED_AGG pandas UDF: exp(mean(log(x))) over positive values
    (use inside ``groupBy(...).agg(geometric_mean(col))``). A group
    with no positive values yields NULL — matching SQL
    ``exp(avg(ln(x)) FILTER (WHERE x > 0))`` semantics, not 0.0."""
    x = v[v > 0]
    return float(np.exp(np.log(x).mean())) if len(x) else None


@F.pandas_udf(T.LongType())
def pandas_count(v: pd.Series) -> int:
    """GROUPED_AGG row count (nulls included). Exists because a pandas
    GROUPED_AGG UDF cannot share an aggregation with JVM aggregates
    (INVALID_PANDAS_UDF_PLACEMENT) — pairing it with another pandas UDF
    keeps a mixed result to ONE aggregation instead of agg+agg+join."""
    return len(v)
