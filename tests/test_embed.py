"""Deterministic-provider tests for the embedding surface (A17)."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from data_ingestion_tool_bakasura__spark.functions import embed as E


def test_hash_embed_deterministic():
    a = E.hash_embed_py("hello", 64)
    b = E.hash_embed_py("hello", 64)
    assert a == b
    assert len(a) == 64


def test_hash_embed_unit_norm():
    v = E.hash_embed_py("some text", 64)
    assert math.isclose(float(np.linalg.norm(v)), 1.0, rel_tol=1e-5)


def test_hash_embed_distinct_texts_differ():
    assert E.hash_embed_py("a", 32) != E.hash_embed_py("b", 32)


def test_zero_vector_fallback():
    assert E.hash_embed_py("", 8) == [0.0] * 8
    assert E.hash_embed_py(None, 8) == [0.0] * 8


def test_embed_udf_matches_py(spark):
    df = spark.createDataFrame([("abc",), ("def",), (None,)], "t string")
    rows = df.select(E.embed_udf(E.HashEmbeddingProvider(16))(F.col("t")).alias("v")).collect()
    got = [r["v"] for r in rows]
    assert got[0] == [float(np.float32(x)) for x in E.hash_embed_py("abc", 16)]
    assert got[2] == [0.0] * 16


def test_remote_provider_unwired_raises():
    import pandas as pd
    import pytest

    p = E.RemoteEmbeddingProvider()
    with pytest.raises(NotImplementedError):
        p.embed_batch(pd.Series(["x"]))


def test_remote_provider_error_fallback_zero_vectors():
    import pandas as pd

    def boom(texts):
        raise RuntimeError("service down")

    p = E.RemoteEmbeddingProvider(dim=4, call=boom)
    out = p.embed_batch(pd.Series(["x", "y"]))
    assert out.shape == (2, 4)
    assert not out.any()
