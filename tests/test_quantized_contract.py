"""Property test for the quantized-embedding contract: on RANDOM float
vectors, the quantized cosine must be bit-identical across all three
evaluation engines — Spark column expressions, DuckDB SQL, and the numpy
kernel arithmetic — because every reduction is an exact int64 sum and
every float is derived by identically-rounded IEEE ops. This is the
load-bearing invariant behind running Arrow kernels as the registry path
while hash-comparing against DuckDB oracles."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_pipeline_foundations_spark.operators.similarity import (
    EMB_SCALE, idot, int_vec, oracle_idot, oracle_int_vec, oracle_qcos, qcos,
)

DIM = 16


def _np_qcos(a: list[float], b: list[float]) -> float:
    sa = np.floor(np.asarray(a, dtype=np.float64) * EMB_SCALE + 0.5).astype(np.int64)
    sb = np.floor(np.asarray(b, dtype=np.float64) * EMB_SCALE + 0.5).astype(np.int64)
    d = int(sa @ sb)
    na2, nb2 = int(sa @ sa), int(sb @ sb)
    return float(d) / (math.sqrt(float(na2)) * math.sqrt(float(nb2)))


floats = st.floats(min_value=-1.0, max_value=1.0,
                   allow_nan=False, allow_infinity=False)
vecs = st.lists(floats, min_size=DIM, max_size=DIM)


@settings(max_examples=12, deadline=None)
@given(a=vecs, b=vecs)
def test_qcos_identical_across_engines(spark, duck, a, b):
    # degenerate zero-norm vectors divide by zero — outside the contract
    if not any(abs(x) >= 1e-6 for x in a) or not any(abs(x) >= 1e-6 for x in b):
        return
    df = spark.createDataFrame(
        [(list(map(float, a)), list(map(float, b)))],
        "va array<float>, vb array<float>")
    staged = (df.select(int_vec("va").alias("sa"), int_vec("vb").alias("sb"))
              .select(qcos(idot("sa", "sb"), idot("sa", "sa"),
                           idot("sb", "sb")).alias("c")))
    spark_c = staged.collect()[0]["c"]

    def flit(xs):
        # float32 literals: go through the same FLOAT cast DuckDB's scan
        # applies to the parquet column
        return ("[" + ", ".join(repr(float(np.float32(x))) for x in xs)
                + "]::FLOAT[]")
    sa, sb = oracle_int_vec(flit(a)), oracle_int_vec(flit(b))
    duck_c = duck.execute(
        f"SELECT {oracle_qcos(oracle_idot('sa', 'sb'), oracle_idot('sa', 'sa'), oracle_idot('sb', 'sb'))} "
        f"FROM (SELECT {sa} AS sa, {sb} AS sb)").fetchone()[0]

    np_c = _np_qcos([float(np.float32(x)) for x in a],
                    [float(np.float32(x)) for x in b])

    assert spark_c == duck_c == np_c  # bit-identical, no tolerance


@settings(max_examples=8, deadline=None)
@given(a=vecs)
def test_int_vec_matches_numpy_quantizer(spark, a):
    df = spark.createDataFrame([(list(map(float, a)),)], "v array<float>")
    got = df.select(int_vec("v").alias("sv")).collect()[0]["sv"]
    want = np.floor(np.asarray([float(np.float32(x)) for x in a],
                               dtype=np.float64) * EMB_SCALE + 0.5).astype(np.int64)
    assert list(got) == [int(x) for x in want]
