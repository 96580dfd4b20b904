"""Differential tests: every registered query vs its DuckDB oracle.

Replicates the driver's correctness gate (CORRECTNESS_r{N}.json): run the
Spark query and the oracle SQL over the same parquet tables, sort columns
by name, sort rows, and require row-count + schema-kind + exact value
equality. Floats must match bit-for-bit — the engine's determinism contract
(integer-cents aggregation, deterministic tiebreaks) makes that achievable;
any drift is a bug, not noise.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from data_pipeline_foundations_spark.registry import all_queries

SPECS = sorted(all_queries().values(), key=lambda s: s.name)
ORACLE_SPECS = [s for s in SPECS if s.oracle is not None]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stable row order independent of engine: sort by every column (stringified
    # so mixed/None types sort); hash-compare afterwards uses exact values
    key = df.astype(str)
    order = key.sort_values(by=list(df.columns)).index
    return df.loc[order].reset_index(drop=True)


def _kind(dtype) -> str:
    k = dtype.kind if hasattr(dtype, "kind") else "O"
    return {"i": "int", "u": "int", "f": "float", "b": "bool",
            "M": "ts", "O": "obj", "m": "td"}.get(k, k)


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(duck_pdf)}")
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}")
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    for col in a.columns:
        ka, kb = _kind(a[col].dtype), _kind(b[col].dtype)
        assert ka == kb or {ka, kb} <= {"int", "float"} or "obj" in (ka, kb), (
            f"{name}.{col}: dtype kind {ka} != {kb}")
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None or (isinstance(x, float) and math.isnan(x)):
                ok = y is None or (isinstance(y, float) and math.isnan(y)) or pd.isna(y)
            elif pd.isna(x):
                ok = pd.isna(y)
            elif isinstance(x, float) or isinstance(y, float):
                ok = float(x) == float(y)  # exact: determinism contract
            else:
                ok = x == y
            assert ok, f"{name}.{col}[{i}]: spark={x!r} oracle={y!r}"


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=lambda s: s.name)
def test_oracle_parity(spec, spark, duck, sf_dir):
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    duck_pdf = duck.execute(spec.oracle).fetchdf()
    assert_frames_match(spark_pdf, duck_pdf, spec.name)


@pytest.mark.parametrize("spec", [s for s in SPECS if s.oracle is None],
                         ids=lambda s: s.name)
def test_rows_only_queries_run(spec, spark, sf_dir):
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
