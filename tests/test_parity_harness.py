"""The local parity harness must catch what the driver's external
hash catches — including *output dtype* mismatches.

Round-1 regression: `events_json_props_extract`'s oracle left
``sum(BIGINT)`` un-cast; DuckDB returned HUGEINT while Spark returned
int64.  Values printed identically, so the value-only compare passed
locally but the driver's dtype-sensitive hash failed.  compare_frames
now also requires the same dtype *family* per column.
"""

from __future__ import annotations

import pandas as pd

from transitdata_omm_cancellation_source_spark.testing import compare_frames


def test_int_vs_float_dtype_flagged():
    a = pd.DataFrame({"k": pd.Series([1, 2], dtype="int64")})
    b = pd.DataFrame({"k": pd.Series([1.0, 2.0], dtype="float64")})
    problems = compare_frames(a, b)
    assert problems and "dtype family" in problems[0]


def test_int_vs_object_dtype_flagged():
    """DuckDB HUGEINT converts to object/float — either way it must
    not silently pass against an int64 Spark column."""
    a = pd.DataFrame({"k": pd.Series([1, 2], dtype="int64")})
    b = pd.DataFrame({"k": pd.Series([1, 2], dtype="object")})
    problems = compare_frames(a, b)
    assert problems and "dtype family" in problems[0]


def test_same_family_different_width_passes():
    a = pd.DataFrame({"k": pd.Series([1, 2], dtype="int32")})
    b = pd.DataFrame({"k": pd.Series([1, 2], dtype="int64")})
    assert compare_frames(a, b) == []


def test_value_mismatch_still_caught():
    a = pd.DataFrame({"k": pd.Series([1, 2], dtype="int64")})
    b = pd.DataFrame({"k": pd.Series([1, 3], dtype="int64")})
    assert compare_frames(a, b)


def test_uncast_duckdb_sum_would_have_failed():
    """End-to-end form of the round-1 bug: an un-cast DuckDB sum()
    against a Spark-int64 frame must now be flagged locally."""
    import duckdb

    con = duckdb.connect()
    oracle = con.execute(
        "SELECT sum(x) AS s FROM (VALUES (1), (2)) t(x)"
    ).df()
    con.close()
    spark_like = pd.DataFrame({"s": pd.Series([3], dtype="int64")})
    assert oracle["s"].dtype.kind != "i"  # DuckDB promotes to HUGEINT
    assert compare_frames(spark_like, oracle)
