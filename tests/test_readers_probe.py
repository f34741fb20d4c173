"""r14 sweep: coerce_rfc3339's column-type probe is single-pass.

The probe previously launched up to TWO Spark jobs per string column
(an all-RFC aggregate, then a has-any-value aggregate) — a
50-string-column snapshot cost up to 100 full scans before the sync
even started. One aggregate row now answers both questions for every
target column at once: exactly one job, any width.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from mydatasyncer_spark.sources.readers import coerce_rfc3339, read_json


@pytest.fixture(scope="module")
def wide_df(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("coerce") / "wide.json"
    rows = [
        {
            "id": 1,
            "all_rfc": "2023-12-25T06:30:45Z",
            "mixed": "2023-12-25T06:30:45Z",
            "all_null": None,
            "plain": "hello",
            "rfc_with_null": "2024-01-01T00:00:00Z",
        },
        {
            "id": 2,
            "all_rfc": "2023-12-26T00:00:00+09:00",
            "mixed": "not a timestamp",
            "all_null": None,
            "plain": "world",
            "rfc_with_null": None,
        },
    ]
    p.write_text(json.dumps(rows))
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("all_rfc", T.StringType()),
            T.StructField("mixed", T.StringType()),
            T.StructField("all_null", T.StringType()),
            T.StructField("plain", T.StringType()),
            T.StructField("rfc_with_null", T.StringType()),
        ]
    )
    return read_json(spark, str(p), schema=schema)


def test_semantics_unchanged_across_column_kinds(spark, wide_df):
    out = coerce_rfc3339(wide_df)
    types = {f.name: f.dataType for f in out.schema.fields}
    # every non-null value RFC3339 -> converted (nulls allowed)
    assert isinstance(types["all_rfc"], T.TimestampType)
    assert isinstance(types["rfc_with_null"], T.TimestampType)
    # any non-matching value -> column left as string
    assert isinstance(types["mixed"], T.StringType)
    assert isinstance(types["plain"], T.StringType)
    # all-NULL column: nothing to type on -> left as string
    assert isinstance(types["all_null"], T.StringType)
    # non-string columns never touched
    assert isinstance(types["id"], T.LongType)
    # values survive conversion (both rows carry real instants)
    got = {r["id"]: r["all_rfc"] for r in out.collect()}
    assert got[1] is not None and got[2] is not None


def test_empty_frame_left_untouched(spark):
    df = spark.createDataFrame([], "id long, ts string")
    out = coerce_rfc3339(df)
    assert isinstance(out.schema["ts"].dataType, T.StringType)
    assert out.count() == 0


def test_probe_job_count_is_independent_of_width(spark, wide_df):
    """The load-bearing pin: probing five string columns costs exactly
    as many Spark jobs as probing one (a single aggregate pass answers
    every column at once — AQE may split that one query into a small
    constant number of jobs, but the count must not scale with column
    count; the old code paid up to two jobs PER column)."""
    sc = spark.sparkContext

    def jobs_for(df, group):
        sc.setJobGroup(group, "coerce_rfc3339 probe job-count pin")
        try:
            coerce_rfc3339(df)  # probe runs eagerly; no action needed
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
        return sc.statusTracker().getJobIdsForGroup(group)

    narrow = wide_df.select("id", "all_rfc")
    n_narrow = len(jobs_for(narrow, "coerce-pin-narrow"))
    n_wide = len(jobs_for(wide_df, "coerce-pin-wide"))
    assert n_narrow >= 1
    assert n_wide == n_narrow, (n_narrow, n_wide)


def test_no_string_columns_runs_no_job(spark):
    df = spark.range(5).selectExpr("id", "id * 2 AS x")
    sc = spark.sparkContext
    group = "coerce-probe-nojob"
    sc.setJobGroup(group, "no string columns -> no probe job")
    try:
        out = coerce_rfc3339(df)
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert sc.statusTracker().getJobIdsForGroup(group) == []
    assert out.columns == ["id", "x"]
