"""Bucketed co-located joins: pre-bucketing both sides of a frequent
join key removes the per-query shuffle entirely — on a 100 TB fact
table that is the difference between an exchange of the whole table
and a zero-movement local join. The plan must show NO Exchange."""

from __future__ import annotations

import contextlib
import io

import pytest

from mydatasyncer_spark.contract import table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_quantity", "l_extendedprice")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(wh / "lineitem_b"))
        .mode("overwrite")
        .saveAsTable("lineitem_b")
    )
    (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(wh / "orders_b"))
        .mode("overwrite")
        .saveAsTable("orders_b")
    )
    yield ("lineitem_b", "orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    li, od = bucketed
    # at fixture scale Spark would broadcast the orders side; the merge
    # hint models the 100 TB case where both sides are fact-sized and
    # the question is whether the join needs a shuffle (it must not)
    joined = spark.table(li).hint("merge").join(
        spark.table(od),
        spark.table(li)["l_orderkey"] == spark.table(od)["o_orderkey"],
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan
    # and it actually runs
    assert joined.count() > 0


def test_bucketed_agg_reuses_bucketing(spark, bucketed):
    li, _ = bucketed
    agg = spark.table(li).groupBy("l_orderkey").count()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        agg.explain("formatted")
    assert "Exchange" not in buf.getvalue()
