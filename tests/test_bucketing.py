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


class TestSaltedJoin:
    """salted_join must be result-identical to the plain join in every
    mode — salting is a physical-distribution trick, never semantics."""

    def _frames(self, spark):
        # skewed fact: key 1 carries half the rows; one NULL key
        fact_rows = [(1, i) for i in range(50)] + [
            (k, 1000 + k) for k in range(2, 27)
        ] + [(None, 9999)]
        fact = spark.createDataFrame(fact_rows, "k int, payload int")
        dim = spark.createDataFrame(
            [(k, f"d{k}") for k in range(1, 20)], "k int, attr string"
        )
        return fact, dim

    @staticmethod
    def _norm(rows):
        # None-safe canonical ordering for row-set comparison
        return sorted(rows, key=repr)

    def _plain(self, fact, dim, how):
        return self._norm(
            (r["k"], r["payload"], r["attr"])
            for r in fact.join(dim, ["k"], how).collect()
        )

    def test_full_salt_inner_and_left(self, spark):
        from mydatasyncer_spark.operators.partitioning import salted_join

        fact, dim = self._frames(spark)
        for how in ("inner", "left"):
            got = self._norm(
                (r["k"], r["payload"], r["attr"])
                for r in salted_join(fact, dim, ["k"], 8, how).collect()
            )
            assert got == self._plain(fact, dim, how), how

    def test_hot_key_mode_matches_plain(self, spark):
        from mydatasyncer_spark.operators.partitioning import salted_join

        fact, dim = self._frames(spark)
        for how in ("inner", "left"):
            got = self._norm(
                (r["k"], r["payload"], r["attr"])
                for r in salted_join(
                    fact, dim, ["k"], 8, how, hot_keys=[1]
                ).collect()
            )
            assert got == self._plain(fact, dim, how), how

    def test_left_preserves_null_key_rows(self, spark):
        from mydatasyncer_spark.operators.partitioning import salted_join

        fact, dim = self._frames(spark)
        out = salted_join(fact, dim, ["k"], 4, "left", hot_keys=[1])
        nulls = [r for r in out.collect() if r["k"] is None]
        assert len(nulls) == 1 and nulls[0]["attr"] is None

    def test_fact_rows_scatter_across_salts(self, spark):
        """The point of the exercise: the hot key's fact rows must
        carry several distinct salt values (scattering the shuffle),
        while each (row, salt) matches exactly one dim replica."""
        from pyspark.sql import functions as F

        from mydatasyncer_spark.operators.partitioning import salted_join

        fact, dim = self._frames(spark)
        salted = fact.withColumn(
            "_salt",
            F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), 8),
        )
        n_salts_hot = (
            salted.filter("k = 1").select("_salt").distinct().count()
        )
        assert n_salts_hot >= 4  # 50 rows over 8 salts
        # exactly-once: inner join row count equals plain join
        assert (
            salted_join(fact, dim, ["k"], 8).count()
            == fact.join(dim, ["k"]).count()
        )


class TestSaltedJoinAuto:
    def test_skewed_input_salts_and_matches_plain(self, spark):
        from mydatasyncer_spark.operators.partitioning import (
            salted_join_auto,
        )

        fact_rows = [(1, i) for i in range(400)] + [
            (k, 1000 + k) for k in range(2, 42)
        ]
        fact = spark.createDataFrame(fact_rows, "k int, payload int")
        dim = spark.createDataFrame(
            [(k, f"d{k}") for k in range(1, 42)], "k int, attr string"
        )
        got = sorted(
            (r["k"], r["payload"], r["attr"])
            for r in salted_join_auto(fact, dim, ["k"]).collect()
        )
        want = sorted(
            (r["k"], r["payload"], r["attr"])
            for r in fact.join(dim, ["k"]).collect()
        )
        assert got == want

    def test_uniform_input_returns_plain_join(self, spark):
        from mydatasyncer_spark.operators.partitioning import (
            salted_join_auto,
        )

        fact = spark.createDataFrame(
            [(i % 50, i) for i in range(500)], "k int, payload int"
        )
        dim = spark.createDataFrame(
            [(k, f"d{k}") for k in range(50)], "k int, attr string"
        )
        out = salted_join_auto(fact, dim, ["k"])
        # uniform keys: ratio_to_mean = 1 everywhere -> no salting
        assert "_salt" not in out.columns
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "_salt" not in plan
        assert out.count() == 500


class TestSaltedJoinProperties:
    # full-suite-only (pytest.ini fast gate); run with -m slow
    pytestmark = pytest.mark.slow
    """r13 sweep pin: salted_join is a physical-distribution trick —
    result-identical to the plain join for EVERY (mode, salt count,
    hot-key set) over random frames with NULL keys on both sides and
    duplicate keys everywhere. Includes NULL in the hot_keys list
    (what salted_join_auto passes when the NULL key is the heaviest):
    since r14 those rows take the NULL-key bypass (inner drops them
    pre-shuffle, left pads them shuffle-free) — these identity pins
    are what the bypass must keep true."""

    def test_matches_plain_join_any_config(self, spark):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from mydatasyncer_spark.operators.partitioning import salted_join

        key = st.one_of(st.none(), st.integers(0, 6))

        @settings(
            max_examples=10,
            deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        @given(
            fact_keys=st.lists(key, min_size=1, max_size=25),
            dim_keys=st.lists(key, min_size=1, max_size=8),
            how=st.sampled_from(["inner", "left", "right"]),
            n_salts=st.sampled_from([2, 5, 8]),
            hot=st.one_of(
                st.none(),
                st.lists(key, min_size=1, max_size=3, unique=True),
            ),
        )
        def check(fact_keys, dim_keys, how, n_salts, hot):
            fact = spark.createDataFrame(
                [(k, i) for i, k in enumerate(fact_keys)],
                "k int, payload int",
            )
            # dim unique per key (the salted right-mode contract —
            # replicas must be per-key-deterministic)
            dim = spark.createDataFrame(
                [(k, f"d{k}") for k in dict.fromkeys(dim_keys)],
                "k int, attr string",
            )
            got = sorted(
                (
                    (r["k"], r["payload"], r["attr"])
                    for r in salted_join(
                        fact, dim, ["k"], n_salts, how, hot_keys=hot
                    ).collect()
                ),
                key=repr,
            )
            want = sorted(
                (
                    (r["k"], r["payload"], r["attr"])
                    for r in fact.join(dim, ["k"], how).collect()
                ),
                key=repr,
            )
            assert got == want

        check()

    def test_null_hot_key_takes_the_bypass(self, spark):
        """r14 (r13 deferred finding): when NULL is the hot key, the
        cure must ENGAGE — NULL-key fact rows never enter a join (no
        single-NULL-partition straggler). Pinned structurally: every
        join leg filters the fact key non-null (visible as isnotnull
        even under LEFT, where Spark itself would never add it), and
        the preserved NULL rows arrive through a join-free Union leg.
        Identity vs the plain join guards the semantics."""
        from pyspark.sql import functions as F

        from mydatasyncer_spark.operators.partitioning import salted_join

        # NULL-heavy fact: the NULL key carries half the rows
        fact_rows = (
            [(None, i) for i in range(60)]
            + [(1, 100 + i) for i in range(30)]
            + [(k, 1000 + k) for k in range(2, 12)]
        )
        fact = spark.createDataFrame(fact_rows, "k int, payload int")
        dim = spark.createDataFrame(
            [(k, f"d{k}") for k in range(1, 12)], "k int, attr string"
        )
        norm = lambda rows: sorted(rows, key=repr)  # noqa: E731
        for how in ("inner", "left"):
            out = salted_join(
                fact, dim, ["k"], 8, how, hot_keys=[None, 1]
            )
            got = norm(
                (r["k"], r["payload"], r["attr"]) for r in out.collect()
            )
            want = norm(
                (r["k"], r["payload"], r["attr"])
                for r in fact.join(dim, ["k"], how).collect()
            )
            assert got == want, how
            plan = out._jdf.queryExecution().optimizedPlan().toString()
            assert "isnotnull(k" in plan, (how, plan)
        # inner: NULL rows dropped before any exchange — zero NULL
        # keys survive to the join output
        inner = salted_join(fact, dim, ["k"], 8, "inner", hot_keys=[None])
        assert inner.filter(F.col("k").isNull()).count() == 0
        # left: all 60 NULL rows preserved, padded, exactly once
        left = salted_join(fact, dim, ["k"], 8, "left", hot_keys=[None])
        nulls = left.filter(F.col("k").isNull())
        assert nulls.count() == 60
        assert nulls.filter(F.col("attr").isNotNull()).count() == 0
        # and the padded leg is join-free: the NULL-key filter side of
        # the Union contains no Join node in the optimized plan
        lplan = left._jdf.queryExecution().optimizedPlan().toString()
        assert "Union" in lplan, lplan

    def test_multi_key_join_matches_plain(self, spark):
        from mydatasyncer_spark.operators.partitioning import salted_join

        fact = spark.createDataFrame(
            [(1, "x", 10), (1, "y", 11), (None, "x", 12), (2, None, 13)]
            + [(1, "x", 100 + i) for i in range(20)],
            "a int, b string, payload int",
        )
        dim = spark.createDataFrame(
            [(1, "x", "d1x"), (2, None, "d2n"), (3, "z", "d3z")],
            "a int, b string, attr string",
        )
        for how in ("inner", "left"):
            for hot in (None, [1]):
                got = sorted(
                    (
                        (r["a"], r["b"], r["payload"], r["attr"])
                        for r in salted_join(
                            fact, dim, ["a", "b"], 4, how, hot_keys=hot
                        ).collect()
                    ),
                    key=repr,
                )
                want = sorted(
                    (
                        (r["a"], r["b"], r["payload"], r["attr"])
                        for r in fact.join(dim, ["a", "b"], how).collect()
                    ),
                    key=repr,
                )
                assert got == want, (how, hot)
