"""One-pass classification equivalence (r14 optimization): the
single-full-outer derivations — diff_changes, maintain_rollup_onepass,
maintain_rollup_minmax_onepass, affected_join_keys_onepass,
scd2_apply_onepass — must be row-identical to the legacy leg-wise
compositions for any mutation mix, including NULL group values, NULL
measure values, NULL join keys, group moves, group death/birth, and
both SCD2 absent-key policies."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from mydatasyncer_spark.operators.diff import (
    DiffResult,
    diff_changes,
    diff_snapshots,
)
from mydatasyncer_spark.operators.ivm import (
    affected_join_keys,
    affected_join_keys_onepass,
    maintain_rollup,
    maintain_rollup_minmax,
    maintain_rollup_minmax_onepass,
    maintain_rollup_onepass,
    rollup_state,
    rollup_state_minmax,
)
from mydatasyncer_spark.operators.scd import (
    scd2_apply,
    scd2_apply_onepass,
    scd2_init,
)

SCHEMA = "id long, g string, v double"


def _rows(df):
    return sorted(map(str, df.collect()))


def _frames(spark, seed, with_nulls=True):
    """Random old/new snapshot pair: deletes, group moves (incl. to/
    from NULL group), value changes (incl. to/from NULL), inserts."""
    rng = random.Random(seed)
    groups = ["a", "b", "c", None] if with_nulls else ["a", "b", "c"]

    def val():
        if with_nulls and rng.random() < 0.1:
            return None
        return round(rng.uniform(1, 500), 2)

    old = [(i, rng.choice(groups), val()) for i in range(150)]
    new = []
    for i, g, v in old:
        roll = rng.random()
        if roll < 0.15:
            continue  # delete
        if roll < 0.30:
            new.append((i, rng.choice(groups), v))  # maybe move group
        elif roll < 0.45:
            new.append((i, g, val()))  # value change (maybe to NULL)
        else:
            new.append((i, g, v))  # unchanged
    new += [
        (1000 + k, rng.choice(groups + ["e"]), val()) for k in range(15)
    ]
    return (
        spark.createDataFrame(old, SCHEMA),
        spark.createDataFrame(new, SCHEMA),
    )


class TestDiffChanges:
    @pytest.mark.parametrize("seed", [3, 11])
    def test_classification_matches_leg_counts(self, spark, seed):
        old_df, new_df = self._pair(spark, seed)
        diff = diff_snapshots(new_df, old_df, "id")
        ch = diff_changes(new_df, old_df, "id")
        by_kind = {
            r["_kind"]: r["n"]
            for r in ch.groupBy("_kind").agg(F.count("*").alias("n")).collect()
        }
        assert by_kind.get("insert", 0) == diff.to_insert.count()
        assert by_kind.get("update", 0) == diff.to_update.count()
        assert by_kind.get("delete", 0) == diff.to_delete.count()

    def test_delete_gate(self, spark):
        old_df, new_df = self._pair(spark, 7)
        ch = diff_changes(new_df, old_df, "id", delete_not_in_file=False)
        assert ch.filter(F.col("_kind") == "delete").count() == 0

    def test_after_before_images(self, spark):
        old_df = spark.createDataFrame([(1, "x", 5.0), (2, "y", 3.0)], SCHEMA)
        new_df = spark.createDataFrame([(1, "x", 9.0), (3, "z", 1.0)], SCHEMA)
        ch = {r["_kind"]: r for r in diff_changes(new_df, old_df, "id").collect()}
        assert ch["update"]["_after"]["v"] == 9.0
        assert ch["update"]["_before"]["v"] == 5.0
        assert ch["insert"]["_after"]["id"] == 3
        assert ch["insert"]["_before"] is None
        assert ch["delete"]["_before"]["id"] == 2
        assert ch["delete"]["_after"] is None

    def _pair(self, spark, seed):
        return _frames(spark, seed)


class TestRollupOnePassEquivalence:
    @pytest.mark.parametrize("seed", [3, 11, 42])
    def test_sum_rollup_matches_legacy_and_recompute(self, spark, seed):
        old_df, new_df = _frames(spark, seed)
        state = rollup_state(old_df, ["g"], "v")
        diff = diff_snapshots(new_df, old_df, "id")
        legacy = maintain_rollup(state, diff, ["g"], "v")
        onepass = maintain_rollup_onepass(
            state, new_df, old_df, "id", new_df.columns, ["g"], "v"
        )
        assert _rows(onepass) == _rows(legacy)
        assert _rows(onepass) == _rows(rollup_state(new_df, ["g"], "v"))

    @pytest.mark.parametrize("seed", [5, 23, 99])
    def test_minmax_rollup_matches_legacy_and_recompute(self, spark, seed):
        old_df, new_df = _frames(spark, seed)
        state = rollup_state_minmax(old_df, ["g"], "v")
        diff = diff_snapshots(new_df, old_df, "id")
        legacy = maintain_rollup_minmax(state, diff, new_df, ["g"], "v")
        onepass = maintain_rollup_minmax_onepass(
            state, new_df, old_df, new_df, "id", new_df.columns, ["g"], "v"
        )
        assert _rows(onepass) == _rows(legacy)
        assert _rows(onepass) == _rows(rollup_state_minmax(new_df, ["g"], "v"))

    def test_minmax_extremum_removal_repairs(self, spark):
        """A delete of the stored minimum must route through the
        damaged-group repair in BOTH implementations identically."""
        old_df = spark.createDataFrame(
            [(1, "x", 1.0), (2, "x", 5.0), (3, "x", 9.0)], SCHEMA
        )
        new_df = spark.createDataFrame(
            [(2, "x", 5.0), (3, "x", 9.0)], SCHEMA
        )
        state = rollup_state_minmax(old_df, ["g"], "v")
        onepass = maintain_rollup_minmax_onepass(
            state, new_df, old_df, new_df, "id", new_df.columns, ["g"], "v"
        )
        [r] = onepass.collect()
        assert (r["min_val"], r["max_val"], r["n_rows"]) == (5.0, 9.0, 2)


class TestAffectedKeysOnePassEquivalence:
    @pytest.mark.parametrize("seed", [3, 42])
    def test_key_set_matches_legacy(self, spark, seed):
        old_df, new_df = _frames(spark, seed)
        diff = diff_snapshots(new_df, old_df, "id")
        legacy = affected_join_keys(diff, "g")
        onepass = affected_join_keys_onepass(
            new_df, old_df, "id", new_df.columns, "g"
        )
        assert _rows(onepass) == _rows(legacy)

    def test_null_key_move_contributes_both_sides(self, spark):
        """An update moving a row from the NULL group to 'x' must
        dirty BOTH keys — including NULL — exactly as the legacy
        union of after+before legs."""
        old_df = spark.createDataFrame([(1, None, 5.0)], SCHEMA)
        new_df = spark.createDataFrame([(1, "x", 5.0)], SCHEMA)
        keys = affected_join_keys_onepass(
            new_df, old_df, "id", new_df.columns, "g"
        )
        assert sorted(
            [r["g"] for r in keys.collect()], key=lambda x: (x is None, x)
        ) == ["x", None]


class TestScd2OnePassEquivalence:
    @pytest.mark.parametrize("seed", [3, 11, 42])
    @pytest.mark.parametrize("delete_absent", [True, False])
    def test_history_matches_legacy(self, spark, seed, delete_absent):
        old_df, new_df = _frames(spark, seed)
        hist = scd2_init(old_df, "2020-01-01")
        legacy = scd2_apply(
            hist, new_df, "id", "2020-06-01", delete_absent=delete_absent
        )
        onepass = scd2_apply_onepass(
            hist, new_df, "id", "2020-06-01", delete_absent=delete_absent
        )
        assert _rows(onepass) == _rows(legacy)

    def test_second_apply_with_closed_history(self, spark):
        """Non-current rows pass through untouched; a later apply on
        the one-pass-built history equals the legacy chain."""
        s0 = spark.createDataFrame([(1, "x", 5.0), (2, "y", 3.0)], SCHEMA)
        s1 = spark.createDataFrame([(1, "x", 9.0), (3, "z", 1.0)], SCHEMA)
        s2 = spark.createDataFrame([(1, "x", 9.0), (3, "w", 2.0)], SCHEMA)
        hist0 = scd2_init(s0, "2020-01-01")
        legacy = scd2_apply(
            scd2_apply(hist0, s1, "id", "2020-02-01"), s2, "id", "2020-03-01"
        )
        onepass = scd2_apply_onepass(
            scd2_apply_onepass(hist0, s1, "id", "2020-02-01"),
            s2,
            "id",
            "2020-03-01",
        )
        assert _rows(onepass) == _rows(legacy)

    def test_timestamp_effectivity(self, spark):
        s0 = spark.createDataFrame([(1, "x", 5.0)], SCHEMA)
        s1 = spark.createDataFrame([(1, "x", 6.0)], SCHEMA)
        hist = scd2_init(s0, "2020-01-01 00:00:00", effective_type="timestamp_ntz")
        legacy = scd2_apply(hist, s1, "id", "2020-01-01 12:00:00")
        onepass = scd2_apply_onepass(hist, s1, "id", "2020-01-01 12:00:00")
        assert _rows(onepass) == _rows(legacy)
