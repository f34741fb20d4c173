"""Incremental view maintenance: maintained rollup state must be
exactly the full recompute of the new snapshot, for any mutation mix —
inserts, deletes, value updates, and group-moving updates."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from mydatasyncer_spark.operators.diff import diff_snapshots
from mydatasyncer_spark.operators.ivm import maintain_rollup, rollup_state


def _state_map(df):
    group_cols = [
        c for c in df.columns if c not in ("sum_val", "n_rows", "n_vals")
    ]
    return {
        tuple(r[c] for c in group_cols): (
            None if r["sum_val"] is None else float(r["sum_val"]),
            r["n_rows"],
            r["n_vals"],
        )
        for r in df.collect()
    }


class TestMaintainRollup:
    def _frames(self, spark, seed):
        rng = random.Random(seed)
        groups = ["a", "b", "c", "d"]
        old = [
            (i, rng.choice(groups), round(rng.uniform(1, 500), 2))
            for i in range(120)
        ]
        new = []
        for i, g, v in old:
            roll = rng.random()
            if roll < 0.15:
                continue  # delete
            if roll < 0.30:
                new.append((i, rng.choice(groups), v))  # maybe move group
            elif roll < 0.45:
                new.append((i, g, round(v + 10, 2)))  # value change
            else:
                new.append((i, g, v))  # unchanged
        new += [
            (1000 + k, rng.choice(groups + ["e"]), round(rng.uniform(1, 500), 2))
            for k in range(15)
        ]  # inserts incl. a brand-new group
        schema = "id long, g string, v double"
        return (
            spark.createDataFrame(old, schema),
            spark.createDataFrame(new, schema),
        )

    @pytest.mark.parametrize("seed", [3, 11, 42])
    def test_incremental_equals_recompute(self, spark, seed):
        old_df, new_df = self._frames(spark, seed)
        state = rollup_state(old_df, ["g"], "v")
        diff = diff_snapshots(new_df, old_df, "id")
        maintained = maintain_rollup(state, diff, ["g"], "v")
        recomputed = rollup_state(new_df, ["g"], "v")
        assert _state_map(maintained) == _state_map(recomputed)

    def test_group_death_dropped(self, spark):
        old_df = spark.createDataFrame(
            [(1, "solo", 5.0), (2, "big", 7.0)], "id long, g string, v double"
        )
        new_df = spark.createDataFrame(
            [(2, "big", 7.0)], "id long, g string, v double"
        )
        state = rollup_state(old_df, ["g"], "v")
        diff = diff_snapshots(new_df, old_df, "id")
        maintained = maintain_rollup(state, diff, ["g"], "v")
        assert _state_map(maintained) == {("big",): (7.0, 1, 1)}

    def test_group_move_updates_both_sides(self, spark):
        old_df = spark.createDataFrame(
            [(1, "x", 5.0), (2, "y", 3.0)], "id long, g string, v double"
        )
        new_df = spark.createDataFrame(
            [(1, "y", 5.0), (2, "y", 3.0)], "id long, g string, v double"
        )
        state = rollup_state(old_df, ["g"], "v")
        diff = diff_snapshots(new_df, old_df, "id")
        maintained = maintain_rollup(state, diff, ["g"], "v")
        assert _state_map(maintained) == {("y",): (8.0, 2, 2)}

    def test_delta_plan_never_scans_state_wide(self, spark):
        """The maintenance join is keyed on the group columns — the
        delta aggregation must shuffle diff-sized data only (no
        re-aggregation of the fact table in the plan)."""
        old_df, new_df = self._frames(spark, 5)
        state = rollup_state(old_df, ["g"], "v").localCheckpoint()
        diff = diff_snapshots(new_df, old_df, "id")
        plan = (
            maintain_rollup(state, diff, ["g"], "v")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan

    def test_multi_column_groups(self, spark):
        old_df = spark.createDataFrame(
            [(1, "x", "p", 2.0), (2, "x", "q", 3.0), (3, "y", "p", 4.0)],
            "id long, g1 string, g2 string, v double",
        )
        new_df = spark.createDataFrame(
            [(1, "x", "q", 2.0), (3, "y", "p", 6.0), (4, "y", "q", 1.0)],
            "id long, g1 string, g2 string, v double",
        )
        state = rollup_state(old_df, ["g1", "g2"], "v")
        diff = diff_snapshots(new_df, old_df, "id")
        maintained = maintain_rollup(state, diff, ["g1", "g2"], "v")
        recomputed = rollup_state(new_df, ["g1", "g2"], "v")
        assert _state_map(maintained) == _state_map(recomputed)

    def test_null_group_keys_merge(self, spark):
        """NULL is a regular group to groupBy — the maintenance join
        must match it too (a plain join would split the NULL group
        into a stale state row plus an unmerged delta row)."""
        old_df = spark.createDataFrame(
            [(1, None, 5.0), (2, "a", 3.0)], "id long, g string, v double"
        )
        new_df = spark.createDataFrame(
            [(1, None, 7.0), (2, "a", 3.0), (3, None, 1.0)],
            "id long, g string, v double",
        )
        state = rollup_state(old_df, ["g"], "v")
        diff = diff_snapshots(new_df, old_df, "id")
        maintained = maintain_rollup(state, diff, ["g"], "v")
        recomputed = rollup_state(new_df, ["g"], "v")
        assert _state_map(maintained) == _state_map(recomputed)

    def test_all_null_value_group_sums_to_null(self, spark):
        """SQL SUM over a group holding only NULL values is NULL; the
        maintained state must agree (n_vals tracking), not fabricate
        a 0 — in both directions: a group BECOMING all-NULL and a
        group LEAVING the all-NULL condition."""
        old_df = spark.createDataFrame(
            [(1, "a", 5.0), (2, "a", None), (3, "b", None)],
            "id long, g string, v double",
        )
        # 'a' loses its only non-null value (update 1 -> NULL);
        # 'b' gains its first non-null value (insert 4)
        new_df = spark.createDataFrame(
            [(1, "a", None), (2, "a", None), (3, "b", None), (4, "b", 2.0)],
            "id long, g string, v double",
        )
        state = rollup_state(old_df, ["g"], "v")
        diff = diff_snapshots(new_df, old_df, "id")
        maintained = maintain_rollup(state, diff, ["g"], "v")
        recomputed = rollup_state(new_df, ["g"], "v")
        got = _state_map(maintained)
        assert got == _state_map(recomputed)
        assert got[("a",)] == (None, 2, 0)
        assert got[("b",)] == (2.0, 2, 1)


class TestMaintainRollupMinMax:
    """Min/max IVM: non-invertible aggregates maintained monotonically
    where safe, repaired by group-targeted fact re-aggregation where a
    stored bound was removed."""

    def _mm_map(self, df):
        return {
            tuple(
                r[c]
                for c in df.columns
                if c not in ("min_val", "max_val", "n_rows")
            ): (r["min_val"], r["max_val"], r["n_rows"])
            for r in df.collect()
        }

    def _check(self, spark, old_rows, new_rows):
        from mydatasyncer_spark.operators.ivm import (
            maintain_rollup_minmax,
            rollup_state_minmax,
        )

        schema = "id long, g string, v double"
        old_df = spark.createDataFrame(old_rows, schema)
        new_df = spark.createDataFrame(new_rows, schema)
        state = rollup_state_minmax(old_df, ["g"], "v")
        diff = diff_snapshots(new_df, old_df, "id")
        maintained = maintain_rollup_minmax(
            state, diff, new_df, ["g"], "v"
        )
        recomputed = rollup_state_minmax(new_df, ["g"], "v")
        assert self._mm_map(maintained) == self._mm_map(recomputed)
        return maintained

    @pytest.mark.parametrize("seed", [7, 23, 99])
    def test_incremental_equals_recompute_random(self, spark, seed):
        rng = random.Random(seed)
        groups = ["a", "b", "c"]
        old = [
            (i, rng.choice(groups), float(rng.randint(0, 50)))
            for i in range(100)
        ]
        new = []
        for i, g, v in old:
            roll = rng.random()
            if roll < 0.2:
                continue  # delete (sometimes the extremum)
            if roll < 0.4:
                new.append((i, g, float(rng.randint(0, 50))))
            elif roll < 0.5:
                new.append((i, rng.choice(groups), v))  # group move
            else:
                new.append((i, g, v))
        new += [
            (500 + k, rng.choice(groups + ["d"]), float(rng.randint(0, 50)))
            for k in range(10)
        ]
        self._check(spark, old, new)

    def test_delete_of_minimum_repairs_group(self, spark):
        old = [(1, "a", 1.0), (2, "a", 5.0), (3, "a", 9.0)]
        new = [(2, "a", 5.0), (3, "a", 9.0)]  # min row deleted
        self._check(spark, old, new)

    def test_interior_removal_needs_no_repair(self, spark):
        """Removing a value strictly inside (min, max) must not mark
        the group damaged — the monotone pass suffices."""
        from mydatasyncer_spark.operators.ivm import (
            damaged_groups,
            rollup_state_minmax,
        )

        schema = "id long, g string, v double"
        old_df = spark.createDataFrame(
            [(1, "a", 1.0), (2, "a", 5.0), (3, "a", 9.0), (4, "b", 2.0)],
            schema,
        )
        new_df = spark.createDataFrame(
            [(1, "a", 1.0), (3, "a", 9.0), (4, "b", 2.0)], schema
        )
        state = rollup_state_minmax(old_df, ["g"], "v")
        diff = diff_snapshots(new_df, old_df, "id")
        assert damaged_groups(state, diff, ["g"], "v").count() == 0
        self._check(
            spark,
            [(1, "a", 1.0), (2, "a", 5.0), (3, "a", 9.0), (4, "b", 2.0)],
            [(1, "a", 1.0), (3, "a", 9.0), (4, "b", 2.0)],
        )

    def test_group_death_and_birth(self, spark):
        old = [(1, "dying", 3.0), (2, "stay", 7.0)]
        new = [(2, "stay", 7.0), (3, "born", 4.0)]
        got = self._mm_map(self._check(spark, old, new))
        assert ("dying",) not in got
        assert got[("born",)] == (4.0, 4.0, 1)

    def test_update_moves_extremum_between_groups(self, spark):
        # the group-max of 'a' moves to 'b': 'a' repairs, 'b' improves
        old = [(1, "a", 9.0), (2, "a", 1.0), (3, "b", 5.0)]
        new = [(1, "b", 9.0), (2, "a", 1.0), (3, "b", 5.0)]
        got = self._mm_map(self._check(spark, old, new))
        assert got[("a",)] == (1.0, 1.0, 1)
        assert got[("b",)] == (5.0, 9.0, 2)


class TestMaintainJoinView:
    """Maintained equi-join views: maintained state must equal the
    full recompute for inserts, deletes, key-moving updates, and
    duplicate join keys on either side."""

    def _maintain(self, spark, left_old, left_new, right, key):
        from mydatasyncer_spark.operators.diff import diff_snapshots
        from mydatasyncer_spark.operators.ivm import (
            affected_join_keys,
            join_view_state,
            maintain_join_view,
        )

        state = join_view_state(left_old, right, key)
        diff = diff_snapshots(left_new, left_old, "pk")
        keys = affected_join_keys(diff, key)
        return maintain_join_view(state, left_new, right, key, keys)

    def test_key_moving_update_repairs_both_groups(self, spark):
        left_old = spark.createDataFrame(
            [(1, 10, "a"), (2, 20, "b"), (3, 10, "c")],
            "pk long, k long, v string",
        )
        # row 1 MOVES from key group 10 to 20; row 3 deleted; row 4 new
        left_new = spark.createDataFrame(
            [(1, 20, "a"), (2, 20, "b"), (4, 30, "d")],
            "pk long, k long, v string",
        )
        right = spark.createDataFrame(
            [(10, "r10"), (20, "r20"), (30, "r30"), (30, "r30b")],
            "k long, rv string",
        )
        got = self._maintain(spark, left_old, left_new, right, "k")
        want = left_new.join(right, "k")
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0
        # row 4 with duplicate right keys produced both pairs
        assert got.filter("pk = 4").count() == 2

    def test_right_side_change_composes_via_key_union(self, spark):
        from mydatasyncer_spark.operators.diff import diff_snapshots
        from mydatasyncer_spark.operators.ivm import (
            affected_join_keys,
            join_view_state,
            maintain_join_view,
        )

        left = spark.createDataFrame(
            [(1, 10, "a"), (2, 20, "b")], "pk long, k long, v string"
        )
        right_old = spark.createDataFrame(
            [(100, 10, "r1"), (200, 20, "r2")], "rpk long, k long, rv string"
        )
        right_new = spark.createDataFrame(
            [(100, 10, "r1x"), (300, 20, "r3")], "rpk long, k long, rv string"
        )
        state = join_view_state(left, right_old, "k")
        rd = diff_snapshots(right_new, right_old, "rpk")
        keys = affected_join_keys(rd, "k")
        got = maintain_join_view(state, left, right_new, "k", keys)
        want = left.join(right_new, "k")
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0

    def test_left_view_null_pads_stranded_rows(self, spark):
        """Right-side delete strands left rows: the LEFT view's
        affected group recomputes to the null-padded form."""
        from mydatasyncer_spark.operators.diff import diff_snapshots
        from mydatasyncer_spark.operators.ivm import (
            affected_join_keys,
            join_view_state,
            maintain_join_view,
        )

        left = spark.createDataFrame(
            [(1, 10, "a"), (2, 20, "b")], "pk long, k long, v string"
        )
        right_old = spark.createDataFrame(
            [(100, 10, "r1"), (200, 20, "r2")],
            "rpk long, k long, rv string",
        )
        right_new = right_old.filter("rpk != 200")  # strands pk=2
        state = join_view_state(left, right_old, "k", how="left")
        rd = diff_snapshots(right_new, right_old, "rpk")
        keys = affected_join_keys(rd, "k")
        got = maintain_join_view(
            state, left, right_new, "k", keys, how="left"
        )
        want = left.join(right_new, "k", "left")
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0
        [row] = got.filter("pk = 2").collect()
        assert row["rv"] is None and row["rpk"] is None

    def test_left_view_null_join_key_rows_repair(self, spark):
        """NULL-join-key left rows ARE rows of a LEFT view
        (null-padded). The repair's kept/semi legs must match NULL
        null-safely, or an update keeps the stale pre-update row
        while losing the recompute, and an insert vanishes."""
        from mydatasyncer_spark.operators.diff import diff_snapshots
        from mydatasyncer_spark.operators.ivm import (
            affected_join_keys,
            join_view_state,
            maintain_join_view,
        )

        left_old = spark.createDataFrame(
            [(1, None, "a"), (2, 20, "b"), (3, None, "c")],
            "pk long, k long, v string",
        )
        # pk=1: NULL-key row UPDATED in place; pk=3: NULL-key row
        # deleted; pk=4: brand-new NULL-key row; pk=5: keyed row
        # moves TO a NULL key
        left_new = spark.createDataFrame(
            [(1, None, "a2"), (2, None, "b"), (4, None, "d")],
            "pk long, k long, v string",
        )
        right = spark.createDataFrame(
            [(20, "r20")], "k long, rv string"
        )
        state = join_view_state(left_old, right, "k", how="left")
        diff = diff_snapshots(left_new, left_old, "pk")
        keys = affected_join_keys(diff, "k")
        got = maintain_join_view(
            state, left_new, right, "k", keys, how="left"
        )
        want = left_new.join(right, "k", "left")
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0
        # the stale pre-update row is gone, the update/new rows exist
        vals = sorted(
            (r["pk"], r["v"], r["rv"]) for r in got.collect()
        )
        assert vals == [
            (1, "a2", None),
            (2, "b", None),
            (4, "d", None),
        ]

    def test_inner_view_drops_null_key_rows(self, spark):
        """On an INNER view NULL keys never join — repair must not
        resurrect them (the final rejoin stays plain equality)."""
        from mydatasyncer_spark.operators.diff import diff_snapshots
        from mydatasyncer_spark.operators.ivm import (
            affected_join_keys,
            join_view_state,
            maintain_join_view,
        )

        left_old = spark.createDataFrame(
            [(1, 10, "a")], "pk long, k long, v string"
        )
        left_new = spark.createDataFrame(
            [(1, 10, "a"), (2, None, "b")], "pk long, k long, v string"
        )
        right = spark.createDataFrame(
            [(10, "r10")], "k long, rv string"
        )
        state = join_view_state(left_old, right, "k")
        diff = diff_snapshots(left_new, left_old, "pk")
        keys = affected_join_keys(diff, "k")
        got = maintain_join_view(state, left_new, right, "k", keys)
        want = left_new.join(right, "k")
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0
        assert got.filter("pk = 2").count() == 0
