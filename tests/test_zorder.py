"""Z-order clustering: key correctness against an independent Python
Morton reference, and the actual payoff — multi-dimensional file
pruning that a single-column sort cannot deliver."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mydatasyncer_spark.operators.zorder import (
    ZDim,
    write_zordered,
    zorder_key,
)


def _py_morton(vals, dims, bits):
    """Independent reference: quantize + interleave in plain Python."""
    cells = 1 << bits
    qs = []
    for v, d in zip(vals, dims):
        q = int((float(v) - d.lo) / (d.hi - d.lo) * cells // 1)
        qs.append(max(0, min(cells - 1, q)))
    n = len(vals)
    key = 0
    for di, q in enumerate(qs):
        for b in range(bits):
            if q & (1 << b):
                key |= 1 << (b * n + (n - 1 - di))
    return key


class TestZorderKey:
    DIMS = [ZDim(0.0, 100.0), ZDim(0.0, 1000.0)]

    def test_matches_python_reference(self, spark):
        pts = [
            (1, 0.0, 0.0),
            (2, 99.9, 999.9),
            (3, 50.0, 500.0),
            (4, 12.34, 876.5),
            (5, -5.0, 1500.0),  # out of range: clamps, never fails
            (6, 100.0, 1000.0),  # == hi: clamps to top cell
        ]
        df = spark.createDataFrame(pts, "id long, x double, y double")
        got = {
            r["id"]: r["z"]
            for r in df.select(
                "id",
                zorder_key([F.col("x"), F.col("y")], self.DIMS, bits=8).alias(
                    "z"
                ),
            ).collect()
        }
        for pid, x, y in pts:
            assert got[pid] == _py_morton([x, y], self.DIMS, 8), pid

    def test_locality_interleaves_dimensions(self, spark):
        """The defining Morton property: the key's high bits come from
        BOTH dimensions, so a point far away in y can never sort next
        to a point near in x only."""
        df = spark.createDataFrame(
            [(1, 0.0, 0.0), (2, 0.0, 999.0), (3, 1.0, 1.0)],
            "id long, x double, y double",
        )
        got = {
            r["id"]: r["z"]
            for r in df.select(
                "id",
                zorder_key([F.col("x"), F.col("y")], self.DIMS).alias("z"),
            ).collect()
        }
        # (0,0) and (1,1) are z-adjacent; (0,999) is far from both
        assert abs(got[1] - got[3]) < abs(got[1] - got[2])
        assert abs(got[1] - got[3]) < abs(got[3] - got[2])

    def test_dimension_bit_budget_guard(self, spark):
        with pytest.raises(ValueError, match="64-bit"):
            zorder_key(
                [F.lit(1.0)] * 4, [ZDim(0, 1)] * 4, bits=16
            )


class TestZorderedLayout:
    def test_box_predicate_prunes_files(self, spark, tmp_path):
        """A 2-D box predicate over a z-ordered layout must touch far
        fewer files than over an x-sorted layout (where the y half of
        the predicate prunes nothing). input_file_name() only lists
        files that produced rows — pruned files never appear."""
        n = 40_000
        df = spark.range(n).select(
            F.col("id"),
            (F.pmod(F.xxhash64("id"), 10_000) / 100.0).alias("x"),
            (F.pmod(F.xxhash64("id", F.lit(1)), 10_000) / 10.0).alias("y"),
        )
        dims = [ZDim(0.0, 100.0), ZDim(0.0, 1000.0)]
        zpath, xpath = str(tmp_path / "zord"), str(tmp_path / "xsort")
        write_zordered(df, zpath, ["x", "y"], dims, n_files=64)
        (
            df.repartitionByRange(64, "x")
            .sortWithinPartitions("x")
            .write.parquet(xpath)
        )

        def files_touched(path):
            return (
                spark.read.parquet(path)
                .filter(
                    (F.col("x") >= 40) & (F.col("x") < 50)
                    & (F.col("y") >= 400) & (F.col("y") < 500)
                )
                .select(F.input_file_name().alias("f"))
                .distinct()
                .count()
            )

        z_files, x_files = files_touched(zpath), files_touched(xpath)
        # the box is 1% of the space: the z-layout isolates it to a
        # handful of files, the x-sort leaves every x-matching file hot
        assert z_files < x_files
        assert z_files <= 16

    def test_layout_roundtrip_preserves_rows(self, spark, tmp_path):
        df = spark.range(1000).select(
            F.col("id"),
            (F.col("id") % 100).cast("double").alias("x"),
            (F.col("id") % 997).cast("double").alias("y"),
        )
        path = str(tmp_path / "z")
        write_zordered(
            df, path, ["x", "y"], [ZDim(0, 100), ZDim(0, 1000)], n_files=8
        )
        back = spark.read.parquet(path)
        assert back.count() == 1000
        assert set(back.columns) == {"id", "x", "y"}


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_HSETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_coords = st.tuples(
    st.floats(min_value=-50, max_value=150, allow_nan=False),
    st.floats(min_value=-200, max_value=1500, allow_nan=False),
)


@settings(**_HSETTINGS)
@given(st.lists(_coords, min_size=1, max_size=25))
def test_zorder_key_property_matches_reference(spark, pts):
    """Any coordinate list (in-range, out-of-range, boundary floats):
    the Column expression and the Python reference agree exactly."""
    dims = [ZDim(0.0, 100.0), ZDim(0.0, 1000.0)]
    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    got = {
        r["id"]: r["z"]
        for r in df.select(
            "id",
            zorder_key([F.col("x"), F.col("y")], dims, bits=10).alias("z"),
        ).collect()
    }
    for i, (x, y) in enumerate(pts):
        assert got[i] == _py_morton([x, y], dims, 10), (i, x, y)


class TestMergeIntoRangeSorted:
    """Incremental layout maintenance: fold a localized batch into a
    range-sorted layout rewriting ONLY intersecting files."""

    def test_localized_batch_copies_untouched_files(
        self, spark, sf_dir, tmp_path_factory
    ):
        from pyspark.sql import functions as F

        from mydatasyncer_spark.sources.writers import (
            file_key_ranges,
            merge_into_range_sorted,
            write_range_sorted,
        )

        out = tmp_path_factory.mktemp("layout")
        base_path, merged_path = str(out / "v1"), str(out / "v2")
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_totalprice"
        )
        write_range_sorted(o, base_path, ["o_orderkey"], num_files=8)
        top_key = o.agg(F.max("o_orderkey")).collect()[0][0]
        # batch straddles the TOP key range (updates near the end,
        # plus brand-new keys beyond it)
        new = spark.createDataFrame(
            [(top_key - 5 + i, 1.5 * i) for i in range(0, 55)],
            "o_orderkey long, o_totalprice double",
        )
        stats = merge_into_range_sorted(
            spark, base_path, new, merged_path, ["o_orderkey"]
        )
        # only the top range intersects: 7 of 8 files copy untouched
        assert stats["copied"] == 7
        assert stats["rewritten"] == 1
        # content: merged layout == old union new, exactly
        merged = spark.read.parquet(merged_path)
        want = o.unionByName(new)
        assert merged.count() == want.count()
        assert merged.exceptAll(want).count() == 0
        assert want.exceptAll(merged).count() == 0
        # invariant: file key ranges stay non-overlapping
        ranges = sorted(
            (lo, hi)
            for _, lo, hi in file_key_ranges(
                spark, merged_path, "o_orderkey"
            )
        )
        for (_lo, prev_hi), (cur_lo, _hi) in zip(ranges, ranges[1:]):
            assert prev_hi <= cur_lo
        # copied files kept their names (raw copy, not re-encode)
        import os

        base_names = {
            f for f in os.listdir(base_path) if f.startswith("part-")
        }
        merged_names = {
            f for f in os.listdir(merged_path) if f.startswith("part-")
        }
        assert len(base_names & merged_names) == 7

    def test_empty_batch_copies_everything(
        self, spark, sf_dir, tmp_path_factory
    ):
        from mydatasyncer_spark.sources.writers import (
            merge_into_range_sorted,
            write_range_sorted,
        )

        out = tmp_path_factory.mktemp("layout2")
        base_path, merged_path = str(out / "v1"), str(out / "v2")
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_totalprice"
        )
        write_range_sorted(o, base_path, ["o_orderkey"], num_files=4)
        empty = o.limit(0)
        stats = merge_into_range_sorted(
            spark, base_path, empty, merged_path, ["o_orderkey"]
        )
        assert stats["copied"] == 4 and stats["rewritten"] == 0
        assert (
            spark.read.parquet(merged_path).count() == o.count()
        )

    def test_zordered_merge_localized_in_one_dimension(
        self, spark, sf_dir, tmp_path_factory
    ):
        """A batch localized in ONE dimension (recent dates, any
        custkey) is localized on the Z-curve too: most files copy
        untouched and box-predicate content stays exact."""
        from pyspark.sql import functions as F

        from mydatasyncer_spark.operators.zorder import (
            ZDim,
            merge_into_zordered,
            write_zordered,
        )

        out = tmp_path_factory.mktemp("zlayout")
        base_path, merged_path = str(out / "v1"), str(out / "v2")
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey",
            "o_custkey",
            F.col("o_orderdate").cast("timestamp").cast("double").alias("ts"),
        )
        lo, hi = o.agg(F.min("ts"), F.max("ts")).collect()[0]
        dims = [ZDim(0.0, 200000.0), ZDim(float(lo), float(hi) + 1)]
        write_zordered(o, base_path, ["o_custkey", "ts"], dims, n_files=16)
        # batch: a few custkeys, all in the LAST 2% of the date range
        recent = float(hi) - (float(hi) - float(lo)) * 0.02
        new = spark.createDataFrame(
            [(10_000_000 + i, 77 + i, recent + i) for i in range(40)],
            "o_orderkey long, o_custkey long, ts double",
        )
        stats = merge_into_zordered(
            spark, base_path, new, merged_path, ["o_custkey", "ts"], dims
        )
        assert stats["copied"] >= 8  # date-locality -> Z-locality
        merged = spark.read.parquet(merged_path)
        want = o.unionByName(new)
        assert merged.count() == want.count()
        assert merged.exceptAll(want).count() == 0
