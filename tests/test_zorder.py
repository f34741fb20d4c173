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


class TestDistributionAwarePruning:
    """The r6 upgrade: touched files come from the batch's key
    DISTRIBUTION, never its [min, max] envelope."""

    def test_bimodal_batch_leaves_midrange_untouched(
        self, spark, sf_dir, tmp_path_factory
    ):
        """A backfill+today shaped batch (two distant key clusters)
        must rewrite only the files at the clusters — an envelope
        would rewrite every file between them."""
        from pyspark.sql import functions as F

        from mydatasyncer_spark.sources.writers import (
            file_key_ranges,
            merge_into_range_sorted,
            write_range_sorted,
        )

        out = tmp_path_factory.mktemp("bimodal")
        base_path, merged_path = str(out / "v1"), str(out / "v2")
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_totalprice"
        )
        write_range_sorted(o, base_path, ["o_orderkey"], num_files=8)
        lo_key, hi_key = o.agg(
            F.min("o_orderkey"), F.max("o_orderkey")
        ).collect()[0]
        # cluster A: bottom keys; cluster B: top keys — envelope spans all
        rows = [(int(lo_key) + i, 9.9) for i in range(20)] + [
            (int(hi_key) - i, 8.8) for i in range(20)
        ]
        new = spark.createDataFrame(
            rows, "o_orderkey long, o_totalprice double"
        )
        stats = merge_into_range_sorted(
            spark, base_path, new, merged_path, ["o_orderkey"]
        )
        # only the two edge files are touched; >= 6 of 8 copy
        assert stats["copied"] >= 6, stats
        assert stats["rewritten"] <= 2, stats
        assert stats["groups"] == 2, stats
        merged = spark.read.parquet(merged_path)
        want = o.unionByName(new)
        assert merged.count() == want.count()
        assert merged.exceptAll(want).count() == 0
        assert want.exceptAll(merged).count() == 0
        # invariant survives the two-group rewrite
        ranges = sorted(
            (lo, hi)
            for _, lo, hi in file_key_ranges(
                spark, merged_path, "o_orderkey"
            )
        )
        for (_lo, prev_hi), (cur_lo, _hi) in zip(ranges, ranges[1:]):
            assert prev_hi <= cur_lo

    def test_gap_spanning_new_keys_keep_invariant(
        self, spark, tmp_path_factory
    ):
        """Brand-new keys landing in a gap BETWEEN untouched files get
        their own fileless rewrite group: interior files still copy
        and no rewritten file straddles an untouched file's range
        (the ADVICE r5 gap-spanning caveat, fixed structurally)."""
        from pyspark.sql import functions as F

        from mydatasyncer_spark.sources.writers import (
            file_key_ranges,
            merge_into_range_sorted,
            write_range_sorted,
        )

        out = tmp_path_factory.mktemp("gap")
        base_path, merged_path = str(out / "v1"), str(out / "v2")
        # keys 0..999 and 3000..3999: a wide hole in the middle
        base = spark.range(0, 1000).union(
            spark.range(3000, 4000)
        ).select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v"))
        write_range_sorted(base, base_path, ["k"], num_files=8)
        # batch entirely inside the hole
        new = spark.createDataFrame(
            [(1500 + i, -1.0) for i in range(50)], "k long, v double"
        )
        stats = merge_into_range_sorted(
            spark, base_path, new, merged_path, ["k"]
        )
        assert stats["copied"] == 8, stats  # nothing existing touched
        assert stats["rewritten"] == 0, stats
        merged = spark.read.parquet(merged_path)
        want = base.unionByName(new)
        assert merged.count() == want.count()
        assert merged.exceptAll(want).count() == 0
        ranges = sorted(
            (lo, hi)
            for _, lo, hi in file_key_ranges(spark, merged_path, "k")
        )
        for (_lo, prev_hi), (cur_lo, _hi) in zip(ranges, ranges[1:]):
            assert prev_hi <= cur_lo

    def test_zordered_bimodal_batch_prunes_between_clusters(
        self, spark, tmp_path_factory
    ):
        """Two Z-distant clusters: the envelope would span nearly the
        whole curve; distribution intervals keep midrange files
        copied."""
        from pyspark.sql import functions as F

        from mydatasyncer_spark.operators.zorder import (
            ZDim,
            merge_into_zordered,
            write_zordered,
        )

        out = tmp_path_factory.mktemp("zbimodal")
        base_path, merged_path = str(out / "v1"), str(out / "v2")
        df = spark.range(20_000).select(
            F.col("id"),
            (F.pmod(F.xxhash64("id"), 1000) / 10.0).alias("x"),
            (F.pmod(F.xxhash64("id", F.lit(7)), 1000).cast("double")).alias("y"),
        )
        dims = [ZDim(0.0, 100.0), ZDim(0.0, 1000.0)]
        write_zordered(df, base_path, ["x", "y"], dims, n_files=32)
        # cluster A near origin, cluster B near the far corner
        rows = [(100_000 + i, 1.0 + i * 0.01, 5.0 + i) for i in range(15)] + [
            (200_000 + i, 98.0 + i * 0.01, 950.0 + i) for i in range(15)
        ]
        new = spark.createDataFrame(rows, "id long, x double, y double")
        stats = merge_into_zordered(
            spark, base_path, new, merged_path, ["x", "y"], dims
        )
        assert stats["copied"] >= 20, stats
        merged = spark.read.parquet(merged_path)
        want = df.unionByName(new)
        assert merged.count() == want.count()
        assert merged.exceptAll(want).count() == 0


class TestCopyFilesConcurrent:
    def test_many_file_copy_is_complete_and_byte_identical(
        self, spark, tmp_path_factory
    ):
        import os

        from mydatasyncer_spark.sources.writers import copy_files

        out = tmp_path_factory.mktemp("cpy")
        src_dir, dst_dir = str(out / "src"), str(out / "dst")
        spark.range(10_000).repartition(64).write.parquet(src_dir)
        files = [
            os.path.join(src_dir, f)
            for f in os.listdir(src_dir)
            if f.startswith("part-")
        ]
        assert len(files) == 64
        copy_files(spark, files, dst_dir)
        for f in files:
            dst = os.path.join(dst_dir, os.path.basename(f))
            with open(f, "rb") as a, open(dst, "rb") as b:
                assert a.read() == b.read(), f

    def test_source_filesystem_resolved_per_source_uri(
        self, spark, tmp_path_factory
    ):
        """r14 sweep pin: copy_files resolves each SOURCE's own
        filesystem from the source path (src.getFileSystem) rather
        than reusing the destination's — a merge reading another
        store's hdfs://-qualified layout into a local out_path handed
        FileUtil.copy the wrong FS for the source. Locally provable
        leg: fully-scheme-qualified file: URIs as sources, bare local
        destination, bytes identical."""
        import os

        from mydatasyncer_spark.sources.writers import copy_files

        out = tmp_path_factory.mktemp("cpy_uri")
        src_dir, dst_dir = str(out / "src"), str(out / "dst")
        spark.range(100).coalesce(2).write.parquet(src_dir)
        files = [
            "file:" + os.path.join(src_dir, f)
            for f in os.listdir(src_dir)
            if f.startswith("part-")
        ]
        assert len(files) == 2
        copy_files(spark, files, dst_dir)
        for f in files:
            local = f[len("file:"):]
            dst = os.path.join(dst_dir, os.path.basename(local))
            with open(local, "rb") as a, open(dst, "rb") as b:
                assert a.read() == b.read(), f


class TestPlanMergeGroups:
    """Driver-side planner unit tests (no Spark jobs)."""

    RANGES = [(f"f{i}", i * 10.0, i * 10.0 + 9.0) for i in range(10)]

    def test_two_clusters_two_groups(self):
        from mydatasyncer_spark.sources.writers import plan_merge_groups

        plan = plan_merge_groups(
            self.RANGES, [(0.0, 5.0), (95.0, 99.0)]
        )
        assert [g["files"] for g in plan["groups"]] == [["f0"], ["f9"]]
        assert len(plan["untouched"]) == 8

    def test_pure_gap_interval_gets_fileless_group(self):
        from mydatasyncer_spark.sources.writers import plan_merge_groups

        # gap between f0 [0,9] and f1 [10,19] does not exist; use
        # sparse ranges instead
        ranges = [("a", 0.0, 9.0), ("b", 50.0, 59.0)]
        plan = plan_merge_groups(ranges, [(20.0, 30.0)])
        assert plan["untouched"] == ["a", "b"]
        assert len(plan["groups"]) == 1
        assert plan["groups"][0]["files"] == []

    def test_max_groups_merges_cheapest_gap(self):
        from mydatasyncer_spark.sources.writers import plan_merge_groups

        # three clusters; cap at 2 groups -> the two clusters with
        # the fewest interior files merge (f0|f2 share one interior
        # file f1; f2..f9 have six between) and absorb the interior
        plan = plan_merge_groups(
            self.RANGES,
            [(0.0, 5.0), (25.0, 26.0), (95.0, 99.0)],
            max_groups=2,
        )
        assert len(plan["groups"]) == 2
        files = sorted(f for g in plan["groups"] for f in g["files"])
        assert files == ["f0", "f1", "f2", "f9"]
        assert sorted(plan["untouched"]) == [
            f"f{i}" for i in range(3, 9)
        ]

    def test_null_lo_files_always_rewritten(self):
        from mydatasyncer_spark.sources.writers import plan_merge_groups

        ranges = [("n", None, None), ("a", 10.0, 19.0)]
        plan = plan_merge_groups(ranges, [(12.0, 13.0)])
        assert plan["untouched"] == []
        files = sorted(f for g in plan["groups"] for f in g["files"])
        assert files == ["a", "n"]


class TestLayoutManifest:
    """Manifest-backed planning: merges read stored per-file ranges
    instead of re-scanning the layout, and maintain them
    incrementally."""

    def test_write_creates_manifest_matching_scan(
        self, spark, tmp_path_factory
    ):
        from pyspark.sql import functions as F

        from mydatasyncer_spark.sources.writers import (
            file_key_ranges,
            manifest_key_ranges,
            write_range_sorted,
        )

        out = str(tmp_path_factory.mktemp("manif") / "v1")
        df = spark.range(5000).select(
            F.col("id").alias("k"), (F.col("id") * 1.5).alias("v")
        )
        write_range_sorted(df, out, ["k"], num_files=6)
        from_manifest = manifest_key_ranges(spark, out, "col:k")
        assert from_manifest is not None
        scan = {
            (os_basename(f), float(lo), float(hi))
            for f, lo, hi in file_key_ranges(spark, out, "k")
        }
        man = {
            (os_basename(f), float(lo), float(hi))
            for f, lo, hi in from_manifest
        }
        assert man == scan
        # a wrong-key signature is never trusted
        assert manifest_key_ranges(spark, out, "col:other") is None

    def test_merge_maintains_manifest_incrementally(
        self, spark, tmp_path_factory
    ):
        from pyspark.sql import functions as F

        from mydatasyncer_spark.sources.writers import (
            file_key_ranges,
            merge_into_range_sorted,
            read_layout_manifest,
            write_range_sorted,
        )

        base = tmp_path_factory.mktemp("manif2")
        v1, v2 = str(base / "v1"), str(base / "v2")
        df = spark.range(5000).select(
            F.col("id").alias("k"), (F.col("id") * 1.5).alias("v")
        )
        write_range_sorted(df, v1, ["k"], num_files=6)
        new = spark.createDataFrame(
            [(4990 + i, -1.0) for i in range(30)], "k long, v double"
        )
        merge_into_range_sorted(spark, v1, new, v2, ["k"])
        m = read_layout_manifest(spark, v2)
        assert m is not None and m["key"] == "col:k"
        # the maintained manifest equals a fresh scan of the merged
        # layout (carried untouched entries + scanned new files)
        scan = {
            (os_basename(f), float(lo), float(hi))
            for f, lo, hi in file_key_ranges(spark, v2, "k")
        }
        man = {
            (n, float(lo), float(hi))
            for n, (lo, hi) in m["files"].items()
        }
        assert man == scan

    def test_zordered_manifest_roundtrip(self, spark, tmp_path_factory):
        from pyspark.sql import functions as F

        from mydatasyncer_spark.operators.zorder import (
            ZDim,
            merge_into_zordered,
            write_zordered,
            zorder_signature,
        )
        from mydatasyncer_spark.sources.writers import (
            manifest_key_ranges,
            read_layout_manifest,
        )

        base = tmp_path_factory.mktemp("manif3")
        v1, v2 = str(base / "v1"), str(base / "v2")
        df = spark.range(4000).select(
            F.col("id"),
            (F.pmod(F.xxhash64("id"), 100).cast("double")).alias("x"),
            (F.pmod(F.xxhash64("id", F.lit(3)), 1000).cast("double")).alias("y"),
        )
        dims = [ZDim(0.0, 100.0), ZDim(0.0, 1000.0)]
        sig = zorder_signature(["x", "y"], dims)
        write_zordered(df, v1, ["x", "y"], dims, n_files=8)
        assert manifest_key_ranges(spark, v1, sig) is not None
        new = spark.createDataFrame(
            [(9_000_000 + i, 1.0, 2.0 + i) for i in range(10)],
            "id long, x double, y double",
        )
        merge_into_zordered(spark, v1, new, v2, ["x", "y"], dims)
        m = read_layout_manifest(spark, v2)
        assert m is not None and m["key"] == sig
        merged = spark.read.parquet(v2)
        want = df.unionByName(new)
        assert merged.count() == want.count()
        assert merged.exceptAll(want).count() == 0


def os_basename(p):
    import os

    return os.path.basename(p)


class TestPlanMergeGroupsProperties:
    """Hypothesis armor for the merge planner: for ANY non-overlapping
    file layout, ANY disjoint batch intervals, and ANY group cap, the
    plan must satisfy the invariants the rewrite relies on."""

    def test_planner_invariants_any_input(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from mydatasyncer_spark.sources.writers import plan_merge_groups

        @st.composite
        def layouts(draw):
            # non-overlapping file ranges built from sorted cut points
            n = draw(st.integers(min_value=0, max_value=10))
            cuts = sorted(
                draw(
                    st.lists(
                        st.integers(min_value=0, max_value=400),
                        min_size=2 * n,
                        max_size=2 * n,
                        unique=True,
                    )
                )
            )
            files = [
                (f"f{i}", float(cuts[2 * i]), float(cuts[2 * i + 1]))
                for i in range(n)
            ]
            m = draw(st.integers(min_value=0, max_value=6))
            icuts = sorted(
                draw(
                    st.lists(
                        st.integers(min_value=-50, max_value=450),
                        min_size=2 * m,
                        max_size=2 * m,
                        unique=True,
                    )
                )
            )
            intervals = [
                (float(icuts[2 * i]), float(icuts[2 * i + 1]))
                for i in range(m)
            ]
            cap = draw(st.integers(min_value=1, max_value=4))
            return files, intervals, cap

        def overlaps(a_lo, a_hi, b_lo, b_hi):
            return a_lo <= b_hi and b_lo <= a_hi

        @settings(max_examples=400, deadline=None)
        @given(layouts())
        def run(case):
            files, intervals, cap = case
            plan = plan_merge_groups(files, intervals, max_groups=cap)
            groups, untouched = plan["groups"], plan["untouched"]
            if intervals:
                assert len(groups) >= 1 or not files
            # (1) partition: every file exactly once
            names = [f for g in groups for f in g["files"]] + untouched
            assert sorted(names) == sorted(f for f, _, _ in files)
            assert len(names) == len(set(names))
            # (2) pruning soundness: untouched files intersect NO interval
            rng = {f: (lo, hi) for f, lo, hi in files}
            for f in untouched:
                flo, fhi = rng[f]
                for ilo, ihi in intervals:
                    assert not overlaps(flo, fhi, ilo, ihi), (f, ilo, ihi)
            # (4) job cap honored
            assert len(groups) <= max(cap, 1)
            # (6) routing thresholds monotone
            his = [g["hi"] for g in groups]
            assert his == sorted(his)
            # (3) no group's files dip under the previous group's
            # routing bound (rewritten output cannot straddle)
            for k in range(1, len(groups)):
                for f in groups[k]["files"]:
                    assert rng[f][0] > groups[k - 1]["hi"], (k, f)
            # (7)+(8): route every interval endpoint; both ends must
            # land in the SAME group, and the resulting output
            # envelope must avoid every untouched file's range
            def route(p):
                for k, g in enumerate(groups):
                    if p <= g["hi"]:
                        return k
                return len(groups) - 1

            envelopes = {}
            for k, g in enumerate(groups):
                los = [rng[f][0] for f in g["files"]]
                his_g = [rng[f][1] for f in g["files"]]
                envelopes[k] = [
                    min(los) if los else None,
                    max(his_g) if his_g else None,
                ]
            for ilo, ihi in intervals:
                k = route(ilo)
                assert route(ihi) == k, (ilo, ihi)
                e = envelopes[k]
                e[0] = ilo if e[0] is None else min(e[0], ilo)
                e[1] = ihi if e[1] is None else max(e[1], ihi)
            for k, (elo, ehi) in envelopes.items():
                if elo is None:
                    continue
                for f in untouched:
                    flo, fhi = rng[f]
                    assert not overlaps(elo, ehi, flo, fhi), (k, f)
            # consecutive output envelopes stay disjoint
            keys = sorted(
                k for k, e in envelopes.items() if e[0] is not None
            )
            for a, b in zip(keys, keys[1:]):
                assert envelopes[a][1] < envelopes[b][0] or (
                    envelopes[a][1] <= envelopes[b][0]
                ), (a, b)

        run()


class TestBatchKeyIntervalsEdges:
    def test_nan_keys_get_conservative_top_interval(self, spark):
        from pyspark.sql import functions as F

        from mydatasyncer_spark.sources.writers import batch_key_intervals

        df = spark.createDataFrame(
            [(1.0,), (2.0,), (float("nan"),)], "k double"
        )
        ivs = batch_key_intervals(df, F.col("k"), n_buckets=8)
        assert ivs[-1][1] == float("inf")  # NaN rows covered past top
        assert ivs[0][0] <= 1.0

    def test_all_nan_batch_touches_everything(self, spark):
        from pyspark.sql import functions as F

        from mydatasyncer_spark.sources.writers import batch_key_intervals

        df = spark.createDataFrame([(float("nan"),)], "k double")
        assert batch_key_intervals(df, F.col("k")) == [
            (float("-inf"), float("inf"))
        ]

    def test_null_keys_dropped_from_intervals(self, spark):
        from pyspark.sql import functions as F

        from mydatasyncer_spark.sources.writers import batch_key_intervals

        df = spark.createDataFrame([(None,), (5.0,), (6.0,)], "k double")
        ivs = batch_key_intervals(df, F.col("k"), n_buckets=4)
        assert ivs and ivs[-1][1] != float("inf")
        assert ivs[0][0] <= 5.0 and ivs[-1][1] >= 6.0

    def test_every_key_lies_in_some_interval(self, spark):
        """Pruning soundness root: any finite batch key must be
        covered by an interval (else a touched file could be missed).
        """
        from pyspark.sql import functions as F

        from mydatasyncer_spark.sources.writers import batch_key_intervals

        keys = [0.0, 0.1, 3.7, 3.8, 100.5, 100.6, -17.0, 55.0]
        df = spark.createDataFrame([(k,) for k in keys], "k double")
        for nb in (1, 2, 7, 4096):
            ivs = batch_key_intervals(df, F.col("k"), n_buckets=nb)
            for k in keys:
                assert any(lo <= k <= hi for lo, hi in ivs), (nb, k)


class TestMaxRowsPerFile:
    def test_repeated_top_range_merges_split_overfull_files(
        self, spark, tmp_path_factory
    ):
        """The repeated-merge pathology: daily appends into the SAME
        key range must not re-fatten one file forever — with
        max_rows_per_file the over-full range splits into several
        still-disjoint sorted files."""
        from pyspark.sql import functions as F

        from mydatasyncer_spark.sources.writers import (
            file_key_ranges,
            merge_into_range_sorted,
            write_range_sorted,
        )

        base = tmp_path_factory.mktemp("growth")
        df = spark.range(0, 4000).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        )
        write_range_sorted(df, str(base / "v0"), ["k"], num_files=8)
        top = 4000
        cur = str(base / "v0")
        for day in range(1, 4):  # three daily appends at the top range
            new = spark.createDataFrame(
                [(top + i, -float(day)) for i in range(800)],
                "k long, v double",
            )
            top += 800
            nxt = str(base / f"v{day}")
            merge_into_range_sorted(
                spark, cur, new, nxt, ["k"], max_rows_per_file=1000
            )
            cur = nxt
        ranges = sorted(
            (lo, hi) for _, lo, hi in file_key_ranges(spark, cur, "k")
        )
        # invariant holds across the splits
        for (_lo, prev_hi), (cur_lo, _hi) in zip(ranges, ranges[1:]):
            assert prev_hi <= cur_lo
        # and no file holds more than the cap
        import pyarrow.parquet as pq
        import glob, os

        counts = [
            pq.read_metadata(f).num_rows
            for f in glob.glob(os.path.join(cur, "*.parquet"))
        ]
        assert max(counts) <= 1000, counts
        got = spark.read.parquet(cur)
        assert got.count() == 4000 + 3 * 800


class TestStaleManifestGuard:
    def test_out_of_band_file_invalidates_manifest(
        self, spark, tmp_path_factory
    ):
        """A file added outside the maintained write path must NOT be
        silently dropped by the next merge: the file-set check
        invalidates the manifest and planning falls back to the scan,
        so the extra rows survive into the merged layout."""
        import shutil

        from pyspark.sql import functions as F

        from mydatasyncer_spark.sources.writers import (
            manifest_key_ranges,
            merge_into_range_sorted,
            write_range_sorted,
        )

        base = tmp_path_factory.mktemp("stale")
        v1, v2 = str(base / "v1"), str(base / "v2")
        df = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        )
        write_range_sorted(df, v1, ["k"], num_files=4)
        assert manifest_key_ranges(spark, v1, "col:k") is not None
        # out-of-band append: rows 5000..5099 land in a file the
        # manifest does not know about
        extra_dir = str(base / "extra")
        spark.range(5000, 5100).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        ).coalesce(1).write.parquet(extra_dir)
        import os

        [extra_file] = [
            f for f in os.listdir(extra_dir) if f.startswith("part-")
        ]
        shutil.copy(
            os.path.join(extra_dir, extra_file),
            os.path.join(v1, extra_file),
        )
        # the guard refuses the stale manifest...
        assert manifest_key_ranges(spark, v1, "col:k") is None
        # ...and the merge sees all 1100 rows
        new = spark.createDataFrame([(200, -1.0)], "k long, v double")
        merge_into_range_sorted(spark, v1, new, v2, ["k"])
        assert spark.read.parquet(v2).count() == 1101


class TestMergeBatchEdges:
    """Regression pins for batch edge cases of the incremental merge."""

    def test_all_null_key_batch_rows_survive_merge(
        self, spark, tmp_path_factory
    ):
        """A non-empty batch whose keys are ALL NULL must not take the
        empty-batch copy-only path (that silently dropped the rows):
        NULLs route to the first group and land in the merged layout."""
        from pyspark.sql import functions as F

        from mydatasyncer_spark.sources.writers import (
            batch_key_intervals,
            merge_into_range_sorted,
            write_range_sorted,
        )

        base = tmp_path_factory.mktemp("nullbatch")
        v1, v2 = str(base / "v1"), str(base / "v2")
        df = spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        )
        write_range_sorted(df, v1, ["k"], num_files=4)
        new = spark.createDataFrame(
            [(None, -1.0), (None, -2.0)], "k long, v double"
        )
        # the sentinel, not the empty list
        assert batch_key_intervals(new, F.col("k")) == [
            (float("-inf"), float("-inf"))
        ]
        stats = merge_into_range_sorted(spark, v1, new, v2, ["k"])
        merged = spark.read.parquet(v2)
        assert merged.count() == 102
        assert merged.filter("k IS NULL").count() == 2
        assert (
            merged.filter("k IS NOT NULL")
            .exceptAll(df)
            .count()
            == 0
        )
        # no finite key range is touched: all four files copy
        assert stats["copied"] == 4

    def test_string_sort_key_layout_writes_without_manifest(
        self, spark, tmp_path_factory
    ):
        """write_range_sorted on a string key is a valid layout; the
        manifest (numeric-only) silently skips instead of raising
        after the data write."""
        import os

        from pyspark.sql import functions as F

        from mydatasyncer_spark.sources.writers import (
            MANIFEST_NAME,
            write_range_sorted,
        )

        path = str(tmp_path_factory.mktemp("strlayout") / "v1")
        df = spark.range(50).select(
            F.concat(F.lit("id-"), F.col("id")).alias("k"),
            (F.col("id") * 1.0).alias("v"),
        )
        write_range_sorted(df, path, ["k"], num_files=3)
        assert spark.read.parquet(path).count() == 50
        assert MANIFEST_NAME not in os.listdir(path)

    def test_date_sort_key_layout_writes_without_manifest(
        self, spark, tmp_path_factory
    ):
        import os

        from pyspark.sql import functions as F

        from mydatasyncer_spark.sources.writers import (
            MANIFEST_NAME,
            write_range_sorted,
        )

        path = str(tmp_path_factory.mktemp("datelayout") / "v1")
        df = spark.range(50).select(
            F.date_add(F.lit("2024-01-01").cast("date"), F.col("id").cast("int")).alias("k"),
            (F.col("id") * 1.0).alias("v"),
        )
        write_range_sorted(df, path, ["k"], num_files=3)
        assert spark.read.parquet(path).count() == 50
        assert MANIFEST_NAME not in os.listdir(path)

    def test_routed_batch_computed_once(self, spark, tmp_path_factory):
        """The per-group write loop must not re-evaluate the batch's
        lineage once per group: the routed frame is persisted, so a
        row-counting UDF in the batch lineage fires exactly once per
        row even when the batch spans several rewrite groups."""
        from pyspark.sql import functions as F
        from pyspark.sql.functions import udf

        from mydatasyncer_spark.sources.writers import (
            merge_into_range_sorted,
            write_range_sorted,
        )

        base = tmp_path_factory.mktemp("once")
        v1, v2 = str(base / "v1"), str(base / "v2")
        df = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        )
        write_range_sorted(df, v1, ["k"], num_files=8)
        acc = spark.sparkContext.accumulator(0)

        @udf("long")
        def tracked(x):
            acc.add(1)
            return x

        # two distant clusters -> at least two rewrite groups
        batch_keys = [5, 6, 7, 990, 991, 992]
        new = (
            spark.createDataFrame([(k,) for k in batch_keys], "k0 long")
            .select(tracked(F.col("k0")).alias("k"), F.lit(-1.0).alias("v"))
        )
        stats = merge_into_range_sorted(spark, v1, new, v2, ["k"])
        assert stats["groups"] >= 2
        assert spark.read.parquet(v2).count() == 1000 + len(batch_keys)
        # exactly 3 passes over the batch: the two bounded planning
        # aggregates of batch_key_intervals + ONE materialization into
        # the persisted routed frame. Without the persist this would
        # be (2 + n_groups) passes — >= 4 evaluations per row here.
        assert acc.value == 3 * len(batch_keys)

    def test_manifest_one_corrupt_bound_raises_not_silently_skips(
        self, spark, tmp_path_factory
    ):
        """r8 (ADVICE): once the probe proved the key numeric, a later
        corrupt bound must RAISE — the old blanket except silently
        dropped the whole manifest, degrading every future merge to a
        full scan. A genuinely string-keyed layout still no-ops."""
        import pytest

        from mydatasyncer_spark.sources.writers import (
            read_layout_manifest,
            write_layout_manifest,
        )

        out = str(tmp_path_factory.mktemp("manifest_probe"))
        with pytest.raises(ValueError):
            write_layout_manifest(
                spark, out, "col:k",
                [("a.parquet", 1.0, 2.0), ("b.parquet", "junk", 4.0)],
            )
        # corrupt bound FIRST must raise too (the r8 review caught a
        # single-probe version silently skipping this position)
        with pytest.raises(ValueError):
            write_layout_manifest(
                spark, out, "col:k",
                [("b.parquet", "junk", 4.0), ("a.parquet", 1.0, 2.0)],
            )
        write_layout_manifest(
            spark, out, "col:k", [("a.parquet", "aa", "bb")]
        )
        assert read_layout_manifest(spark, out) is None

    def test_manifest_key_type_declared_from_dtype(
        self, spark, tmp_path_factory
    ):
        """r8 review: the caller's dtype declaration beats value
        sniffing — a STRING sort key whose values all look numeric
        must NOT get a numeric manifest (lexicographic file ranges
        don't overlap the way numeric ones do), and numeric_key=True
        raises on any corrupt bound."""
        import pytest

        from mydatasyncer_spark.sources.writers import (
            read_layout_manifest,
            write_layout_manifest,
            write_range_sorted,
        )

        base = tmp_path_factory.mktemp("manifest_dtype")
        out = str(base / "strkey")
        df = spark.createDataFrame(
            [(str(i), i) for i in (1, 2, 10, 20, 100)], "k string, v long"
        )
        write_range_sorted(df, out, ["k"], 2)
        assert read_layout_manifest(spark, out) is None  # string key
        out2 = str(base / "declared")
        with pytest.raises(ValueError):
            write_layout_manifest(
                spark, out2, "col:k",
                [("a.parquet", "junk", "more")], numeric_key=True,
            )
        write_layout_manifest(
            spark, out2, "col:k",
            [("a.parquet", 1.0, 2.0)], numeric_key=False,
        )
        assert read_layout_manifest(spark, out2) is None  # declared off
