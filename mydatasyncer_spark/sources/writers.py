"""Partitioned-output writers — layout control for pipeline outputs.

The naive ``df.write.partitionBy(...)`` lets EVERY task write a file
into EVERY partition directory it has rows for: tasks × partitions
small files, the classic 100 TB output pathology (downstream scans
pay per-file open cost and planning time). These writers shape the
data to the layout first, so file counts are chosen, not accidental.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    files_per_partition: int = 1,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write hive-partitioned output with at most
    ``files_per_partition`` files per partition directory (exactly
    that many when the salt groups land in distinct tasks).

    A repartition on (partition cols [+ salt]) routes all rows of one
    output directory to ``files_per_partition`` tasks — one shuffle,
    then every task writes whole files. Raise ``files_per_partition``
    when single partition values are too big for one file (it also
    bounds per-task memory)."""
    if files_per_partition <= 1:
        shaped = df.repartition(*[F.col(c) for c in partition_cols])
    else:
        from mydatasyncer_spark.operators.partitioning import (
            cluster_parallelism,
        )

        # pmod, not %: Spark's % keeps the dividend's sign, so a raw
        # modulo would yield salts in (-(f-1))..(f-1) — up to 2f-1
        # groups — breaking the files_per_partition contract
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in df.columns]),
            F.lit(files_per_partition),
        )
        # pinned width: a bare repartition(cols) is AQE-coalescible
        # and collapses small inputs to one task, silently reducing
        # every directory to a single file
        shaped = df.withColumn("_salt", salt).repartition(
            max(cluster_parallelism(df), files_per_partition),
            *[F.col(c) for c in partition_cols],
            F.col("_salt"),
        ).drop("_salt")
    (
        shaped.write.format(fmt)
        .partitionBy(*partition_cols)
        .mode(mode)
        .save(path)
    )


def write_clustered(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str],
    files_per_partition: int = 1,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned layout with rows *clustered* on ``sort_cols``
    inside every file.

    Parquet writes min/max stats per row group; a downstream filter on
    a sort column then skips whole row groups (and, with one file per
    partition, whole files). The shape step is the same one-shuffle
    routing as :func:`write_partitioned`; the only addition is a
    task-local sort (``sortWithinPartitions`` — no extra shuffle, the
    sort happens in the writing task's spillable buffer)."""
    if files_per_partition <= 1:
        shaped = df.repartition(*[F.col(c) for c in partition_cols])
    else:
        from mydatasyncer_spark.operators.partitioning import (
            cluster_parallelism,
        )

        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in df.columns]),
            F.lit(files_per_partition),
        )
        shaped = df.withColumn("_salt", salt).repartition(
            max(cluster_parallelism(df), files_per_partition),
            *[F.col(c) for c in partition_cols],
            F.col("_salt"),
        ).drop("_salt")
    (
        shaped.sortWithinPartitions(*partition_cols, *sort_cols)
        .write.format(fmt)
        .partitionBy(*partition_cols)
        .mode(mode)
        .save(path)
    )


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    num_files: int,
    fmt: str = "parquet",
    mode: str = "overwrite",
    write_manifest: bool = True,
) -> None:
    """Total-order layout: ``num_files`` files whose key ranges don't
    overlap (file k's max key <= file k+1's min key), each internally
    sorted.

    ``repartitionByRange`` samples the sort keys to pick balanced
    split points (so skew in the key distribution yields equal-sized
    files, not equal-width ranges), then a task-local sort orders each
    file. Point/range scans on the leading sort column touch one file
    (or a contiguous few) instead of all of them — the layout to feed
    a downstream engine that prunes by footer stats.

    ``write_manifest`` also persists per-file key ranges
    (:func:`write_layout_manifest`, one extra narrow scan) so later
    :func:`merge_into_range_sorted` calls plan from metadata instead
    of re-scanning the layout's key column."""
    (
        df.repartitionByRange(num_files, *[F.col(c) for c in sort_cols])
        .sortWithinPartitions(*sort_cols)
        .write.format(fmt)
        .mode(mode)
        .save(path)
    )
    if write_manifest:
        from pyspark.sql.types import NumericType

        write_layout_manifest(
            spark := df.sparkSession,
            path,
            f"col:{sort_cols[0]}",
            file_key_ranges(spark, path, sort_cols[0], fmt),
            numeric_key=isinstance(
                df.schema[sort_cols[0]].dataType, NumericType
            ),
        )


def compact(
    spark_df: DataFrame,
    path: str,
    target_partitions: int,
    fmt: str = "parquet",
) -> None:
    """Rewrite a dataset into ``target_partitions`` files (small-file
    compaction for an already-written, unpartitioned layout)."""
    spark_df.repartition(target_partitions).write.format(fmt).mode(
        "overwrite"
    ).save(path)


def file_key_ranges(
    spark, path: str, key_col: str, fmt: str = "parquet"
) -> list[tuple[str, float, float]]:
    """Per-file (path, min, max) of ``key_col`` for a written layout.

    One narrow scan — column pruning means only the key column's
    pages are read; a production deployment would read parquet
    footers (or a manifest/metastore) and skip even that, but the
    contract is the same: file-level key ranges as a BOUNDED list
    (one row per file, not per data row).
    """
    df = spark.read.format(fmt).load(path)
    rows = (
        df.groupBy(F.input_file_name().alias("_file"))
        .agg(F.min(key_col).alias("_lo"), F.max(key_col).alias("_hi"))
        .collect()
    )
    return [(r["_file"], r["_lo"], r["_hi"]) for r in rows]


#: hidden-file name (leading underscore): Spark/Hadoop input globbing
#: skips it, so the manifest never pollutes reads of the layout
MANIFEST_NAME = "_layout_manifest.json"


def _hadoop_fs(spark, path: str):
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, p.getFileSystem(conf), p


def write_layout_manifest(
    spark,
    path: str,
    key_sig: str,
    entries: list[tuple[str, float, float]],
    numeric_key: bool | None = None,
) -> None:
    """Persist per-file key ranges next to the layout.

    ``entries`` hold FILE BASENAMES; ``key_sig`` identifies what the
    ranges are ranges *of* (a stored column, or a Z-key with its
    quantization params), so a stale manifest written for a different
    key is never silently trusted. This is the poor-man's Delta/
    Iceberg manifest: with it, incremental-merge PLANNING reads one
    JSON object instead of scanning the key column of the whole
    layout — at 100 TB the difference between a metadata read and a
    full-corpus narrow scan.

    Bounds that aren't losslessly numeric (string/date sort keys —
    valid layouts, just not incrementally mergeable) make this a
    silent NO-OP rather than an error: the layout stays readable and
    a later merge falls back to the :func:`file_key_ranges` scan,
    whose ``_num`` raises the clear incremental-merge message.

    ``numeric_key`` is the caller's DECLARATION from the key
    column's Spark dtype — the reliable signal: ``False`` no-ops,
    ``True`` makes any unconvertible bound RAISE (one bad value must
    not silently degrade every future merge to a full-layout scan).
    Left ``None`` (external callers without a dtype), the decision
    falls back to sniffing ALL bounds: only when EVERY non-null
    bound is non-numeric is the key treated as string/date. MIXED
    bounds then RAISE — deliberately: a mix is far more often a
    numeric key with one corrupt bound (where a silent skip degrades
    every future merge to a full-layout scan) than a string key
    whose lexicographic min/max happen to straddle numeric-looking
    values (lo='123', hi='abc'). A genuinely string-keyed layout
    with such values must pass ``numeric_key=False`` explicitly —
    the sniff also misclassifies a string key whose values ALL look
    numeric, so declaring the dtype is the contract whenever you
    have it."""
    import json as _json
    import os as _os

    def num(v):
        if v is None or isinstance(v, (int, float)):
            return v
        return float(v)  # Decimal and friends

    if numeric_key is False:
        return  # string/date sort key: valid layout, no manifest
    bounds = [v for _, lo, hi in entries for v in (lo, hi) if v is not None]
    convertible = []
    for v in bounds:
        try:
            num(v)
            convertible.append(True)
        except (TypeError, ValueError):
            convertible.append(False)
    if numeric_key is None and bounds and not any(convertible):
        return  # sniffed as string/date key
    if not all(convertible):
        bad = bounds[convertible.index(False)]
        raise ValueError(
            f"layout manifest for numeric key {key_sig!r} has a "
            f"non-numeric bound {bad!r} — refusing to silently drop "
            "the manifest"
        )
    files = {
        _os.path.basename(f): [num(lo), num(hi)]
        for f, lo, hi in entries
    }
    payload = _json.dumps({"key": key_sig, "files": files}, sort_keys=True)
    jvm, fs, _ = _hadoop_fs(spark, path)
    target = jvm.org.apache.hadoop.fs.Path(path, MANIFEST_NAME)
    out = fs.create(target, True)
    try:
        out.write(bytearray(payload.encode("utf-8")))
    finally:
        out.close()


def read_layout_manifest(spark, path: str) -> dict | None:
    """The manifest dict (``{"key": sig, "files": {name: [lo, hi]}}``)
    or None if absent/unreadable."""
    import json as _json

    jvm, fs, _ = _hadoop_fs(spark, path)
    target = jvm.org.apache.hadoop.fs.Path(path, MANIFEST_NAME)
    if not fs.exists(target):
        return None
    stream = fs.open(target)
    baos = jvm.java.io.ByteArrayOutputStream()
    jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, baos, 4096, True)
    try:
        return _json.loads(bytes(baos.toByteArray()).decode("utf-8"))
    except ValueError:
        return None


def manifest_key_ranges(
    spark, path: str, key_sig: str
) -> list[tuple[str, float, float]] | None:
    """Per-file ranges from the layout's manifest, or None when the
    manifest can't be trusted — callers then fall back to the
    :func:`file_key_ranges` scan. Untrusted means: absent, written
    for a DIFFERENT key (wrong column, changed Z quantization), or
    its file set no longer matches the directory listing (a file was
    added or removed outside the maintained write path — trusting a
    stale manifest there would silently DROP the unlisted files from
    the next merged layout version). The listing check costs one
    metadata call, never a data read."""
    m = read_layout_manifest(spark, path)
    if not m or m.get("key") != key_sig:
        return None
    files = m.get("files", {})
    if sorted(files) != sorted(_list_data_files(spark, path)):
        return None
    sep = "" if path.endswith("/") else "/"
    return [
        (f"{path}{sep}{name}", lo, hi)
        for name, (lo, hi) in sorted(files.items())
    ]


def _list_data_files(spark, path: str) -> list[str]:
    """Basenames of the layout's data files (hidden _/. files and
    subdirs excluded)."""
    _, fs, p = _hadoop_fs(spark, path)
    out = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if st.isFile() and not name.startswith(("_", ".")):
            out.append(name)
    return out


def copy_files(
    spark, files: list[str], out_path: str, max_threads: int = 16
) -> None:
    """Raw filesystem copy of data files into ``out_path`` (keeping
    names) — zero decode. The metadata move of incremental layout
    maintenance.

    Copies run CONCURRENTLY on a driver thread pool (each py4j call
    gets its own gateway connection, so the JVM-side ``FileUtil.copy``
    calls genuinely overlap): a petabyte layout's untouched-file list
    is thousands of entries, and a serial per-file RPC loop makes the
    metadata move the bottleneck. On object stores each copy is a
    server-side COPY (S3 CopyObject / GCS rewrite via the FS
    connector) — no data flows through the driver either way, the
    pool only parallelizes the control-plane round trips. A real
    lakehouse deployment replaces this with a manifest edit (Delta /
    Iceberg add-file actions) and copies nothing at all."""
    from concurrent.futures import ThreadPoolExecutor

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path_cls = jvm.org.apache.hadoop.fs.Path
    out_dir = path_cls(out_path)
    fs = jvm.org.apache.hadoop.fs.FileSystem.get(out_dir.toUri(), conf)
    fs.mkdirs(out_dir)

    def one(f: str) -> None:
        src = path_cls(f)
        # resolve the SOURCE's own filesystem: layout versions usually
        # share one store, but a merge reading an hdfs:// (or other-
        # bucket) layout into a local/new-store out_path would hand
        # FileUtil.copy the destination FS for the source and fail on
        # the first cross-scheme path (r14 sweep)
        src_fs = src.getFileSystem(conf)
        jvm.org.apache.hadoop.fs.FileUtil.copy(
            src_fs, src, fs, path_cls(out_path, src.getName()), False, conf
        )

    if not files:
        return
    with ThreadPoolExecutor(min(max_threads, len(files))) as pool:
        # list() forces completion and re-raises the first failure
        list(pool.map(one, files))


def batch_key_intervals(
    new_df: DataFrame, key, n_buckets: int = 4096
) -> list[tuple[float, float]]:
    """The batch's key distribution as a BOUNDED list of closed value
    intervals: the batch [min, max] span is cut into ``n_buckets``
    equal-width cells, the distinct non-empty cells are collected
    (≤ ``n_buckets`` ints — the ``changed_buckets`` driver-round-trip
    class), and adjacent cells merge into maximal intervals.

    This is what makes layout-merge pruning DISTRIBUTION-aware: a
    bimodal batch (backfill cluster + today's cluster) yields two
    tight intervals instead of one keyspace-spanning envelope, so the
    files between the clusters are provably untouched. Returns ``[]``
    for an empty batch; a NON-empty batch whose keys are ALL NULL
    (no numeric span at all — min() is null but rows exist) returns
    the ``[(-inf, -inf)]`` sentinel: NULLs sort first and route to
    the first group, so the sentinel sits below every finite key and
    touches only always-touched (null-lo) files — treating it like
    an empty batch would silently DROP the rows from the merged
    layout. ``key`` must be a numeric Column expression.
    """
    import math

    kd = key.cast("double") if not isinstance(key, str) else F.col(key).cast("double")
    stats = new_df.agg(
        F.min(kd).alias("lo"),
        F.max(kd).alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    if stats["lo"] is None:
        return [] if stats["n"] == 0 else [(float("-inf"), float("-inf"))]
    lo, hi = float(stats["lo"]), float(stats["hi"])
    if math.isnan(lo) or math.isnan(hi):
        # all keys NaN: no usable span — conservatively touch all
        return [(float("-inf"), float("inf"))]
    if hi <= lo:
        return [(lo, hi)]
    w = (hi - lo) / n_buckets
    # NaN keys sort LAST in Spark's ordering (greater than any
    # double), so they get the sentinel cell past the top; NULL keys
    # yield a null cell, are dropped here, and need no interval —
    # they sort FIRST and route to the first group, and any all-null
    # layout file is always-touched independent of intervals
    cell = F.when(F.isnan(kd), F.lit(n_buckets).cast("long")).otherwise(
        F.least(
            F.lit(n_buckets - 1),
            F.floor((kd - F.lit(lo)) / F.lit(w)).cast("long"),
        )
    )
    cells = sorted(
        c
        for c in (
            r[0]
            for r in new_df.select(cell.alias("_c")).distinct().collect()
        )
        if c is not None
    )
    intervals: list[tuple[float, float]] = []
    for c in cells:
        if c >= n_buckets:  # the NaN sentinel
            c_lo, c_hi = hi, float("inf")
        else:
            c_lo, c_hi = lo + c * w, lo + (c + 1) * w
        if intervals and c_lo <= intervals[-1][1]:
            intervals[-1] = (intervals[-1][0], c_hi)
        else:
            intervals.append((c_lo, c_hi))
    return intervals


def plan_merge_groups(
    ranges: list[tuple[str, float, float]],
    intervals: list[tuple[float, float]],
    max_groups: int = 16,
) -> dict:
    """Pure driver-side planning for an incremental layout merge.

    ``ranges``: per-file (path, lo, hi) of the existing layout (lo/hi
    comparable numerics; a null lo marks the file always-touched).
    ``intervals``: the batch's non-empty key intervals from
    :func:`batch_key_intervals`, sorted ascending.

    A file is touched iff some batch interval intersects its [lo, hi]
    — exact up to bucket width, never an envelope. Touched files form
    contiguous RUNS in key order; each run becomes a rewrite group,
    and batch intervals lying purely in gaps become their own fileless
    groups, so rewritten output can never straddle an untouched file's
    range (restoring the non-overlap invariant even for gap-spanning
    batches). If that yields more than ``max_groups`` write jobs,
    adjacent groups merge greedily by fewest interior untouched files
    (which then move into the rewrite set) — bounding job count while
    keeping the rewrite minimal.

    Returns ``{"groups": [{"files": [...], "hi": float}...],
    "untouched": [...]}`` with groups ordered by key coverage;
    ``hi`` is each group's routing upper bound (every batch row
    belongs to the first group whose ``hi`` >= its key, else the
    last group — monotone, so group outputs stay disjoint).
    """
    ordered = sorted(
        ranges, key=lambda r: (r[1] is not None, r[1], r[2])
    )  # null-lo files first; they are always touched

    def hits(flo, fhi) -> bool:
        if flo is None:
            return True
        for ilo, ihi in intervals:
            if ilo > fhi:
                break
            if flo <= ihi and ilo <= fhi:
                return True
        return False

    touched_idx = [i for i, (_, flo, fhi) in enumerate(ordered) if hits(flo, fhi)]
    touched_set = set(touched_idx)
    # contiguous runs of touched files (in key order)
    runs: list[list[int]] = []
    for i in touched_idx:
        if runs and runs[-1][-1] == i - 1:
            runs[-1].append(i)
        else:
            runs.append([i])

    def covered(ilo, ihi) -> bool:
        for i in touched_idx:
            _, flo, fhi = ordered[i]
            if flo is None:
                continue
            if flo <= ihi and ilo <= fhi:
                return True
        return False

    gap_intervals = [(ilo, ihi) for ilo, ihi in intervals if not covered(ilo, ihi)]
    # groups: one per run + one per gap-cluster of pure-gap intervals
    groups: list[dict] = []
    for run in runs:
        files = [ordered[i][0] for i in run]
        # all-null-key files (min==None after null-skipping aggs) sort
        # FIRST in an ascending layout: coverage -inf keeps their
        # group's routing threshold from swallowing real keys
        hi = max(
            (ordered[i][2] for i in run if ordered[i][2] is not None),
            default=float("-inf"),
        )
        lo = min(
            (ordered[i][1] for i in run if ordered[i][1] is not None),
            default=float("-inf"),
        )
        # extend the routing bound over intervals that OVERLAP this
        # run's file coverage but spill into the gap above it — their
        # rows must route here, not to a distant higher group (whose
        # output would then straddle the untouched files between)
        for ilo, ihi in intervals:
            if ilo <= hi and lo <= ihi and ihi > hi:
                hi = ihi
        groups.append({"files": files, "lo": lo, "hi": hi, "_run": run})
    # gap index = number of files entirely below the interval; all
    # pure-gap intervals sharing a gap cluster into ONE fileless
    # group. EXCEPT: a gap BETWEEN two consecutive files of the SAME
    # run lies inside that run's key span — its rows are absorbed by
    # the run's rewrite (creating a separate group there would nest
    # one group's coverage inside another's and break the monotone
    # routing thresholds).
    run_of = {i: r for r, run in enumerate(runs) for i in run}
    by_gap: dict[int, list[tuple[float, float]]] = {}
    for ilo, ihi in gap_intervals:
        g = sum(1 for _, _flo, fhi in ordered if fhi is not None and fhi < ilo)
        if (
            0 < g < len(ordered)
            and run_of.get(g - 1) is not None
            and run_of.get(g - 1) == run_of.get(g)
        ):
            continue  # interior gap of one run: absorbed by its rewrite
        by_gap.setdefault(g, []).append((ilo, ihi))
    for _g, ivs in by_gap.items():
        groups.append(
            {
                "files": [],
                "lo": min(i[0] for i in ivs),
                "hi": max(i[1] for i in ivs),
                "_run": [],
            }
        )
    groups.sort(key=lambda g: g["lo"])
    # cap write-job count: merge the adjacent pair separated by the
    # fewest untouched files (those files join the rewrite set)
    while len(groups) > max_groups:
        best, best_cost = None, None
        for k in range(len(groups) - 1):
            a, b = groups[k], groups[k + 1]
            between = [
                i
                for i in range(len(ordered))
                if i not in touched_set
                and (not a["_run"] or i > a["_run"][-1])
                and (not b["_run"] or i < b["_run"][0])
                and ordered[i][1] is not None
                and ordered[i][1] > a["hi"]
                and ordered[i][2] < b["lo"]
            ]
            cost = len(between)
            if best_cost is None or cost < best_cost:
                best, best_cost = (k, between), cost
        k, between = best
        a, b = groups[k], groups[k + 1]
        for i in between:
            touched_set.add(i)
        merged_run = sorted([*a["_run"], *between, *b["_run"]])
        groups[k : k + 2] = [
            {
                "files": [ordered[i][0] for i in merged_run]
                if merged_run
                else [],
                "lo": min(a["lo"], b["lo"]),
                "hi": max(a["hi"], b["hi"]),
                "_run": merged_run,
            }
        ]
    untouched = [
        ordered[i][0] for i in range(len(ordered)) if i not in touched_set
    ]
    for g in groups:
        g.pop("_run", None)
        g.pop("lo", None)
    return {"groups": groups, "untouched": untouched}


def _merge_layout(
    spark,
    ranges: list[tuple[str, float, float]],
    new_df: DataFrame,
    key,
    out_path: str,
    fmt: str,
    sort_exprs: list,
    n_buckets: int,
    max_groups: int,
    prep=None,
    key_sig: str | None = None,
    max_rows_per_file: int | None = None,
) -> dict:
    """Shared core of the incremental layout merges: plan groups from
    the batch's key distribution, copy untouched files concurrently,
    and rewrite each group with its own range partitioning (so group
    outputs never straddle untouched files). ``prep`` optionally maps
    the combined rewrite frame before the range sort (the Z variant
    injects its key column there). With ``key_sig`` the merged
    layout's manifest is maintained incrementally: untouched files
    carry their stored ranges forward and only the delta-sized
    rewrite output is scanned for new ranges."""
    import os as _os

    kd = (F.col(key) if isinstance(key, str) else key).cast("double")
    raw_key = F.col(key) if isinstance(key, str) else key
    intervals = batch_key_intervals(new_df, kd, n_buckets)
    if not intervals:  # empty batch: everything copies
        copy_files(spark, [f for f, _, _ in ranges], out_path)
        if key_sig is not None:
            write_layout_manifest(spark, out_path, key_sig, ranges)
        return {"copied": len(ranges), "rewritten": 0, "new_files": 0}
    plan = plan_merge_groups(
        [(f, _num(lo), _num(hi)) for f, lo, hi in ranges],
        intervals,
        max_groups,
    )
    groups, untouched = plan["groups"], plan["untouched"]
    copy_files(spark, untouched, out_path)
    # monotone row routing: group k takes keys in (hi_{k-1}, hi_k]
    thresholds = [g["hi"] for g in groups[:-1]]
    if thresholds:
        arr = F.array(*[F.lit(float(t)) for t in thresholds])
        group_of_row = F.size(F.filter(arr, lambda t: t < kd))
    else:
        group_of_row = F.lit(0)
    # persist the routed batch: each group's write re-reads it, and
    # without the pin that re-evaluates the batch's whole upstream
    # lineage (possibly a join) up to max_groups times
    routed = new_df.withColumn("_grp", group_of_row).persist()
    new_files = 0
    try:
        for k, g in enumerate(groups):
            rows = routed.filter(F.col("_grp") == k).drop("_grp")
            if g["files"]:
                rows = (
                    spark.read.format(fmt)
                    .load(g["files"])
                    .unionByName(rows)
                )
            if prep is not None:
                rows = prep(rows)
            n = max(len(g["files"]), 1)
            new_files += n
            writer = (
                rows.repartitionByRange(n, *sort_exprs)
                .sortWithinPartitions(*sort_exprs)
                .drop("_zkey_sort")
                .write.format(fmt)
                .mode("append")
            )
            if max_rows_per_file is not None:
                # splits an over-full range partition into several
                # files at write time — the split points fall inside
                # one task's SORTED stream, so the resulting files stay
                # consecutive and the non-overlap invariant holds. This
                # is what stops the repeated-merge pathology where a
                # daily append into the same key range re-fattens one
                # file forever.
                writer = writer.option(
                    "maxRecordsPerFile", max_rows_per_file
                )
            writer.save(out_path)
    finally:
        # a failed group write must not leak the cached batch for the
        # rest of the session
        routed.unpersist()
    rewritten = len(ranges) - len(untouched)
    if key_sig is not None:
        by_name = {
            _os.path.basename(f): (lo, hi) for f, lo, hi in ranges
        }
        untouched_names = {_os.path.basename(f) for f in untouched}
        entries = [
            (n, *by_name[n]) for n in sorted(untouched_names)
        ]
        new_names = [
            n
            for n in _list_data_files(spark, out_path)
            if n not in untouched_names
        ]
        if new_names:
            sep = "" if out_path.endswith("/") else "/"
            scanned = (
                spark.read.format(fmt)
                .load([f"{out_path}{sep}{n}" for n in new_names])
                .groupBy(F.input_file_name().alias("_file"))
                .agg(
                    F.min(raw_key).alias("_lo"),
                    F.max(raw_key).alias("_hi"),
                )
                .collect()
            )
            entries += [
                (r["_file"], r["_lo"], r["_hi"]) for r in scanned
            ]
        # the merge itself required numeric bounds (plan_merge_groups
        # ran _num over them), so the key is numeric by construction
        write_layout_manifest(
            spark, out_path, key_sig, entries, numeric_key=True
        )
    return {
        "copied": len(untouched),
        "rewritten": rewritten,
        "new_files": new_files,
        "groups": len(groups),
    }


def _num(v):
    """File-range bound -> float for driver-side planning; None passes
    through (null-key files are always rewritten)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return float(v)
    try:
        return float(v)
    except (TypeError, ValueError):
        raise ValueError(
            "incremental layout merge needs numeric layout keys for "
            f"distribution-aware pruning (got {type(v).__name__}); "
            "cast the key or maintain the layout with a full rewrite"
        )


def merge_into_range_sorted(
    spark,
    old_path: str,
    new_df: DataFrame,
    out_path: str,
    sort_cols: list[str],
    fmt: str = "parquet",
    n_buckets: int = 4096,
    max_groups: int = 16,
    max_rows_per_file: int | None = None,
) -> dict:
    """Incremental maintenance of a :func:`write_range_sorted` layout:
    fold ``new_df`` in while REWRITING ONLY the files whose key range
    the new rows actually touch.

    The 100 TB shape: a daily batch lands in a few key ranges of a
    petabyte layout. A full re-sort re-shuffles everything; here the
    untouched files move to the new layout version by concurrent raw
    copy (zero decode — server-side copy on object stores) and only
    the touched ranges go through Spark's range sort. Touched-file
    detection uses the batch's KEY DISTRIBUTION
    (:func:`batch_key_intervals`), not its [min, max] envelope — a
    bimodal batch (backfill + today) rewrites only the files at its
    two clusters, never the untouched span between them. Each
    contiguous run of touched files (and each gap-cluster of brand-new
    keys) is rewritten as its OWN range-partition group, so the merged
    layout keeps the invariant: file ranges don't overlap, rows sorted
    within files — including for gap-spanning batches. ``max_groups``
    caps the write-job count (nearby groups merge, absorbing the few
    files between them).

    Leading ``sort_cols[0]`` drives the pruning (numeric keys; see
    :func:`plan_merge_groups`); the full list orders rows inside
    rewritten files. Planning reads the layout's manifest when one
    matching the key exists (falling back to the
    :func:`file_key_ranges` scan), and the merged layout gets an
    incrementally-maintained manifest — so successive daily merges
    never re-scan the untouched bulk, not even for metadata.
    ``max_rows_per_file`` bounds rewritten file size (Spark's
    ``maxRecordsPerFile``): without it, daily merges into the SAME
    key range would re-fatten one file forever; with it the over-full
    range splits into several still-sorted, still-disjoint files.
    Returns ``{"copied", "rewritten", "new_files", "groups"}``
    (``new_files`` counts range partitions; size-splits can add
    more actual files).
    """
    key = sort_cols[0]
    sig = f"col:{key}"
    ranges = manifest_key_ranges(spark, old_path, sig) or file_key_ranges(
        spark, old_path, key, fmt
    )
    return _merge_layout(
        spark,
        ranges,
        new_df,
        key,
        out_path,
        fmt,
        [F.col(c) for c in sort_cols],
        n_buckets,
        max_groups,
        key_sig=sig,
        max_rows_per_file=max_rows_per_file,
    )
