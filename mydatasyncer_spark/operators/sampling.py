"""Deterministic sampling / dataset-split operators (SURVEY.md §7 M4).

A 100 TB training-data pipeline cannot use ``df.sample()`` for
anything that must be reproducible across runs, engines, or
re-partitions: Spark's sampler is seeded per-partition, so the same
row lands in a different split whenever the partitioning changes.
Every operator here derives its decision from a content hash of a
stable id (:func:`mydatasyncer_spark.functions.hashing.hash48`, an
md5-derived 48-bit integer), which makes the assignment

- a pure per-row map (no shuffle, runs inside the scan stage),
- stable under repartitioning / cluster-size changes, and
- exactly reproducible by any engine with md5 (the DuckDB oracles
  recompute identical buckets).

Reference parity note: the reference engine has no sampling surface
at all (SURVEY.md §2.5) — these are beyond-parity operators for the
training-data pipeline pack.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mydatasyncer_spark.functions.hashing import hash48, hash48_sql

# Buckets for split arithmetic: fractions are expressed in 1/10000ths
# so 80/10/10 and 99.5/0.5 style splits are both exact.
SPLIT_BUCKETS = 10_000


def hash_bucket(col: Column, n_buckets: int = SPLIT_BUCKETS, salt: str = "") -> Column:
    """Deterministic bucket in ``[0, n_buckets)`` for a stable id.

    ``salt`` derives independent bucketings from the same id (e.g. a
    sampling decision independent of the split decision).
    """
    keyed = F.concat(col.cast("string"), F.lit(f"|{salt}")) if salt else col
    return F.pmod(hash48(keyed), F.lit(n_buckets))


def hash_bucket_sql(expr: str, n_buckets: int = SPLIT_BUCKETS, salt: str = "") -> str:
    """DuckDB twin of :func:`hash_bucket`."""
    keyed = f"CAST({expr} AS VARCHAR) || '|{salt}'" if salt else expr
    return f"({hash48_sql(keyed)} % {n_buckets})"


def split_column(
    id_col: Column, fractions: dict[str, float], salt: str = "split"
) -> Column:
    """Split-name column ('train' / 'valid' / 'test' / ...) from
    cumulative hash-bucket thresholds. ``fractions`` must sum to 1.0;
    dict order fixes which split absorbs the rounding remainder (the
    final split takes every remaining bucket, so assignments are
    total).
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1.0, got {total}")
    bucket = hash_bucket(id_col, SPLIT_BUCKETS, salt)
    names = list(fractions)
    expr = F.lit(names[-1])  # last split takes the remainder
    cum = 0.0
    thresholds = []
    for name in names[:-1]:
        cum += fractions[name]
        thresholds.append((name, int(round(cum * SPLIT_BUCKETS))))
    for name, threshold in reversed(thresholds):
        expr = F.when(bucket < threshold, F.lit(name)).otherwise(expr)
    return expr


def split_column_sql(
    id_expr: str, fractions: dict[str, float], salt: str = "split"
) -> str:
    """DuckDB twin of :func:`split_column` (identical thresholds)."""
    bucket = hash_bucket_sql(id_expr, SPLIT_BUCKETS, salt)
    names = list(fractions)
    cases = []
    cum = 0.0
    for name in names[:-1]:
        cum += fractions[name]
        cases.append(f"WHEN {bucket} < {int(round(cum * SPLIT_BUCKETS))} THEN '{name}'")
    return "CASE " + " ".join(cases) + f" ELSE '{names[-1]}' END"


def train_test_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float] | None = None,
    out_col: str = "split",
) -> DataFrame:
    """Annotate ``df`` with a deterministic split assignment.

    Narrow (no shuffle): the split is a projection, so at any scale it
    fuses into the scan. Default split is 80/10/10.
    """
    fractions = fractions or {"train": 0.8, "valid": 0.1, "test": 0.1}
    return df.withColumn(out_col, split_column(F.col(id_col), fractions))


def sample_hash(
    df: DataFrame, id_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Deterministic ``fraction`` sample: keep rows whose hash bucket
    falls below ``fraction * SPLIT_BUCKETS``. Unlike ``df.sample``,
    membership is a row property — stable across runs, partitionings,
    and engines."""
    threshold = int(round(fraction * SPLIT_BUCKETS))
    return df.filter(hash_bucket(F.col(id_col), SPLIT_BUCKETS, salt) < threshold)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    size_col: Column | str,
    budget: int,
    partition_col: str | None = None,
    out_col: str = "bin_id",
    n_chunks: int | None = None,
    chunk_splits: list[float] | None = None,
) -> DataFrame:
    """Deterministic contiguous sequence packing for training batches.

    Documents are laid out in ``id_col`` order (within
    ``partition_col`` if given — e.g. pack per language) and cut into
    bins of ``budget`` size units: a row starting at running offset
    ``c`` lands in bin ``c div budget``. A row straddling a boundary
    stays in the bin where it starts, so bins may overflow by at most
    one row — the standard streaming-packing policy. At 100 TB the
    alternative, true first-fit bin packing, is inherently sequential;
    this contiguous layout is the scalable shape training pipelines
    actually use.

    The prefix sum is DISTRIBUTED (a naive
    ``sum(size) over (order by id)`` runs the whole corpus — or a
    whole language — through ONE task): rows are range-chunked on
    ``id_col`` by ``n_chunks - 1`` split points (one
    ``percentile_approx`` aggregate, collected as a bounded list of
    doubles — the same driver-round-trip class as
    ``salted_join_auto``'s top-N), per-(partition, chunk) size sums
    form a bounded cell table whose running sum gives each chunk its
    starting offset, and the per-row offset is that chunk offset plus
    a running sum over only the chunk's own rows — every window here
    partitions on ``(partition_col, _chunk)``, so no task ever sorts
    more than ~corpus/``n_chunks`` rows. The result is bit-identical
    to the single-window form whenever ``id_col`` is unique per
    partition (equal ids always share a chunk, so ties keep the same
    within-window nondeterminism either way).

    ``id_col`` must be numeric for the split-point sampling; for other
    orderable types pass precomputed ``chunk_splits`` (e.g. from table
    stats). ``n_chunks`` defaults to the cluster parallelism.
    """
    size = F.col(size_col) if isinstance(size_col, str) else size_col
    from pyspark.sql.window import Window

    from mydatasyncer_spark.operators.partitioning import (
        cluster_parallelism,
    )

    pcols = [partition_col] if partition_col else []
    sampled_here = False
    if chunk_splits is None:
        if n_chunks is None:
            n_chunks = cluster_parallelism(df)
        dtype = dict(df.dtypes)[id_col]
        if not any(
            t in dtype
            for t in ("int", "long", "short", "byte", "float", "double", "decimal")
        ):
            raise ValueError(
                f"pack_sequences needs a numeric id_col to sample chunk "
                f"split points ({id_col} is {dtype}); pass chunk_splits= "
                "explicitly for non-numeric ids"
            )
        if n_chunks > 1:
            probs = [i / n_chunks for i in range(1, n_chunks)]
            row = df.agg(
                F.percentile_approx(
                    F.col(id_col).cast("double"), probs, 10_000
                ).alias("_s")
            ).collect()[0]
            chunk_splits = sorted(set(row["_s"] or []))
            sampled_here = True
        else:
            chunk_splits = []
    if chunk_splits:
        # splits sampled IN THIS CALL are floats compared against the
        # id cast to double; CALLER-supplied splits always keep their
        # own type and comparison semantics (string/date ids chunk by
        # native ordering; explicit splits win even when n_chunks is
        # also passed), except float literals which naturally compare
        # double
        sampled = sampled_here or isinstance(chunk_splits[0], float)
        id_cmp = (
            F.col(id_col).cast("double") if sampled else F.col(id_col)
        )
        splits_arr = F.array(
            *[
                F.lit(float(s) if sampled else s)
                for s in chunk_splits
            ]
        )
        # strict '<': equal ids always land in the same chunk, so the
        # chunk boundary can never split a tie group
        chunk = F.size(F.filter(splits_arr, lambda s: s < id_cmp)).cast("long")
    else:
        chunk = F.lit(0).cast("long")
    chunked = df.withColumn("_chunk", chunk)
    # bounded cell table: |partition values| x n_chunks rows
    cells = chunked.groupBy(*pcols, "_chunk").agg(
        F.sum(size).cast("long").alias("_cell_sum")
    )
    w_cells = (
        Window.partitionBy(*pcols) if pcols else Window.partitionBy()
    ).orderBy("_chunk").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cell_off = cells.withColumn(
        "_cell_off", F.sum("_cell_sum").over(w_cells) - F.col("_cell_sum")
    ).drop("_cell_sum")
    w_in = (
        Window.partitionBy(*pcols, "_chunk")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_in_chunk = F.sum(size).over(w_in) - size
    return (
        chunked.join(F.broadcast(cell_off), [*pcols, "_chunk"])
        .withColumn(
            "offset", (F.col("_cell_off") + cum_in_chunk).cast("long")
        )
        .withColumn(out_col, (F.col("offset") / F.lit(budget)).cast("long"))
        .select(*df.columns, "offset", out_col)
    )


def mix_weights(
    df: DataFrame, domain_col: str, targets: dict[str, float] | None = None
) -> DataFrame:
    """Per-domain resampling weights to hit a target corpus mixture.

    Returns one row per domain with its observed share and the weight
    ``target_share / observed_share`` a sampler would apply. With no
    ``targets``, the target is the uniform mixture over observed
    domains. Two tiny aggregates (per-domain counts + one global row
    broadcast back) — nothing driver-side, so the plan is identical at
    any scale."""
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("n_docs"))
    totals = counts.agg(
        F.sum("n_docs").cast("double").alias("_total"),
        F.count(F.lit(1)).cast("double").alias("_k"),
    )
    if targets is None:
        target = F.lit(1.0) / F.col("_k")
    else:
        target = F.lit(0.0)
        for value, share in targets.items():
            target = F.when(F.col(domain_col) == value, F.lit(share)).otherwise(
                target
            )
    share = F.col("n_docs").cast("double") / F.col("_total")
    return (
        counts.join(F.broadcast(totals))
        .withColumn("share", share)
        .withColumn("weight", target / share)
        .drop("_total", "_k")
    )


def stratified_sample_hash(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "strata",
) -> DataFrame:
    """Per-stratum deterministic sampling (the `sampleBy` analogue).

    ``fractions`` maps stratum value -> keep fraction. Still a pure
    per-row filter — the stratum lookup is a CASE expression, so the
    whole operator is one narrow pass with predicate pushdown intact.
    """
    bucket = hash_bucket(F.col(id_col), SPLIT_BUCKETS, salt)
    threshold: Column = F.lit(int(round(default_fraction * SPLIT_BUCKETS)))
    for value, frac in fractions.items():
        threshold = F.when(
            F.col(strata_col) == value, F.lit(int(round(frac * SPLIT_BUCKETS)))
        ).otherwise(threshold)
    return df.filter(bucket < threshold)


def cap_per_group(
    df: DataFrame,
    group_col: str,
    n: int,
    order_col: str,
    descending: bool = True,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Quota sampling: keep at most ``n`` rows per group, picked by
    ``order_col`` (best-first when ``descending``) — the corpus
    balancer that stops one domain/language from swamping a mixture.

    One rank window per group (single shuffle on ``group_col``);
    deterministic via the explicit tiebreak (defaults to ``order_col``
    then ``group_col`` order is NOT enough — pass an id column when
    ``order_col`` has duplicates).

    Scale note: because the ``row_number() <= n`` filter sits directly
    on the window, Spark (3.5+) applies its WindowGroupLimit pushdown
    — every map partition pre-filters to its own top-n BEFORE the
    group exchange, so the per-group sort sees at most n × input
    partitions rows, not the whole group (pinned in test_plans).
    :func:`cap_per_group_scalable` is the explicit two-phase form for
    shapes the pushdown cannot rescue (rank consumed without an
    adjacent literal filter, or engines without the rule).
    """
    from pyspark.sql import Window

    order = [
        F.desc(order_col) if descending else F.asc(order_col)
    ]
    if tiebreak_col is not None:
        order.append(F.asc(tiebreak_col))
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= n)
        .drop("_rank")
    )


def apply_mix_weights(
    df: DataFrame,
    weights_df: DataFrame,
    domain_col: str,
    id_col: str,
    base_rate: float = 1.0,
    salt: str = "mix",
) -> DataFrame:
    """Consume :func:`mix_weights` output: deterministically keep each
    document with probability ``min(1, base_rate × weight(domain))``,
    so the sampled corpus lands on the target mixture (up to weights
    that exceed 1/base_rate, which saturate at keep-everything —
    over-represented domains are downsampled exactly; genuinely
    under-represented ones can only be kept whole, not duplicated).

    Deterministic: the keep decision is a salted hash bucket of the
    id, so re-runs (and different partitionings) sample the same
    documents. Plan: one broadcast join of the tiny weight table plus
    a narrow filter — no shuffle of the corpus.
    """
    w = F.broadcast(
        weights_df.select(
            F.col(domain_col).alias("_wd"), F.col("weight").alias("_w")
        )
    )
    keep_p = F.least(F.lit(1.0), F.lit(base_rate) * F.col("_w"))
    bucket = hash_bucket(F.col(id_col), SPLIT_BUCKETS, salt=salt)
    return (
        # null-safe: mix_weights treats a NULL domain as a regular
        # group, so the weight application must match it rather than
        # silently dropping null-domain documents on an inner join
        df.join(w, F.col(domain_col).eqNullSafe(F.col("_wd")))
        .drop("_wd")
        .filter(
            # floor, not round: identical in every engine (round
            # half-up vs half-even would disagree on exact .5 edges)
            bucket
            < F.floor(keep_p * F.lit(float(SPLIT_BUCKETS))).cast("bigint")
        )
        .drop("_w")
    )


def shuffle_order(col: Column, epoch: int = 0, salt: str = "shuffle") -> Column:
    """Deterministic per-epoch shuffle key for a stable id.

    Training-data loaders need the corpus in a pseudo-random order
    that (a) is reproducible across runs/engines/partitionings, and
    (b) differs per epoch. A cross-engine hash of ``id|salt|epoch``
    gives exactly that: ordering by it IS the epoch's shuffle, as a
    row property rather than an RNG state.
    """
    return hash48(
        F.concat(col.cast("string"), F.lit(f"|{salt}|{epoch}"))
    )


def shuffle_order_sql(
    id_expr: str, epoch: int = 0, salt: str = "shuffle"
) -> str:
    """DuckDB twin of :func:`shuffle_order` (identical key values)."""
    return hash48_sql(f"CAST({id_expr} AS VARCHAR) || '|{salt}|{epoch}'")


def epoch_shuffle(
    df: DataFrame, id_col: str, epoch: int = 0, salt: str = "shuffle"
) -> DataFrame:
    """The corpus in epoch ``epoch``'s deterministic shuffle order.

    ``orderBy`` on the hash key is a range-partitioned distributed
    sort (boundary sampling, no driver materialization) — the 100 TB
    cost is one shuffle, and downstream sequential readers stream
    partitions in order. Ties cannot occur between distinct ids in
    48-bit space except with negligible probability; the id tiebreak
    makes the order total even then.
    """
    return df.orderBy(
        shuffle_order(F.col(id_col), epoch, salt), F.col(id_col)
    )


def weighted_sample_key(
    id_col: Column, weight_col: Column, salt: str = "wsample"
) -> Column:
    """Efraimidis-Spirakis A-ES key for weighted sampling WITHOUT
    replacement: ``u^(1/w)`` with ``u`` uniform in (0,1] — taking the
    global top-k by this key draws each row with probability
    proportional to its weight, exactly, in one pass. ``u`` derives
    from the cross-engine hash, so the sample is a row property
    (reproducible across runs, engines, partitionings), and the key is
    rounded to 9 dp so a <=1-ulp ``pow`` difference between engines
    can never reorder it.
    """
    u = (hash48(F.concat(id_col.cast("string"), F.lit(f"|{salt}"))) + 1) / (
        float(2**48) + 1.0
    )
    return F.round(F.pow(u, 1.0 / weight_col), 9)


def weighted_sample_key_sql(
    id_expr: str, weight_expr: str, salt: str = "wsample"
) -> str:
    """DuckDB twin of :func:`weighted_sample_key`."""
    h = hash48_sql(f"CAST({id_expr} AS VARCHAR) || '|{salt}'")
    u = f"(({h} + 1) / {float(2**48) + 1.0!r})"
    return f"round(pow({u}, 1.0 / ({weight_expr})), 9)"


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "wsample",
) -> DataFrame:
    """Top-``k`` weighted sample without replacement (A-ES; see
    :func:`weighted_sample_key`). Rows with non-positive or NULL
    weight are excluded. Scale shape: the key is a narrow projection
    and ``orderBy(...).limit(k)`` plans as TakeOrderedAndProject —
    per-partition top-k then a k-row merge on the driver side of the
    exchange, never a full global sort spill."""
    key = weighted_sample_key(F.col(id_col), F.col(weight_col), salt)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("_wkey", key)
        .orderBy(F.desc("_wkey"), F.col(id_col))
        .limit(k)
    )


def cap_per_group_scalable(
    df: DataFrame,
    group_col: str,
    n: int,
    order_col: str,
    descending: bool = True,
    tiebreak_col: str | None = None,
    fanout: int = 32,
) -> DataFrame:
    """Two-phase twin of :func:`cap_per_group` that never sorts a
    whole group in one task.

    A window partition is one task, so with a handful of groups (the
    realistic language/domain mixture) :func:`cap_per_group` sorts
    each group's ENTIRE corpus in one reducer at scale — the same
    flaw the curriculum tiers had. Here phase 1 ranks within
    (group, salt) cells — each ~1/``fanout`` of the group, salt from
    a deterministic row hash — and keeps ``n`` per cell; phase 2
    ranks the surviving at-most ``fanout * n`` candidates per group
    exactly. The global top-n of a group is always inside the union
    of its cells' top-n, so the result is row-identical to the
    single-window form (both deterministic given a total order —
    pass a ``tiebreak_col`` when ``order_col`` has duplicates).
    """
    from pyspark.sql import Window

    order = [F.desc(order_col) if descending else F.asc(order_col)]
    if tiebreak_col is not None:
        order.append(F.asc(tiebreak_col))
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), fanout)
    w1 = Window.partitionBy(group_col, "_cap_salt").orderBy(*order)
    candidates = (
        df.withColumn("_cap_salt", salt)
        .withColumn("_rank", F.row_number().over(w1))
        .filter(F.col("_rank") <= n)
        .drop("_rank")
    )
    w2 = Window.partitionBy(group_col).orderBy(*order)
    return (
        candidates.withColumn("_rank", F.row_number().over(w2))
        .filter(F.col("_rank") <= n)
        .drop("_rank", "_cap_salt")
    )
