"""Partition-shaping helpers for fan-out-heavy operators.

AQE sizes shuffle partitions by the bytes flowing INTO an exchange.
For a stage whose per-row cost explodes AFTER the exchange (shingle
explode, per-pair cosine, Arrow-batched feature extraction) that
estimate undercounts the work by the fan-out factor, so a small
input collapses to one partition and the whole stage runs on one
core. These helpers pin the width instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cluster_parallelism(df: DataFrame) -> int:
    spark = df.sparkSession
    return max(
        spark.sparkContext.defaultParallelism,
        int(spark.conf.get("spark.sql.shuffle.partitions")),
    )


def fanout_repartition(df: DataFrame, key_col: str) -> DataFrame:
    """Repartition by key with a PINNED partition count before a
    per-row fan-out. A bare ``repartition(col)`` participates in AQE
    coalescing and can collapse to one partition; pinning to the
    cluster's parallelism keeps the fan-out wide. At scale the input
    split count dominates the max, so this stays a no-op-sized
    shuffle of the small pre-fan-out rows."""
    return df.repartition(cluster_parallelism(df), F.col(key_col))


def fanout_spread(df: DataFrame) -> DataFrame:
    """Round-robin variant for fan-outs with no natural key (e.g. a
    probe side that joins against a broadcast build side)."""
    return df.repartition(cluster_parallelism(df))


#: overrides the widening floor of :func:`ensure_min_parallelism`.
#: Unset (default): the cluster parallelism. Set to ``1`` to disable
#: widening entirely — reproduces the at-scale plan shape (where
#: inputs already carry enough splits and the widen never fires) on
#: single-split local fixtures; the bench's shuffle-bytes probes use
#: this so a local-only widening exchange cannot pollute a
#: scale-contract measurement.
MIN_PARALLELISM_CONF = "spark.mydatasyncer.minParallelism"


def ensure_min_parallelism(
    df: DataFrame, *by: str, target: int | None = None
) -> DataFrame:
    """Widen ONLY if the input is narrower than the floor.

    For heavy-payload stages (binary columns into ``mapInPandas``) an
    unconditional repartition would shuffle every payload byte even
    when the source already has thousands of splits — so this checks
    the actual partition count first and is a no-op at scale.

    With ``by`` columns, widens via HASH repartitioning on those
    columns instead of round-robin: no sort-before-repartition on the
    source task (a keyless ``repartition(n)`` locally sorts its input
    first — SPARK-23207 — which serializes exactly the narrow source
    this helper exists to fix), and a downstream join/groupBy keyed
    the same way reuses the exchange (guide §2.4). Pick the dominant
    downstream key.

    ``target`` caps the widened width below the cluster parallelism —
    for stages whose post-exchange work is one cheap pass (not a
    fan-out), a small-input widen to FULL cluster width pays more in
    task-wave scheduling than the extra cores return (measured: on
    single-split sf0.1 fixtures a width-8 widen beat width-32 on an
    8-core AND a 32-core config — the number is data-regime-derived,
    not core-count-derived). The ``MIN_PARALLELISM_CONF`` session
    conf overrides everything (``1`` disables widening)."""
    floor = df.sparkSession.conf.get(MIN_PARALLELISM_CONF, None)
    if floor is not None:
        n = int(floor)
    elif target is not None:
        n = min(target, cluster_parallelism(df))
    else:
        n = cluster_parallelism(df)
    if n <= 1 or df.rdd.getNumPartitions() >= n:
        return df
    if by:
        return df.repartition(n, *[F.col(c) for c in by])
    return df.repartition(n)


def skew_report(
    df: DataFrame, key_col: str, top_n: int = 10
) -> DataFrame:
    """Join/agg-key skew diagnosis: the ``top_n`` heaviest keys with
    their row counts, share of the table, and the ratio to the mean
    key load — the number that says whether this key needs salting
    (ratio >> 1) or AQE's skew-join split will carry it.

    One groupBy + one tiny aggregate, broadcast back over the top-N
    rows; nothing driver-side. Read it as: a 100 TB join shuffling on
    this key puts ``share`` of the table into one task per listed key;
    a ``ratio_to_mean`` of R means that task runs ~R× longer than the
    average — salt by ~ceil(R) to level it.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.agg(
        F.sum("n").cast("double").alias("_total"),
        F.avg("n").alias("_mean"),
    )
    top = (
        counts.orderBy(F.desc("n"), F.asc("key"))
        .limit(top_n)
        .crossJoin(F.broadcast(totals))
    )
    return top.select(
        "key",
        F.col("n").cast("bigint").alias("n_rows"),
        F.round(F.col("n") / F.col("_total"), 6).alias("share"),
        F.round(F.col("n") / F.col("_mean"), 4).alias("ratio_to_mean"),
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
    hot_keys: list | None = None,
) -> DataFrame:
    """Skew-leveling equi join: the cure :func:`skew_report`
    prescribes when a key's ``ratio_to_mean`` says one shuffle task
    would carry R× the average load (salt by ~ceil(R)).

    The fact side gets a deterministic per-row salt (xxhash64 over the
    whole row, so a hot key's rows scatter across ``n_salts`` sub-keys
    instead of landing in one task); the dim side is replicated once
    per salt via a tiny explode; the join runs on ``(keys..., salt)``
    — still a plain equi join Catalyst distributes normally. Results
    are EXACTLY those of the unsalted join (each fact row matches
    exactly the one replica carrying its salt), which is what the
    contract oracle pins.

    ``hot_keys`` narrows the cost: only fact rows whose key is listed
    get salted and only those keys' dim rows are replicated; the cold
    remainder joins plainly, and the two disjoint halves union. Use
    the ``skew_report`` top-N (a bounded list, fine to collect) — at
    100 TB replicating the WHOLE dim n_salts× is itself a shuffle
    amplifier, so hot-key-only is the scale mode.

    ``how``: ``inner`` or ``left`` (fact-preserving; an unmatched
    fact row survives exactly once since its salt matches exactly one
    replica set), or ``right`` (dim-preserving). A naive right join
    on the salted frames is WRONG — an unmatched dim row survives
    once per replica — and mirroring the roles would replicate the
    huge fact side; instead ``right`` = the salted inner join plus
    the null-padded dim rows whose key has no fact match, where
    "has a match" comes from the DISTINCT fact keys (map-side
    partial aggregation collapses a hot key before its shuffle, so
    the match probe inherits none of the skew the salt exists to
    fix). ``full`` is unsupported BY DESIGN: it would need both
    outer halves at once; compose ``left`` with the ``right``-only
    remainder if you need it.

    NULL join keys never equi-match, so NULL-key rows are routed
    AROUND the join entirely (the as-of join's bypass pattern):
    inner drops them before any shuffle, left emits them null-padded
    via a shuffle-free scan+filter+project leg, and NULL-key dim
    rows are pruned from every join leg. This matters precisely when
    NULL is the hot key — the single most common real-world skew key
    — which previously fell to the cold join and piled its rows into
    one shuffle partition (the straggler the salt exists to kill).
    """
    if how == "right":
        inner = salted_join(
            fact, dim, on, n_salts=n_salts, how="inner", hot_keys=hot_keys
        )
        matched_keys = fact.select(*on).distinct()
        unmatched = dim.join(matched_keys, on, "left_anti")
        fact_types = dict(fact.dtypes)
        keys = list(on)
        fact_rest = [c for c in fact.columns if c not in keys]
        dim_rest = [c for c in dim.columns if c not in keys]
        padded = unmatched.select(
            *keys,
            *[
                F.lit(None).cast(fact_types[c]).alias(c)
                for c in fact_rest
            ],
            *dim_rest,
        )
        return inner.unionByName(padded)
    if how not in ("inner", "left"):
        raise ValueError(
            "salted_join supports how='inner', 'left', or 'right'"
        )
    import functools
    import operator

    # NULL-key bypass: a row with ANY join key NULL matches nothing
    # in an equi join, so it never needs to enter a shuffle. isNull()
    # is two-valued, so the filters below partition fact exactly.
    has_null_key = functools.reduce(
        operator.or_, [F.col(c).isNull() for c in on]
    )
    joinable_fact = fact.filter(~has_null_key)
    joinable_dim = dim.filter(~has_null_key)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), n_salts)
    replicas = F.explode(
        F.sequence(F.lit(0).cast("long"), F.lit(int(n_salts) - 1))
    )
    if hot_keys is None:
        f = joinable_fact.withColumn("_salt", salt.cast("long"))
        d = joinable_dim.select("*", replicas.alias("_salt"))
        joined = f.join(d, [*on, "_salt"], how).drop("_salt")
    else:
        # hot/cold split tests the FIRST join key (the skewed one).
        # A NULL in hot_keys is satisfied by the bypass above — keep
        # the isin list NULL-free so the predicate stays two-valued
        # on the joinable (all-keys-non-null) rows.
        hot_list = [k for k in hot_keys if k is not None]
        if not hot_list:
            joined = joinable_fact.join(joinable_dim, on, how)
        else:
            is_hot = F.col(on[0]).isin(hot_list)
            f_hot = joinable_fact.filter(is_hot).withColumn(
                "_salt", salt.cast("long")
            )
            d_hot = joinable_dim.filter(is_hot).select(
                "*", replicas.alias("_salt")
            )
            hot = f_hot.join(d_hot, [*on, "_salt"], how).drop("_salt")
            cold = joinable_fact.filter(~is_hot).join(
                joinable_dim.filter(~is_hot), on, how
            )
            joined = hot.unionByName(cold)
    if how == "inner":
        return joined
    dim_types = dict(dim.dtypes)
    padded_nulls = fact.filter(has_null_key).select(
        "*",
        *[
            F.lit(None).cast(dim_types[c]).alias(c)
            for c in dim.columns
            if c not in on
        ],
    )
    return joined.unionByName(padded_nulls)


def salted_join_auto(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    how: str = "inner",
    hot_ratio: float = 4.0,
    top_n: int = 20,
    n_salts: int | None = None,
) -> DataFrame:
    """:func:`skew_report` piped into :func:`salted_join`: measure the
    fact side's key skew, salt exactly the keys whose load exceeds
    ``hot_ratio``x the mean, sized by the worst ratio (``n_salts``
    defaults to ceil(max ratio) clamped to [2, 64]).

    The diagnosis costs one aggregate over the fact's key column and
    collects at most ``top_n`` (key, ratio) rows — a bounded driver
    round-trip, same class as the pruned diff's bucket list. When
    nothing crosses ``hot_ratio`` the plain join is returned
    untouched: no replication, no salt column, zero overhead on
    well-distributed keys.
    """
    import math

    report = skew_report(fact.select(on[0]), on[0], top_n=top_n).collect()
    hot = [r for r in report if r["ratio_to_mean"] >= hot_ratio]
    if not hot:
        return fact.join(dim, on, how)
    if n_salts is None:
        worst = max(r["ratio_to_mean"] for r in hot)
        n_salts = min(max(2, math.ceil(worst)), 64)
    return salted_join(
        fact, dim, on, n_salts=n_salts, how=how,
        hot_keys=[r["key"] for r in hot],
    )
