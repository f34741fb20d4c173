"""Similarity search over embedding columns (SURVEY.md §7 M4).

- :func:`cosine_topk` — exact brute-force top-k: the correctness
  baseline. The query side is broadcast (it is small by construction)
  so the big side streams through without a shuffle; ranking is a
  per-query-key window.
- :func:`lsh_ann_topk` — the scale path: random-hyperplane LSH
  bucketing; candidates only within matching buckets, then exact
  re-rank. Hyperplanes are derived from the deterministic hash48
  family, so results are reproducible across runs and engines.

Vector math uses ``zip_with`` + ``aggregate`` — JVM-side higher-order
functions over ``array<float>``, summing in array order (which is
what makes the DuckDB ``list_dot_product`` oracle agree bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mydatasyncer_spark.operators.partitioning import (
    cluster_parallelism,
    ensure_min_parallelism,
    fanout_spread,
)


def _json_const(payload, ddl: str) -> Column:
    """A constant array as ONE ``from_json('…', ddl)`` expression —
    one py4j round trip AND one expression node through every
    analyzer pass; the optimizer constant-folds it to a single array
    literal before execution. Same doubles bit-for-bit: shortest-repr
    JSON text parses to the identical IEEE double (pinned in tests
    incl. subnormals/extremes). Measured r14 on the inline-PQ plans:
    per-element ``F.lit`` cost ``dim`` py4j calls each,
    ``F.lit(ndarray)`` still one ``__setitem__`` round trip per
    double, and an ``array(…D,…)`` expr string re-walked thousands of
    ``CreateArray`` children per analysis — this form beat all three
    (0.43 s vs 1.0/1.4 s per 24 codebook selects)."""
    import json

    return F.expr(f"from_json('{json.dumps(payload)}', '{ddl}')")


def _arr_lit(vals: list[float]) -> Column:
    """``array<double>`` constant (see :func:`_json_const`)."""
    return _json_const([float(x) for x in vals], "array<double>")


def _mat_lit(rows: list[list[float]]) -> Column:
    """``array<array<double>>`` constant: ONE node for the whole
    codebook (see :func:`_json_const`)."""
    return _json_const(
        [[float(x) for x in r] for r in rows], "array<array<double>>"
    )


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query vector (excluding self).

    Output: (query_id, neighbor_id, rank, cosine). Deterministic
    tie-break: higher cosine first, then smaller neighbor id.
    """
    # Norms are projected per vector BEFORE the join — inside the
    # pair space they would be recomputed |corpus| times per query.
    # The corpus side is round-robin spread so the per-pair work is
    # as wide as the cluster even when the input is one small split.
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("qn"),
    )
    c = fanout_spread(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
            norm(F.col(vec_col)).alias("cn"),
        )
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def hyperplane_values(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: component i of plane p
    maps a 48-bit md5 of ``"p:i"`` into [-1, 1). Computed driver-side
    (the inputs are constants) so Spark and any SQL oracle inline the
    IDENTICAL double literals — bucket ids then agree bit-for-bit."""
    import hashlib

    out = []
    for i in range(dim):
        h = int(hashlib.md5(f"{plane}:{i}".encode()).hexdigest()[:12], 16)
        out.append((h % 2_000_001) / 1_000_000.0 - 1.0)
    return out


def _hyperplane(dim: int, plane: int) -> Column:
    return _arr_lit(hyperplane_values(dim, plane))


def lsh_bucket(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Sign-bit bucket id from ``n_planes`` random hyperplanes."""
    bucket: Column = F.lit(0)
    for p in range(n_planes):
        positive = dot(vec, _hyperplane(dim, p)) > 0
        bucket = bucket + F.when(positive, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket.cast("int")


def lsh_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket,
    then exact cosine re-rank within the bucket.

    At 100 TB the bucket column is precomputed/partitioned-by at
    ingest — :func:`lsh_index` + :func:`lsh_ann_topk_indexed` are
    that path — making each query a partition-pruned scan instead of
    a full pass. Recall tunes with ``n_planes`` (fewer planes →
    bigger buckets → higher recall, more compute).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("qn"),
        lsh_bucket(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    c = fanout_spread(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
            norm(F.col(vec_col)).alias("cn"),
            lsh_bucket(F.col(vec_col), dim, n_planes).alias("bucket"),
        )
    )
    scored = (
        F.broadcast(q)
        .join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


#: metadata keys (on ``neighbor_id``) recording the hash family an
#: LSH index was bucketed under — (dim, n_planes) fully determine
#: the deterministic hyperplanes, so two ints ARE the provenance
_LSH_PLANES_KEY = "lsh_n_planes"
_LSH_DIM_KEY = "lsh_dim"


def lsh_index(
    corpus: DataFrame,
    dim: int,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The storable LSH twin of :func:`ivf_index`: corpus rows
    annotated with their norm and sign-bit bucket, computed once —
    what :func:`lsh_ann_topk`'s docstring promises ("the bucket
    column is precomputed/partitioned-by at ingest"), implemented.

    Write it ``partitionBy("bucket")`` and query with
    :func:`lsh_ann_topk_indexed`. The hash family's ``(dim,
    n_planes)`` ride ``neighbor_id`` metadata (``bucket`` is a
    partition column — rebuilt from directory names on read, so
    metadata there would not survive): the hyperplanes are
    deterministic functions of those two ints
    (:func:`hyperplane_values`), so recording them makes the index
    fully self-describing — readers passed nothing use the right
    family by construction, and a mismatching explicit ``n_planes``
    is REFUSED instead of silently probing buckets from a different
    hash family."""
    meta = {_LSH_PLANES_KEY: int(n_planes), _LSH_DIM_KEY: int(dim)}
    # widen narrow inputs so the hash/norm pass parallelizes; no-op
    # when the source already has splits (see pq_index)
    return ensure_min_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id", metadata=meta),
        F.col(vec_col).alias("cv"),
        norm(F.col(vec_col)).alias("cn"),
        lsh_bucket(F.col(vec_col), dim, n_planes).alias("bucket"),
    )


def _resolve_lsh_family(
    index: DataFrame,
    dim: int,
    n_planes: int | None,
    caller: str,
) -> int:
    """Resolve (and guard) the hyperplane family of an
    :func:`lsh_index`: the recorded plane count wins when the caller
    passes nothing; an explicit ``n_planes`` differing from the
    recorded one, or a ``dim`` differing from the recorded one, is
    REFUSED — buckets under one hyperplane family joined against
    another silently drop every true neighbor. A pre-provenance
    frame resolves to the caller's (or default 8) planes."""
    meta = (
        index.schema["neighbor_id"].metadata
        if "neighbor_id" in index.columns
        else {}
    )
    rec_planes = meta.get(_LSH_PLANES_KEY)
    rec_dim = meta.get(_LSH_DIM_KEY)
    if rec_planes is not None:
        if n_planes is not None and int(n_planes) != int(rec_planes):
            raise ValueError(
                f"{caller}: the index was bucketed with "
                f"{int(rec_planes)} hyperplanes but {int(n_planes)} "
                "were requested — probing it would hash queries into "
                "a different bucket family and silently return wrong "
                "neighbors. Pass the recorded plane count (or "
                "nothing), or rebuild the index"
            )
        n_planes = int(rec_planes)
    elif n_planes is None:
        n_planes = 8
    if rec_dim is not None and int(rec_dim) != int(dim):
        raise ValueError(
            f"{caller}: the index records dim={int(rec_dim)} but "
            f"dim={int(dim)} was passed — the hyperplane family "
            "depends on dim; rebuild the index"
        )
    return int(n_planes)


def lsh_ann_topk_indexed(
    queries: DataFrame,
    index: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_queries: bool = True,
) -> DataFrame:
    """:func:`lsh_ann_topk` against a prebuilt :func:`lsh_index` —
    the corpus is neither re-normed nor re-hashed; only the query
    side computes buckets. Same output, same ranking.

    The hash family resolves from the index itself (pass nothing and
    the recorded ``(dim, n_planes)`` apply by construction); an
    explicit ``n_planes`` differing from the recorded one, or a
    ``dim`` differing from the recorded one, is REFUSED — query
    buckets under one hyperplane family against index buckets from
    another silently returns wrong neighbors, the LSH twin of the
    IVF centroid-fingerprint guard. A pre-provenance index is
    accepted with the caller's (or default) planes.

    ``broadcast_queries=False`` is the corpus-vs-corpus path with
    static probed-bucket pruning, exactly as on
    :func:`ivf_topk_indexed` (bounded collect ≤ 2**n_planes)."""
    n_planes = _resolve_lsh_family(
        index, dim, n_planes, "lsh_ann_topk_indexed"
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("qn"),
        lsh_bucket(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    return _indexed_topk(q, index, k, broadcast_queries)


def ivf_centroid_values(dim: int, c: int) -> list[float]:
    """Deterministic pseudo-random centroid: component i of centroid
    c maps a 48-bit md5 of ``"ivf:c:i"`` into [-1, 1). Driver-side
    constants, so Spark and the SQL oracle inline IDENTICAL literals
    (same trick as :func:`hyperplane_values`). Real deployments train
    k-means centroids and pass them via the ``centroids`` argument of
    :func:`ivf_topk`; determinism here is what makes the cross-engine
    oracle exact."""
    import hashlib

    out = []
    for i in range(dim):
        h = int(hashlib.md5(f"ivf:{c}:{i}".encode()).hexdigest()[:12], 16)
        out.append((h % 2_000_001) / 1_000_000.0 - 1.0)
    return out


def kmeans_centroids(
    corpus: DataFrame,
    dim: int,
    k: int = 8,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: list[list[float]] | None = None,
) -> list[list[float]]:
    """Distributed Lloyd k-means — the trainer for IVF coarse
    quantizers (pass the result as ``centroids=`` to
    :func:`ivf_topk`, whose docstring promises exactly this
    injection point).

    Scale shape: per iteration, assignment is a pure projection
    against broadcast centroid literals (the same array-math scoring
    expression IVF probing uses — no UDF, no shuffle), and the
    re-estimation is ONE groupBy producing ``dim`` per-component sums
    + a count per cluster: k×(dim+1) numbers to the driver, never the
    vectors. Total cost is ``n_iter`` passes over the corpus with a
    k-row aggregate each — the textbook scalable Lloyd layout.

    Init is deterministic: the ``k`` corpus vectors with the smallest
    ``hash48(id)`` (stable across runs, partitionings, and cluster
    sizes). Empty clusters keep their previous centroid.
    """
    from mydatasyncer_spark.functions.hashing import hash48

    if init is not None:
        cens = [list(map(float, cen)) for cen in init]
    else:
        seed_rows = (
            corpus.select(
                F.col(vec_col).alias("v"),
                hash48(F.col(id_col).cast("string")).alias("h"),
            )
            .orderBy("h")
            .limit(k)
            .collect()
        )
        cens = [[float(x) for x in r["v"]] for r in seed_rows]
    v = F.col(vec_col)
    for _ in range(n_iter):
        # nearest centroid by cosine — consistent with how ivf_buckets
        # assigns corpus vectors at query time
        assigned = corpus.select(
            ivf_buckets(v, cens, 1)[0].alias("_c"), v.alias("_v")
        )
        stats = (
            assigned.groupBy("_c")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                *[
                    F.sum(F.element_at(F.col("_v"), i + 1)).alias(f"_s{i}")
                    for i in range(dim)
                ],
            )
            .collect()
        )
        new_cens = [list(cen) for cen in cens]
        for r in stats:
            c = r["_c"] - 1  # ivf_buckets ids are 1-based
            n = r["_n"]
            mean = [r[f"_s{i}"] / n for i in range(dim)] if n > 0 else None
            # an exactly-zero mean cannot be norm-scaled — keep the old
            # centroid (same policy as an empty cluster)
            if mean is not None and any(x != 0.0 for x in mean):
                new_cens[c] = mean
        cens = new_cens
    return cens


def kmeans_inertia(
    corpus: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> float:
    """Sum over the corpus of (1 - cosine to the assigned centroid) —
    the spherical-k-means objective :func:`kmeans_centroids`
    minimizes. One aggregate pass; used by tests to pin convergence."""
    v = F.col(vec_col)
    scores = _ivf_scores(v, centroids)
    best = F.array_max(scores) / norm(v)
    row = corpus.select(
        F.sum(F.lit(1.0) - best).alias("inertia")
    ).first()
    return float(row["inertia"])


def _ivf_inv_norms(centroids: list[list[float]]) -> list[float]:
    import math

    return [1.0 / math.sqrt(sum(x * x for x in cen)) for cen in centroids]


def _scaled_centroids(centroids: list[list[float]]) -> list[list[float]]:
    """Centroids pre-multiplied by their inverse norms (driver-side
    constants): the per-vector assignment score collapses to one dot
    product per centroid, and the SAME scaled literals are inlined in
    the SQL oracle so both engines accumulate identically."""
    inv = _ivf_inv_norms(centroids)
    return [
        [x * inv[c] for x in cen] for c, cen in enumerate(centroids)
    ]


def _ivf_scores(vec: Column, centroids: list[list[float]]) -> Column:
    """array<double> of rounded scaled dots to each centroid. The
    vector's own norm is constant across centroids so it can't change
    the argmax and is left out."""
    scaled = _mat_lit(_scaled_centroids(centroids))
    return F.transform(scaled, lambda cen: F.round(dot(vec, cen), 6))


def ivf_buckets(
    vec: Column, centroids: list[list[float]], n_probe: int = 1
) -> Column:
    """The ``n_probe`` nearest centroid ids (1-based, best first).
    Probe 1 is a plain first-max ``array_position`` — bit-identical
    to the oracle's ``list_position(scores, list_max(scores))``; for
    deeper probes the scores are index-tagged (the two-arg transform
    lambda's SECOND argument is the 0-based array index), sorted
    ascending on (score, -index) so ties break toward the smaller
    index, and the top ``n_probe`` are read off the tail."""
    scores = _ivf_scores(vec, centroids)
    if n_probe == 1:
        return F.array(
            F.array_position(scores, F.array_max(scores)).cast("int")
        )
    n = len(centroids)
    tagged = F.transform(
        scores, lambda s, i: F.struct(s.alias("s"), (-i).alias("ni"))
    )
    best_last = F.array_sort(tagged)
    probes = F.reverse(F.slice(best_last, n - n_probe + 1, n_probe))
    return F.transform(probes, lambda p: (-p.getField("ni") + 1).cast("int"))


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-Flat approximate top-k: corpus vectors live in the bucket
    of their nearest centroid; each query probes its ``n_probe``
    nearest buckets and re-ranks exactly within them.

    The coarse-quantizer counterpart to :func:`lsh_ann_topk`. At
    100 TB the corpus is partitioned/bucketed by centroid id at
    ingest, so a probe-1 query is a partition-pruned scan of ~1/C of
    the data; recall tunes with ``n_probe`` and ``n_probe =
    n_centroids`` degrades gracefully to the exact answer (tested).
    """
    cens = centroids or [
        ivf_centroid_values(dim, c) for c in range(n_centroids)
    ]
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("qn"),
        F.explode(ivf_buckets(F.col(vec_col), cens, n_probe)).alias(
            "bucket"
        ),
    )
    c = fanout_spread(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
            norm(F.col(vec_col)).alias("cn"),
            ivf_buckets(F.col(vec_col), cens, 1)[0].alias("bucket"),
        )
    )
    scored = (
        F.broadcast(q)
        .join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


#: metadata key (on ``neighbor_id``) recording which centroid set an
#: IVF index was bucketed under — the embedding twin of the dedup
#: stores' bucket-modulus provenance
_IVF_FP_KEY = "ivf_centroid_fingerprint"
#: metadata key holding the centroid VALUES themselves (JSON), making
#: the index self-describing — bounded by _IVF_CENS_MAX_NUMBERS
_IVF_CENS_KEY = "ivf_centroids_json"
#: k×dim ceiling for embedding centroid values in metadata (~16k
#: doubles ≈ 300 KB of JSON in the parquet footer); above it only the
#: fingerprint is recorded and callers must pass centroids explicitly
_IVF_CENS_MAX_NUMBERS = 16384


def centroid_fingerprint(centroids: list[list[float]]) -> str:
    """Deterministic fingerprint of a centroid set (exact float
    reprs, order-sensitive — bucket ids are positional). Rides IVF
    index metadata so readers can refuse an index bucketed under
    DIFFERENT centroids: probing such an index silently searches the
    wrong partitions and returns plausible-but-wrong neighbors."""
    import hashlib

    payload = ";".join(
        ",".join(repr(float(x)) for x in cen) for cen in centroids
    )
    return hashlib.md5(payload.encode()).hexdigest()


def recorded_centroids(index: DataFrame) -> list[list[float]] | None:
    """The centroid VALUES an IVF index records in its own metadata
    (:func:`ivf_index` stores them alongside the fingerprint when
    k×dim fits the footer budget) — what makes the index
    SELF-DESCRIBING: readers and restarting streams need no
    centroid config at all, and a config-vs-store mismatch becomes
    impossible rather than merely detected. Returns ``None`` for a
    pre-provenance or over-budget index. A recorded value whose
    fingerprint doesn't match its own recorded fingerprint (mixed
    footer metadata from appends under different quantizers — the
    hazard the append-time guard exists to prevent) raises instead
    of returning either set."""
    import json

    if "neighbor_id" not in index.columns:
        return None
    meta = index.schema["neighbor_id"].metadata
    raw = meta.get(_IVF_CENS_KEY)
    if raw is None:
        return None
    cens = [[float(x) for x in cen] for cen in json.loads(raw)]
    rec_fp = meta.get(_IVF_FP_KEY)
    if rec_fp is not None and rec_fp != centroid_fingerprint(cens):
        raise ValueError(
            "IVF index metadata is inconsistent: the recorded "
            "centroid values do not match the recorded fingerprint — "
            "the store mixes appends from different quantizers; "
            "rebuild it with operators/maintenance.ivf_rebuild"
        )
    return cens


def _resolve_centroids(
    index: DataFrame,
    dim: int,
    n_centroids: int,
    centroids: list[list[float]] | None,
) -> list[list[float]]:
    """Reader-side centroid resolution: explicit ``centroids`` win
    (still provenance-checked), else the index's own recorded
    values, else the deterministic defaults."""
    if centroids is not None:
        return centroids
    rec = recorded_centroids(index)
    if rec is not None:
        return rec
    return [ivf_centroid_values(dim, c) for c in range(n_centroids)]


def _check_ivf_provenance(
    index: DataFrame, cens: list[list[float]], caller: str
) -> None:
    """Fail fast when the index's recorded centroid fingerprint does
    not match the caller's centroids. An index with NO recorded
    fingerprint (pre-provenance store) is accepted as-is — there is
    nothing to validate against; rebuild via ``ivf_rebuild`` to gain
    the guard."""
    if "neighbor_id" not in index.columns:
        return
    rec = index.schema["neighbor_id"].metadata.get(_IVF_FP_KEY)
    if rec is not None and rec != centroid_fingerprint(cens):
        raise ValueError(
            f"{caller}: the IVF index was bucketed under a DIFFERENT "
            "centroid set than the one passed — probing it would "
            "silently search the wrong buckets. Pass the centroids "
            "the index was built with, or retrain-and-rebuild via "
            "operators/maintenance.ivf_rebuild"
        )


def ivf_index(
    corpus: DataFrame,
    dim: int,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """The storable IVF index: corpus rows annotated with their norm
    and nearest-centroid bucket — everything :func:`ivf_topk`
    recomputes per call, computed once.

    Write it partitioned on ``bucket``
    (``sources.writers.write_partitioned(idx, path, ["bucket"])``) and
    query the read-back with :func:`ivf_topk_indexed`: the bucket
    equi-join against the small broadcast query side then prunes index
    partitions at the scan (Spark dynamic partition pruning), so a
    probe-1 query reads ~1/C of the corpus files — the on-disk analog
    of the "partitioned by centroid at ingest" note on
    :func:`ivf_topk`.

    The centroid set's :func:`centroid_fingerprint` rides
    ``neighbor_id`` metadata (a DATA column — ``bucket`` is rebuilt
    from directory names on read, so metadata there would not
    survive): readers refuse an index whose recorded centroids don't
    match theirs instead of silently probing wrong buckets. When
    k×dim fits the footer budget the centroid VALUES ride along too
    (:func:`recorded_centroids`), making the index self-describing:
    :func:`ivf_topk_indexed` and the continuous streams then need no
    centroid config at all."""
    import json

    cens = centroids or [
        ivf_centroid_values(dim, c) for c in range(n_centroids)
    ]
    meta: dict = {_IVF_FP_KEY: centroid_fingerprint(cens)}
    if sum(len(cen) for cen in cens) <= _IVF_CENS_MAX_NUMBERS:
        meta[_IVF_CENS_KEY] = json.dumps(
            [[float(x) for x in cen] for cen in cens]
        )
    # widen narrow inputs so the bucket/norm pass parallelizes; no-op
    # when the source already has splits (see pq_index)
    return ensure_min_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id", metadata=meta),
        F.col(vec_col).alias("cv"),
        norm(F.col(vec_col)).alias("cn"),
        ivf_buckets(F.col(vec_col), cens, 1)[0].alias("bucket"),
    )


def ivf_topk_indexed(
    queries: DataFrame,
    index: DataFrame,
    dim: int,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    broadcast_queries: bool = True,
) -> DataFrame:
    """:func:`ivf_topk` against a prebuilt :func:`ivf_index` — the
    corpus is neither re-normed nor re-assigned; only the query side
    computes buckets. Same output, same ranking.

    Centroids resolve from the index itself when it records them
    (:func:`recorded_centroids` — pass nothing and the right
    quantizer is used by construction); explicit ``centroids`` are
    still accepted and REFUSED on a fingerprint mismatch (query
    buckets under one quantizer against index buckets from another
    silently returns wrong neighbors); a pre-provenance index falls
    back to the deterministic defaults.

    ``broadcast_queries=False`` is the corpus-vs-corpus path: a
    query side too large to broadcast joins by shuffle instead, and
    since dynamic partition pruning cannot be relied on there
    (Spark's DPP is a broadcast-shape heuristic), the
    bucket-partitioned index scan is pruned STATICALLY — the probed
    bucket ids are collected first (bounded: at most the number of
    centroids, regardless of query count) and applied as an explicit
    IN on the partition column, the same planning-time-guaranteed
    contract as the dedup stores' touched-bucket pruning. The extra
    pass over the queries computes only their bucket projection.
    Low-cardinality join keys make the shuffle skew-prone by
    construction (IVF blocking IS per-bucket work) — AQE skew-join
    handles the split; results are identical at both settings."""
    cens = _resolve_centroids(index, dim, n_centroids, centroids)
    _check_ivf_provenance(index, cens, "ivf_topk_indexed")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("qn"),
        F.explode(ivf_buckets(F.col(vec_col), cens, n_probe)).alias(
            "bucket"
        ),
    )
    return _indexed_topk(q, index, k, broadcast_queries)


def _indexed_topk(
    q: DataFrame, index: DataFrame, k: int, broadcast_queries: bool
) -> DataFrame:
    """The shared tail of every bucket-indexed top-k (IVF and LSH):
    bucket equi-join, exact cosine re-rank, per-query window. The
    broadcast path keeps the DPP-eligible shape; the non-broadcast
    (corpus-vs-corpus) path statically prunes the index to the probed
    buckets first — a bounded collect (≤ the bucket-family size: IVF
    centroid count / 2^n_planes for LSH), explicit IN on the
    partition column, planning-time-guaranteed."""
    if broadcast_queries:
        probe = F.broadcast(q)
    else:
        probed = [
            r["bucket"]
            for r in q.select("bucket").distinct().collect()
        ]
        index = index.filter(F.col("bucket").isin(probed))
        probe = q
    scored = (
        probe.join(index, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    block_col: str,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt_factor: int = 8,
) -> DataFrame:
    """Near-duplicate pairs by cosine ≥ threshold within a blocking
    key (label here; LSH bucket or coarse quantizer at scale).

    The within-block self-join is SALTED: side a is keyed by
    ``id % salt_factor``, side b replicated to every salt, and the
    join runs on (block, salt). Join parallelism is then
    #blocks × salt_factor instead of #blocks — a handful of hot
    blocks would otherwise serialize the O(block²) cosine work no
    matter how many executors exist. Both sides are repartitioned to
    a pinned width on the join key so AQE (which only sees the small
    pre-pair-space bytes) cannot coalesce the stage. Norms are
    projected per vector, not per pair."""
    n = cluster_parallelism(df)
    a = df.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        norm(F.col(vec_col)).alias("na"),
        (F.col(id_col) % salt_factor).cast("int").alias("salt"),
    ).repartition(n, "blk", "salt")
    b = df.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        norm(F.col(vec_col)).alias("nb"),
        F.explode(
            F.sequence(F.lit(0), F.lit(salt_factor - 1)).cast("array<int>")
        ).alias("salt"),
    ).repartition(n, "blk", "salt")
    return (
        a.join(b, ["blk", "salt"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def semantic_dedup_pairs(
    corpus: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    salt_factor: int = 8,
    n_probe: int = 1,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs (the published
    embedding-cluster dedup recipe, Abbas et al. 2023,
    arXiv:2303.09540): cluster the corpus with the coarse quantizer
    and compare by exact cosine WITHIN clusters only — the dedup
    modality token-level ops cannot see (paraphrases, translations,
    re-encodings land in the same cluster but share few tokens).

    Composition of the engine's existing pieces, nothing new to
    operate: cluster assignment is :func:`ivf_buckets` probe-1
    against broadcast centroid literals (train with
    :func:`kmeans_centroids`, or rely on the deterministic defaults
    for oracle-checkable runs — the same injection contract as
    :func:`ivf_topk`), and the within-cluster pair scan is
    :func:`embedding_near_dup_pairs`' salted self-join, so the pair
    space is Σ C(n_c, 2) over clusters — NEVER corpus², and no
    single hot cluster serializes the cosine work. Feed the result
    to ``operators/dedup.dedup_clusters`` /
    :func:`semantic_dedup_survivors` for the keep-one-per-cluster
    decision.

    Caveat inherent to the method (not this implementation): a
    near-dup pair split across two clusters is missed — recall is
    the quantizer's, exactly as published; raise ``n_centroids``
    quality via real k-means training when it matters, or set
    ``n_probe`` > 1: each vector is then assigned to its
    ``n_probe`` nearest clusters and pairs come from any SHARED
    cluster — still never corpus² (pair space ≤ n_probe × the
    probe-1 space; each vector's rows ≤ n_probe), and recall is a
    strict superset of probe-1 (the argmax cluster is in every
    top-n set, so every probe-1 pair survives; boundary pairs whose
    second-nearest clusters meet are the gain). Multi-cluster
    co-membership is deduped, so a pair appears once either way.
    Returns ``(id_a, id_b, cosine)`` with ``id_a < id_b``, cosine
    rounded to 6 places (threshold applied to the rounded value,
    matching :func:`embedding_near_dup_pairs`)."""
    cens = centroids or [
        ivf_centroid_values(dim, c) for c in range(n_centroids)
    ]
    if n_probe <= 1:
        assigned = corpus.select(
            F.col(id_col),
            F.col(vec_col),
            ivf_buckets(F.col(vec_col), cens, 1)[0].alias("_sem_cluster"),
        )
        return embedding_near_dup_pairs(
            assigned, "_sem_cluster", threshold, id_col, vec_col,
            salt_factor,
        )
    assigned = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        F.explode(ivf_buckets(F.col(vec_col), cens, n_probe)).alias(
            "_sem_cluster"
        ),
    )
    # a pair sharing BOTH probed clusters would surface once per
    # shared cluster — identical rows (cosine is pair-determined),
    # so a distinct collapses them
    return embedding_near_dup_pairs(
        assigned, "_sem_cluster", threshold, id_col, vec_col, salt_factor
    ).distinct()


def semantic_dedup_survivors(
    corpus: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    n_probe: int = 1,
) -> DataFrame:
    """Keep one representative per semantic near-dup cluster: the
    transitive-closure survivor selection every other dedup modality
    in the engine uses (``dedup_clusters`` minimum-id components +
    anti-join), applied to :func:`semantic_dedup_pairs`. Returns the
    surviving corpus rows unchanged."""
    from mydatasyncer_spark.operators.dedup import dedup_clusters

    pairs = semantic_dedup_pairs(
        corpus, dim, threshold, n_centroids, id_col, vec_col, centroids,
        n_probe=n_probe,
    )
    clusters = dedup_clusters(pairs)
    dropped = clusters.filter(
        F.col("doc_id") != F.col("cluster_id")
    ).select(F.col("doc_id").alias(id_col))
    return corpus.join(dropped, id_col, "left_anti")


# ---------------------------------------------------------------------------
# Product quantization (IVF-PQ) — the compressed scale path
# ---------------------------------------------------------------------------
#
# At 100 TB the IVF index's dominant cost is no longer WHICH files a
# probe reads (bucket pruning solved that) but HOW MANY BYTES each
# candidate row carries: a 64-float64 vector is 512 bytes, so scoring a
# pruned bucket still streams the full vector payload. Product
# quantization (Jégou, Douze, Schmid, "Product Quantization for Nearest
# Neighbor Search", TPAMI 2011 — public) splits each vector into ``m``
# subvectors, k-means-quantizes each subspace independently, and stores
# only the ``m`` code ids: 64 doubles collapse to 8 one-byte codes
# (+ one stored norm), a ~60x reduction in scored bytes. Queries score
# candidates with an Asymmetric Distance Computation (ADC) lookup
# table — ``m`` table lookups per candidate instead of ``dim``
# multiplies — and an optional exact re-rank touches true vectors only
# for the top-R survivors (a candidate-proportional point-lookup join).
#
# House rules carried over from the IVF/LSH family: all math is
# JVM-side higher-order functions (zip_with/aggregate/transform) over
# broadcast codebook literals — no UDFs; deterministic md5-derived
# default codebooks make the DuckDB oracle bit-exact; the encoded
# corpus is SELF-DESCRIBING (codebooks + coarse centroids ride the
# footer metadata) with fail-fast fingerprint guards, so probing under
# the wrong quantizer is impossible rather than merely detected.

#: metadata key (on ``neighbor_id``) fingerprinting the PQ codebooks a
#: store was encoded under — codes are meaningless under other books
_PQ_FP_KEY = "pq_codebook_fingerprint"
#: metadata key holding the codebook VALUES (JSON) — m*ksub*dsub = dim*ksub
#: doubles (dim 64 x ksub 16 = 1024), far under _IVF_CENS_MAX_NUMBERS
_PQ_BOOKS_KEY = "pq_codebooks_json"
#: metadata flag: codes quantize the RESIDUAL (vec − coarse centroid)
#: instead of the raw vector — the published IVFADC construction.
#: Absent = raw (pre-r11 stores keep their meaning).
_PQ_RES_KEY = "pq_residual"


def pq_codebook_values(
    dim: int, m: int = 8, ksub: int = 16
) -> list[list[list[float]]]:
    """Deterministic pseudo-random PQ codebooks:
    ``books[j][c][i]`` maps a 48-bit md5 of ``"pq:j:c:i"`` into
    [-1, 1) — driver-side constants, so Spark and the SQL oracle
    inline IDENTICAL literals (the :func:`ivf_centroid_values`
    trick). Real deployments train :func:`pq_train` codebooks;
    determinism here is what makes the cross-engine oracle exact."""
    import hashlib

    dsub = dim // m
    books = []
    for j in range(m):
        book = []
        for c in range(ksub):
            cen = []
            for i in range(dsub):
                h = int(
                    hashlib.md5(f"pq:{j}:{c}:{i}".encode()).hexdigest()[:12],
                    16,
                )
                cen.append((h % 2_000_001) / 1_000_000.0 - 1.0)
            book.append(cen)
        books.append(book)
    return books


def _check_books_dim(
    books: list[list[list[float]]], dim: int, caller: str
) -> None:
    """Writer-side twin of ``_resolve_codebooks``'s dim check: refuse
    encoding under books whose m*dsub doesn't equal the declared
    vector dimension (the config error behind degenerate codes)."""
    books_dim = len(books) * len(books[0][0])
    if int(dim) != books_dim:
        raise ValueError(
            f"{caller}: dim {dim} != {books_dim} = m*dsub of the "
            "passed codebooks — encoding would slice degenerate "
            "subvectors; pass books matching the embedding dimension"
        )


def pq_codebook_fingerprint(books: list[list[list[float]]]) -> str:
    """Order-sensitive exact-repr fingerprint of a codebook set (the
    PQ twin of :func:`centroid_fingerprint`): code ids are positional
    per subspace, so any reorder or retrain changes every stored
    code's meaning."""
    import hashlib

    payload = "|".join(
        ";".join(",".join(repr(float(x)) for x in cen) for cen in book)
        for book in books
    )
    return hashlib.md5(payload.encode()).hexdigest()


def _pq_sub(vec: Column, j: int, dsub: int) -> Column:
    """Subvector j (0-based): elements j*dsub+1 .. (j+1)*dsub."""
    return F.slice(vec, j * dsub + 1, dsub)


def _pq_sized_vec(vec: Column, dim: int, caller: str) -> Column:
    """Row-level dimension guard on a vector entering the PQ algebra:
    ``F.slice`` on a short vector returns short/empty subvectors and
    ``zip_with`` null-pads, so a dim/books mismatch would yield null
    or degenerate codes instead of failing — the same hazard class the
    LSH family's wrong-dim refusal covers. One ``size`` comparison per
    row; raises with the offending length in the message."""
    return F.when(F.size(vec) == F.lit(int(dim)), vec).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"{caller}: vector length "
                ),
                F.size(vec).cast("string"),
                F.lit(
                    f" != {int(dim)} = m*dsub of the codebooks — "
                    "slicing a mismatched vector yields degenerate "
                    "codes; encode/score with books matching the "
                    "embedding dimension"
                ),
            )
        )
    )


def _pq_sub_scores(sub: Column, book: list[list[float]]) -> Column:
    """array<double> of round-6 scores against one subspace codebook;
    the argMAX is the L2-argMIN code: with the subvector's own |x|^2
    constant across codes, minimizing |x - c|^2 equals maximizing
    dot(x, c) - |c|^2/2. Same first-max tie-break as
    :func:`ivf_buckets` / the oracle's ``list_position(list_max)``."""
    cens = _mat_lit(book)
    offs = _arr_lit([sum(x * x for x in cen) / 2.0 for cen in book])
    return F.zip_with(cens, offs, lambda c, h: F.round(dot(sub, c) - h, 6))


def pq_codes(vec: Column, books: list[list[list[float]]]) -> Column:
    """array<int> of 1-based code ids, one per subspace — the entire
    stored representation of a vector (plus its norm)."""
    dim = sum(len(book[0]) for book in books)
    dsub = len(books[0][0])
    assert dim == len(books) * dsub
    vec = _pq_sized_vec(vec, dim, "pq_codes")
    cols = []
    for j, book in enumerate(books):
        scores = _pq_sub_scores(_pq_sub(vec, j, dsub), book)
        cols.append(
            F.array_position(scores, F.array_max(scores)).cast("int")
        )
    return F.array(*cols)


def _pq_lut(vec: Column, books: list[list[list[float]]]) -> Column:
    """The query-side ADC lookup table: ``lut[j][c] = round(dot(q_j,
    books[j][c]), 6)`` as array<array<double>> — computed ONCE per
    query row; every candidate is then scored with ``m`` lookups."""
    dsub = len(books[0][0])
    vec = _pq_sized_vec(vec, len(books) * dsub, "pq query LUT")
    luts = []
    for j, book in enumerate(books):
        sub = _pq_sub(vec, j, dsub)
        cens = _mat_lit(book)
        luts.append(F.transform(cens, lambda c: F.round(dot(sub, c), 6)))
    return F.array(*luts)


def _adc_score(codes: Column, lut: Column) -> Column:
    """Sum of the per-subspace LUT entries in subspace order —
    exactly ``dot(q, reconstruction)`` up to round-6 per term, summed
    left-to-right so the SQL oracle's ``+`` chain agrees term-for-
    term."""
    return F.aggregate(
        F.zip_with(codes, lut, lambda c, t: F.element_at(t, c)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_train(
    corpus: DataFrame,
    dim: int,
    m: int = 8,
    ksub: int = 16,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: list[list[list[float]]] | None = None,
) -> list[list[list[float]]]:
    """Distributed per-subspace L2 Lloyd — the codebook trainer for
    :func:`pq_encode` / :func:`pq_index`.

    Scale shape: ONE corpus pass per iteration covers ALL ``m``
    subspaces — each row explodes into its m (subspace, code,
    subvector) assignments against broadcast codebook literals (pure
    higher-order-function projection, no UDF), and the re-estimation
    is one groupBy producing m*ksub rows of dsub sums + a count:
    ``m*ksub*(dsub+2)`` numbers to the driver per iteration (dim 64 /
    m 8 / ksub 16 = ~1.3k), never the vectors. Init is deterministic:
    the ``ksub`` corpus vectors with the smallest ``hash48(id)``,
    sliced per subspace (the :func:`kmeans_centroids` seeding rule).
    Empty codes keep their previous centroid."""
    from mydatasyncer_spark.functions.hashing import hash48

    if dim % m != 0:
        raise ValueError(f"pq_train: dim {dim} not divisible by m {m}")
    dsub = dim // m
    if init is not None:
        books = [
            [list(map(float, cen)) for cen in book] for book in init
        ]
    else:
        seed_rows = (
            corpus.select(
                F.col(vec_col).alias("v"),
                hash48(F.col(id_col).cast("string")).alias("h"),
            )
            .orderBy("h")
            .limit(ksub)
            .collect()
        )
        seeds = [[float(x) for x in r["v"]] for r in seed_rows]
        if len(seeds) < ksub:
            raise ValueError(
                f"pq_train: corpus has only {len(seeds)} vectors; "
                f"ksub={ksub} needs at least that many seeds"
            )
        books = [
            [s[j * dsub : (j + 1) * dsub] for s in seeds]
            for j in range(m)
        ]
    v = F.col(vec_col)
    for _ in range(n_iter):
        exploded = corpus.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("_j"),
                            F.array_position(
                                _pq_sub_scores(
                                    _pq_sub(v, j, dsub), books[j]
                                ),
                                F.array_max(
                                    _pq_sub_scores(
                                        _pq_sub(v, j, dsub), books[j]
                                    )
                                ),
                            )
                            .cast("int")
                            .alias("_c"),
                            _pq_sub(v, j, dsub).alias("_s"),
                        )
                        for j in range(m)
                    ]
                )
            ).alias("e")
        ).select("e._j", "e._c", "e._s")
        stats = (
            exploded.groupBy("_j", "_c")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                *[
                    F.sum(F.element_at(F.col("_s"), i + 1)).alias(f"_s{i}")
                    for i in range(dsub)
                ],
            )
            .collect()
        )
        new_books = [[list(cen) for cen in book] for book in books]
        for r in stats:
            j, c, n = r["_j"], r["_c"] - 1, r["_n"]
            if n > 0:
                new_books[j][c] = [
                    r[f"_s{i}"] / n for i in range(dsub)
                ]
        books = new_books
    return books


def pq_quantization_error(
    corpus: DataFrame,
    books: list[list[list[float]]],
    vec_col: str = "embedding",
) -> float:
    """Mean squared reconstruction error — the objective
    :func:`pq_train` minimizes; one aggregate pass (tests pin that
    training strictly improves it over the deterministic init)."""
    dsub = len(books[0][0])
    v = F.col(vec_col)
    errs = []
    for j, book in enumerate(books):
        sub = _pq_sub(v, j, dsub)
        scores = _pq_sub_scores(sub, book)
        code = F.array_position(scores, F.array_max(scores)).cast("int")
        cens = _mat_lit(book)
        chosen = F.element_at(cens, code)
        errs.append(
            F.aggregate(
                F.zip_with(sub, chosen, lambda x, c: (x - c) * (x - c)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
    total = errs[0]
    for e in errs[1:]:
        total = total + e
    row = corpus.select(F.avg(total).alias("mse")).first()
    return float(row["mse"])


def pq_encode(
    corpus: DataFrame,
    dim: int,
    books: list[list[list[float]]] | None = None,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The flat compressed corpus: ``(neighbor_id, codes, cn)`` —
    ``m`` small ints + one stored norm instead of ``dim`` doubles.
    The codebook VALUES and fingerprint ride ``neighbor_id`` metadata
    (:func:`recorded_codebooks`), so the encoding is SELF-DESCRIBING:
    :func:`pq_adc_topk` needs no codebook config, and scoring codes
    under the wrong books is refused rather than silently wrong
    (over the :func:`_pq_meta` footer budget only the fingerprint
    rides and readers demand explicit ``books=``)."""
    books = books or pq_codebook_values(dim, m, ksub)
    _check_books_dim(books, dim, "pq_encode")
    meta = _pq_meta(books)
    return corpus.select(
        F.col(id_col).alias("neighbor_id", metadata=meta),
        pq_codes(F.col(vec_col), books).alias("codes"),
        norm(F.col(vec_col)).alias("cn"),
    )


def _pq_meta(books: list[list[list[float]]]) -> dict:
    """Codebook provenance for a store's ``neighbor_id`` column: the
    fingerprint always; the VALUES only within the same footer
    budget the IVF side uses (dim*ksub numbers — the default 64x16
    is ~1k doubles, but dim 1024 x ksub 256 would be ~5 MB of JSON
    in every footer and schema). Over budget, readers refuse a
    configless probe and demand explicit ``books=`` (the
    fingerprint still guards them) — the exact
    :func:`recorded_centroids` over-budget contract."""
    import json

    meta: dict = {_PQ_FP_KEY: pq_codebook_fingerprint(books)}
    n_numbers = sum(
        len(cen) for book in books for cen in book
    )
    if n_numbers <= _IVF_CENS_MAX_NUMBERS:
        meta[_PQ_BOOKS_KEY] = json.dumps(
            [[[float(x) for x in cen] for cen in book] for book in books]
        )
    return meta


def recorded_codebooks(
    encoded: DataFrame,
) -> list[list[list[float]]] | None:
    """The codebooks a PQ store records in its own metadata — the
    :func:`recorded_centroids` twin. ``None`` for a pre-provenance
    frame; raises on values that contradict their own recorded
    fingerprint (mixed appends from different quantizers)."""
    import json

    if "neighbor_id" not in encoded.columns:
        return None
    meta = encoded.schema["neighbor_id"].metadata
    raw = meta.get(_PQ_BOOKS_KEY)
    if raw is None:
        return None
    books = [
        [[float(x) for x in cen] for cen in book]
        for book in json.loads(raw)
    ]
    rec_fp = meta.get(_PQ_FP_KEY)
    if rec_fp is not None and rec_fp != pq_codebook_fingerprint(books):
        raise ValueError(
            "PQ store metadata is inconsistent: recorded codebook "
            "values do not match the recorded fingerprint — the store "
            "mixes appends encoded under different codebooks; rebuild "
            "it with operators/maintenance.pq_rebuild"
        )
    return books


def _resolve_codebooks(
    encoded: DataFrame,
    dim: int,
    m: int,
    ksub: int,
    books: list[list[list[float]]] | None,
    caller: str,
) -> list[list[list[float]]]:
    """Reader-side codebook resolution + fail-fast provenance: codes
    are POSITIONS into the books they were encoded under, so scoring
    them under any other books returns plausible-but-wrong neighbors
    — the exact failure mode the dedup stores' modulus guards exist
    for, on the embedding side."""
    def _check_dim(resolved: list[list[list[float]]]):
        books_dim = len(resolved) * len(resolved[0][0])
        if int(dim) != books_dim:
            raise ValueError(
                f"{caller}: dim {dim} != {books_dim} = m*dsub of the "
                "resolved codebooks — a mismatched dim slices "
                "degenerate subvectors; pass the dimension the books "
                "were built for"
            )
        return resolved

    rec = recorded_codebooks(encoded)
    if books is not None:
        if (
            rec is None
            and "neighbor_id" in encoded.columns
            and encoded.schema["neighbor_id"].metadata.get(_PQ_FP_KEY)
            not in (None, pq_codebook_fingerprint(books))
        ):
            raise ValueError(
                f"{caller}: the PQ store was encoded under DIFFERENT "
                "codebooks than the ones passed — ADC lookups would "
                "silently score wrong reconstructions. Pass the books "
                "the store was encoded with, or re-encode via "
                "operators/maintenance.pq_rebuild"
            )
        if rec is not None and pq_codebook_fingerprint(
            rec
        ) != pq_codebook_fingerprint(books):
            raise ValueError(
                f"{caller}: the PQ store records codebooks that do "
                "not match the ones passed — pass nothing (the store "
                "is self-describing) or rebuild via "
                "operators/maintenance.pq_rebuild"
            )
        return _check_dim(books)
    if rec is not None:
        return _check_dim(rec)
    # NO deterministic-default fallback here (unlike the writer
    # side): every pq_encode/pq_index store RECORDS its books, so a
    # codes frame recording none is a stripped-metadata store — the
    # positive-marker lesson from the containment family: scoring
    # codes under guessed books silently returns wrong neighbors.
    raise ValueError(
        f"{caller}: the codes frame records no codebooks and none "
        "were passed — codes are positions into the books they were "
        "encoded under, and scoring them under guessed books is "
        "silently wrong. Pass books= (pq_codebook_values for the "
        "deterministic family) or re-encode via pq_encode/pq_index"
    )


def pq_adc_topk(
    queries: DataFrame,
    encoded: DataFrame,
    dim: int,
    k: int = 5,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    books: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Brute-force ADC top-k over a :func:`pq_encode` corpus — the
    compressed counterpart of :func:`cosine_topk`. Each query
    computes its LUT once (m*ksub round-6 subspace dots); each candidate
    costs ``m`` array lookups + one divide, and the corpus side
    streams only ``(id, m codes, norm)`` — the ~60x byte reduction is
    the whole point at 100 TB. Output ranks by ``adc_cosine`` =
    ADC-dot / (qn * stored cn): the cosine against the candidate's
    RECONSTRUCTION, normalized by its TRUE norm — the standard
    IVFADC estimator; recall bounds live in the tests, exactness
    comes from :func:`pq_topk_indexed`'s refine path.

    A RESIDUAL store is refused: its codes quantize
    ``vec − centroid[bucket]``, so the flat estimator would shift
    every candidate's score by a missing per-bucket centroid term —
    incomparable across buckets, silently mis-ranked. Probe residual
    stores with :func:`pq_topk_indexed` (which applies the term)."""
    if recorded_pq_residual(encoded):
        raise ValueError(
            "pq_adc_topk: the store's codes quantize residuals "
            "(IVFADC) — the flat ADC estimator is missing the "
            "per-bucket centroid term and would silently mis-rank "
            "across buckets; probe with pq_topk_indexed, or "
            "re-encode raw via pq_encode"
        )
    books = _resolve_codebooks(encoded, dim, m, ksub, books, "pq_adc_topk")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _pq_lut(F.col(vec_col), books).alias("lut"),
        norm(F.col(vec_col)).alias("qn"),
    )
    c = fanout_spread(encoded.select("neighbor_id", "codes", "cn"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _adc_score(F.col("codes"), F.col("lut"))
                / (F.col("qn") * F.col("cn")),
                6,
            ).alias("adc_cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc_cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "adc_cosine")
    )


def _cens_lits(cens: list[list[float]]) -> Column:
    """The centroid set as an array<array<double>> literal."""
    return _mat_lit(cens)


def ivf_residuals(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(id, residual)`` under the probe-1 coarse assignment —
    vec − centroid[bucket], the vectors residual codebooks train on
    (:func:`pq_train` over this frame, then
    ``pq_index(residual=True, books=...)``). Pure broadcast-literal
    array math, batch-narrow like :func:`ivf_buckets` itself. The
    raw vector is length-guarded here too: zip_with null-pads a
    short vector to the centroid's length, which would slip PAST the
    downstream codes-side size check and quantize nulls (silently
    wrong training AND silently wrong drift MSE)."""
    dim = len(centroids[0])
    b = ivf_buckets(F.col(vec_col), centroids, 1)[0]
    return corpus.select(
        F.col(id_col),
        F.zip_with(
            _pq_sized_vec(F.col(vec_col), dim, "ivf_residuals"),
            F.element_at(_cens_lits(centroids), b),
            lambda a, c: a - c,
        ).alias(vec_col),
    )


def recorded_pq_residual(index: DataFrame) -> bool:
    """Whether a PQ store's codes quantize residuals (the IVFADC
    construction) — resolved from the store itself so scoring can
    never apply the wrong estimator; absent means raw (pre-r11
    stores keep their meaning)."""
    if "neighbor_id" not in index.columns:
        return False
    return bool(
        index.schema["neighbor_id"].metadata.get(_PQ_RES_KEY, False)
    )


def pq_index(
    corpus: DataFrame,
    dim: int,
    m: int = 8,
    ksub: int = 16,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    books: list[list[list[float]]] | None = None,
    centroids: list[list[float]] | None = None,
    residual: bool = False,
) -> DataFrame:
    """The storable IVF-PQ index: coarse-quantizer ``bucket`` for
    partition pruning (the :func:`ivf_index` layout) + PQ ``codes``
    instead of the raw vector — the scan that survives bucket pruning
    is ALSO ~60x narrower. Both quantizers' provenance rides
    ``neighbor_id`` metadata (IVF fingerprint/centroid values AND PQ
    fingerprint/codebook values), so the index is fully
    self-describing and every mismatch fails fast. Write it
    ``partitionBy("bucket")`` like the IVF index; query with
    :func:`pq_topk_indexed`.

    ``residual=True`` is the published IVFADC construction (Jégou et
    al. 2011, §IV): codes quantize ``vec − centroid[bucket]`` instead
    of the raw vector. Residual magnitudes are much smaller than
    absolute positions once the coarse quantizer has absorbed the
    cluster structure, so the same ksub codes spend their resolution
    on the part the bucket does NOT already encode — better ADC
    ranking at the identical byte budget. The flag rides the store
    metadata (:func:`recorded_pq_residual`), so readers always apply
    the matching estimator and a restarted stream follows the store;
    train books on :func:`ivf_residuals` output for the full win
    (deterministic default books still work — exactness of the
    oracle never depends on how books were trained)."""
    import json

    books = books or pq_codebook_values(dim, m, ksub)
    _check_books_dim(books, dim, "pq_index")
    cens = centroids or [
        ivf_centroid_values(dim, c) for c in range(n_centroids)
    ]
    meta: dict = {
        _IVF_FP_KEY: centroid_fingerprint(cens),
        **_pq_meta(books),
    }
    if sum(len(cen) for cen in cens) <= _IVF_CENS_MAX_NUMBERS:
        meta[_IVF_CENS_KEY] = json.dumps(
            [[float(x) for x in cen] for cen in cens]
        )
    # The per-row encode (m× code argmin, plus the residual
    # subtraction) is the expensive part of the build; a corpus read
    # from one file would run it in ONE task. Widen narrow inputs to
    # the cluster BEFORE the encode projection — a no-op at scale,
    # where the source already has splits (r14: the inline
    # ann_pq_residual gate spent ~3 s encoding 2 k rows serially).
    corpus = ensure_min_parallelism(corpus)
    if not residual:
        return corpus.select(
            F.col(id_col).alias("neighbor_id", metadata=meta),
            pq_codes(F.col(vec_col), books).alias("codes"),
            norm(F.col(vec_col)).alias("cn"),
            ivf_buckets(F.col(vec_col), cens, 1)[0].alias("bucket"),
        )
    meta[_PQ_RES_KEY] = True
    with_b = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        ivf_buckets(F.col(vec_col), cens, 1)[0].alias("bucket"),
    )
    # guard the RAW vector: zip_with null-pads a short vector to the
    # centroid's length, which would slip past pq_codes' size check
    # on the residual and quantize nulls
    res = F.zip_with(
        _pq_sized_vec(F.col(vec_col), dim, "pq_index"),
        F.element_at(_cens_lits(cens), F.col("bucket")),
        lambda a, c: a - c,
    )
    return with_b.select(
        F.col(id_col).alias("neighbor_id", metadata=meta),
        pq_codes(res, books).alias("codes"),
        norm(F.col(vec_col)).alias("cn"),
        "bucket",
    )


def pq_topk_indexed(
    queries: DataFrame,
    index: DataFrame,
    dim: int,
    k: int = 5,
    m: int = 8,
    ksub: int = 16,
    n_centroids: int = 8,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    books: list[list[list[float]]] | None = None,
    centroids: list[list[float]] | None = None,
    broadcast_queries: bool = True,
    refine: int | None = None,
    corpus: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ probe: coarse buckets prune WHICH partitions are read
    (broadcast shape keeps DPP eligible; ``broadcast_queries=False``
    statically prunes with the bounded probed-bucket IN, the
    :func:`ivf_topk_indexed` contract), PQ codes shrink WHAT the
    surviving scan streams, and ADC ranks candidates with ``m``
    lookups each.

    ``refine=R`` adds the exact re-rank stage: the top-R candidates
    per query by ADC join back to ``corpus`` (required) by id — a
    candidate-proportional point-lookup join, R*|queries| rows
    against the corpus, never a second corpus scan of the probe side
    — and the final top-k is exact cosine over true vectors. With
    ``R`` at least the probed-bucket population this is EXACTLY
    :func:`ivf_topk` (pytest-pinned identity); small R trades recall
    for touching ~R true vectors per query.

    A residual store (:func:`pq_index` ``residual=True``, resolved
    from the store's own metadata — never a caller flag) scores with
    the IVFADC estimator: ``dot(q, centroid_b) + ADC(residual
    codes)`` = dot(q, centroid + reconstruction), one extra round-6
    dot per (query, probed bucket) — query-side work, zero extra
    per-candidate cost."""
    books = _resolve_codebooks(
        index, dim, m, ksub, books, "pq_topk_indexed"
    )
    cens = _resolve_centroids(index, dim, n_centroids, centroids)
    _check_ivf_provenance(index, cens, "pq_topk_indexed")
    residual = recorded_pq_residual(index)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        _pq_lut(F.col(vec_col), books).alias("lut"),
        norm(F.col(vec_col)).alias("qn"),
        F.explode(ivf_buckets(F.col(vec_col), cens, n_probe)).alias(
            "bucket"
        ),
    )
    if residual:
        q = q.withColumn(
            "qc",
            F.round(
                dot(
                    F.col("_qv"),
                    F.element_at(_cens_lits(cens), F.col("bucket")),
                ),
                6,
            ),
        )
    q = q.drop("_qv")
    if broadcast_queries:
        probe = F.broadcast(q)
    else:
        probed = [
            r["bucket"] for r in q.select("bucket").distinct().collect()
        ]
        index = index.filter(F.col("bucket").isin(probed))
        probe = q
    adc_dot = _adc_score(F.col("codes"), F.col("lut"))
    if residual:
        adc_dot = F.col("qc") + adc_dot
    scored = (
        probe.join(index, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                adc_dot / (F.col("qn") * F.col("cn")),
                6,
            ).alias("adc_cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc_cosine"), F.asc("neighbor_id")
    )
    ranked = scored.withColumn("rank", F.row_number().over(w))
    if refine is None:
        return ranked.filter(F.col("rank") <= k).select(
            "query_id", "neighbor_id", "rank", "adc_cosine"
        )
    if corpus is None:
        raise ValueError(
            "pq_topk_indexed: refine needs the true-vector corpus — "
            "pass corpus= (the exact re-rank reads only the top-R "
            "candidates' rows from it)"
        )
    cands = ranked.filter(F.col("rank") <= refine).select(
        "query_id", "neighbor_id"
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("qn"),
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm(F.col(vec_col)).alias("cn"),
    )
    # respect the caller's broadcast decision in the re-rank too:
    # broadcast_queries=False exists precisely because the query side
    # is too large to broadcast, and the refine join re-touches the
    # full query projection
    probe_qv = F.broadcast(qv) if broadcast_queries else qv
    exact = (
        cands.join(cv, "neighbor_id")
        .join(probe_qv, "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")),
                6,
            ).alias("cosine"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
