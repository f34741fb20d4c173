"""Model-based document quality scoring — the hashed-feature linear
classifier every production curation stack runs next to the
heuristic gate (the fastText / CCNet quality-filter shape: Joulin et
al. 2016, Wenzek et al. 2019 — public recipes), trained and applied
entirely in DataFrame algebra.

Why it exists alongside ``text.quality_score``: the heuristic gate
scores SURFACE shape (length, punctuation, stopword ratios); a
trained linear model scores CONTENT resemblance to a reference
corpus ("does this look like Wikipedia or like boilerplate"), which
is the published recipe's second, orthogonal filter stage.

Scale shape, the part that matters at 100 TB:

- **Features are hash-bucketed token frequencies** — no vocabulary
  to build, broadcast, or keep consistent across batches: feature id
  is ``hash48(token) % n_features`` (the engine's cross-engine hash
  family, so the DuckDB oracle reproduces features bit-for-bit and a
  streaming batch hashes identically to the training run).
- **Scoring is a NARROW projection** — zero shuffles, zero joins:
  per document, the token array maps through a broadcast
  weight-literal table and folds in ARRAY ORDER
  (``transform`` + ``aggregate``, the ``_pq_lut`` pattern), so a
  100 TB scoring pass is scan-speed and the plan pin can assert "no
  Exchange" outright. Deterministic fold order is also what makes
  the SQL oracle exact (DuckDB ``list_reduce``).
- **Training is the k-means layout** (``kmeans_centroids``'s
  contract): full-batch gradient descent where each iteration is two
  bounded aggregates — a per-document margin fold (narrow, same
  expression as scoring) and one groupBy-feature gradient sum —
  with ``n_features + 1`` numbers to the driver per iteration,
  never the documents. ``n_features`` is a few thousand for the
  published recipe; the weight table stays broadcast-literal-sized
  by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mydatasyncer_spark.functions.hashing import hash48
from mydatasyncer_spark.operators.similarity import _arr_lit
from mydatasyncer_spark.operators.text import tokens


def quality_weight_values(n_features: int, seed: str = "qw") -> list[float]:
    """Deterministic pseudo-random weight vector: component f maps a
    48-bit md5 of ``"qw:f"`` into [-1, 1) — driver-side constants so
    the gate query's SQL oracle inlines IDENTICAL literals (the
    :func:`~mydatasyncer_spark.operators.similarity.
    ivf_centroid_values` trick). Real deployments train
    :func:`logreg_train` weights; determinism here is what makes the
    cross-engine oracle check the SCORING algebra exactly."""
    import hashlib

    out = []
    for f in range(n_features):
        h = int(hashlib.md5(f"{seed}:{f}".encode()).hexdigest()[:12], 16)
        out.append((h % 2_000_001) / 1_000_000.0 - 1.0)
    return out


def feature_id(token: Column, n_features: int) -> Column:
    """Hash-bucketed feature id in ``[0, n_features)``."""
    return F.pmod(hash48(token), F.lit(int(n_features)))


def hashed_token_features(
    df: DataFrame,
    n_features: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Long-form features ``(id, feature, x)`` with
    ``x = count(token in bucket) / len(tokens)`` — the mean-of-
    one-hots a linear bag-of-words model consumes. Used by training
    (the gradient groupBy needs the long form); scoring never
    materializes it (see :func:`model_score_column`)."""
    toks = df.select(
        F.col(id_col),
        F.explode(tokens(F.col(text_col))).alias("_tok"),
        F.size(tokens(F.col(text_col))).alias("_len"),
    )
    return (
        toks.groupBy(
            id_col,
            feature_id(F.col("_tok"), n_features).alias("feature"),
        )
        .agg(
            (F.count(F.lit(1)) / F.first("_len")).alias("x"),
        )
    )


def _margin_column(
    text: Column, weights: list[float], bias: float
) -> Column:
    """``w · x + b`` for one document as a pure Column expression:
    the token array maps through the weight-literal table and folds
    LEFT-TO-RIGHT (deterministic — the oracle's ``list_reduce``
    matches term-for-term), then divides by the token count (the
    mean-of-one-hots normalization). Empty documents score the bias
    alone."""
    wlits = _arr_lit(weights)
    toks = tokens(text)
    per_tok = F.transform(
        toks,
        lambda t: F.element_at(
            wlits, (feature_id(t, len(weights)) + 1).cast("int")
        ),
    )
    total = F.aggregate(
        per_tok, F.lit(0.0), lambda acc, x: acc + x
    )
    n = F.size(toks)
    return F.when(n > 0, total / n + F.lit(float(bias))).otherwise(
        F.lit(float(bias))
    )


def model_score_column(
    text: Column, weights: list[float], bias: float = 0.0
) -> Column:
    """Round-6 ``sigmoid(w · x + b)`` — the model's quality
    probability as a narrow Column expression. Attach it with one
    ``withColumn``; the scoring pass is shuffle-free by construction
    (plan-pinned)."""
    m = _margin_column(text, weights, bias)
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-m)), 6)


def score_documents(
    df: DataFrame,
    weights: list[float],
    bias: float = 0.0,
    text_col: str = "text",
    score_col: str = "model_quality",
) -> DataFrame:
    """``df`` + the model-quality column. Compose with the heuristic
    gate exactly as the published recipe does: heuristics drop the
    degenerate tail, the model ranks what remains."""
    return df.withColumn(
        score_col, model_score_column(F.col(text_col), weights, bias)
    )


def logreg_train(
    df: DataFrame,
    labels: DataFrame,
    n_features: int = 1024,
    n_iter: int = 20,
    lr: float = 1.0,
    l2: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "label",
) -> tuple[list[float], float, list[float]]:
    """Full-batch logistic-regression training over hashed token
    features. Returns ``(weights, bias, losses)`` — ``losses`` is
    the per-iteration mean log-loss (tests pin monotone descent).

    Per iteration: (1) margins per document — the SAME narrow fold
    expression scoring uses, against the current weight literals;
    (2) residuals ``sigmoid(margin) - y``; (3) ONE groupBy-feature
    aggregate of ``residual * x`` (the gradient) plus one global
    aggregate for the bias and loss — ``n_features + 2`` numbers to
    the driver, never the corpus (the ``kmeans_centroids``
    contract). Deterministic init (zeros); full-batch, so every run
    over the same frame converges to the same optimum up to
    float-sum association."""
    import math

    # one label row per id: duplicate ids in `labels` would fan out
    # the feature join, multiplying those documents' margin sums and
    # gradient contributions — silently biasing training toward
    # whatever got labeled twice. Collapse deterministically (max —
    # dropDuplicates would pick an arbitrary row under conflicting
    # labels, making two training runs disagree).
    labels_1 = labels.groupBy(id_col).agg(
        F.max(F.col(label_col).cast("double")).alias("_y")
    )
    feats = hashed_token_features(
        df, n_features, text_col, id_col
    ).join(labels_1, id_col)
    feats = feats.localCheckpoint(eager=True)  # features are loop-invariant
    # normalize by the documents that actually PARTICIPATE: labeled
    # ids absent from df and zero-token documents contribute no
    # feature rows (they carry no signal for w), and dividing by the
    # full label count would silently shrink the step size and
    # under-report the mean log-loss by the missing fraction
    n_docs = feats.select(id_col).distinct().count()
    if n_docs == 0:
        raise ValueError(
            "logreg_train: no labeled document has any token — "
            "nothing to train on (check text_col/id_col and that "
            "labels' ids exist in df)"
        )
    w = [0.0] * n_features
    b = 0.0
    losses: list[float] = []
    for _ in range(n_iter):
        wlits = _arr_lit(w)
        doc = (
            feats.groupBy(id_col)
            .agg(
                F.sum(
                    F.col("x")
                    * F.element_at(
                        wlits, (F.col("feature") + 1).cast("int")
                    )
                ).alias("_m"),
                F.first("_y").alias("_y"),
            )
            .select(
                F.col(id_col),
                (
                    F.lit(1.0)
                    / (F.lit(1.0) + F.exp(-(F.col("_m") + F.lit(b))))
                ).alias("_p"),
                "_y",
            )
        )
        stats = doc.agg(
            F.sum(F.col("_p") - F.col("_y")).alias("_gb"),
            F.sum(
                -F.col("_y") * F.log(F.greatest(F.col("_p"), F.lit(1e-12)))
                - (F.lit(1.0) - F.col("_y"))
                * F.log(
                    F.greatest(F.lit(1.0) - F.col("_p"), F.lit(1e-12))
                )
            ).alias("_loss"),
        ).collect()[0]
        grad_rows = (
            feats.join(
                doc.select(id_col, "_p"), id_col
            )
            .groupBy("feature")
            .agg(
                F.sum(
                    (F.col("_p") - F.col("_y")) * F.col("x")
                ).alias("_g")
            )
            .collect()
        )
        grad = [0.0] * n_features
        for r in grad_rows:
            grad[int(r["feature"])] = float(r["_g"])
        w = [
            wi - lr * (gi / n_docs + l2 * wi)
            for wi, gi in zip(w, grad)
        ]
        b -= lr * float(stats["_gb"]) / n_docs
        losses.append(float(stats["_loss"]) / n_docs)
        if math.isnan(losses[-1]):
            raise ValueError(
                "logreg_train: diverged (nan loss) — lower lr"
            )
    return w, b, losses


#: metadata keys for the self-describing weights store (the
#: recorded_centroids convention, on the trained-model axis)
_QW_FP_KEY = "quality_weights_fingerprint"
_QW_BIAS_KEY = "quality_model_bias"
_QW_NF_KEY = "quality_model_n_features"
_QW_BASE_KEY = "quality_score_baseline_json"


def model_fingerprint(weights: list[float], bias: float) -> str:
    """Order-sensitive exact-repr fingerprint of ``(weights, bias)``
    — the classifier twin of :func:`~mydatasyncer_spark.operators.
    similarity.centroid_fingerprint`: feature ids are positions into
    the weight vector, so any reorder or retrain changes what every
    hashed feature means."""
    import hashlib

    payload = (
        ",".join(repr(float(w)) for w in weights)
        + f"|b={float(bias)!r}"
    )
    return hashlib.md5(payload.encode()).hexdigest()


def quality_model_frame(
    spark,
    weights: list[float],
    bias: float = 0.0,
    baseline: list[float] | None = None,
):
    """The trained classifier as a SELF-DESCRIBING store frame:
    one ``(feature, weight)`` row per feature (rows, not footer JSON
    — so n_features has no footer budget), with the fingerprint,
    bias, n_features, and the training-time :func:`score_histogram`
    baseline riding ``feature``-column metadata into the parquet
    footer. Persist it next to the training run with
    :func:`~mydatasyncer_spark.operators.maintenance.
    write_model_store` — the ``_SUCCESS``-gated staged swap, so a
    crash mid-retrain leaves the OLD store serving a standing stream
    instead of a half-deleted path its reader refuses (the store is
    write-once per retrain, never append-maintained, so no
    compaction wrapper exists or is needed); a scoring stream
    or a later session resolves everything with
    :func:`recorded_model` and needs NO weights config — and a
    weights/baseline pairing can never mismatch, because both ride
    the same footer (the hazard the drift report had: PSI against
    someone else's baseline reports nonsense)."""
    import json

    meta: dict = {
        _QW_FP_KEY: model_fingerprint(weights, bias),
        _QW_BIAS_KEY: float(bias),
        _QW_NF_KEY: len(weights),
    }
    if baseline is not None:
        meta[_QW_BASE_KEY] = json.dumps(
            [float(x) for x in baseline]
        )
    # build through pandas/Arrow, NOT a Python list: a list-built
    # frame is backed by an RDD of pickled rows, so every resolve
    # (collect) pays a Python-worker job (~0.4 s warm, ~3 s cold);
    # the Arrow path yields a JVM-local relation whose collect is a
    # driver-side copy (~0.03 s measured). Identical rows and schema.
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "feature": pd.Series(range(len(weights)), dtype="int32"),
            "weight": pd.Series(
                [float(w) for w in weights], dtype="float64"
            ),
        }
    )
    return spark.createDataFrame(pdf).select(
        F.col("feature").alias("feature", metadata=meta),
        "weight",
    )


def recorded_model_fingerprint(store) -> str | None:
    """The store's own recorded fingerprint, read from the parquet
    FOOTER alone (schema metadata — no row is scanned). This is the
    cache key a per-batch resolver needs: :func:`recorded_model`
    collects and re-verifies all n_features rows, which is nothing at
    n_features=64 but a ~16 MB driver collect per micro-batch at a
    production fastText-style 2^21 buckets — so a standing stream
    re-collects ONLY when this footer value changes (a retrain's
    rewrite stamps a new fingerprint by construction). ``None`` for a
    frame that records no provenance; the caller's next full
    :func:`recorded_model` then refuses with the real error."""
    if "feature" not in store.columns:
        return None
    v = store.schema["feature"].metadata.get(_QW_FP_KEY)
    return str(v) if v is not None else None


def recorded_model(
    store,
) -> tuple[list[float], float, list[float] | None]:
    """Resolve ``(weights, bias, baseline)`` from a
    :func:`quality_model_frame` store — resolve-and-REFUSE, the
    :func:`~mydatasyncer_spark.operators.similarity.
    recorded_centroids` contract: a store with stripped provenance,
    duplicate/missing feature rows (mixed appends from different
    training runs), or rows that no longer match their own recorded
    fingerprint raises instead of scoring under silently-wrong
    weights."""
    import json

    if "feature" not in store.columns or "weight" not in store.columns:
        raise ValueError(
            "recorded_model: not a quality-model store — expected "
            "(feature, weight) columns"
        )
    meta = store.schema["feature"].metadata
    fp = meta.get(_QW_FP_KEY)
    nf = meta.get(_QW_NF_KEY)
    bias = meta.get(_QW_BIAS_KEY)
    if fp is None or nf is None or bias is None:
        raise ValueError(
            "recorded_model: the store records no provenance — "
            "scoring under weights of unknown origin is silently "
            "wrong; rewrite it with quality_model_frame"
        )
    rows = store.select("feature", "weight").collect()
    if len(rows) != int(nf) or {int(r["feature"]) for r in rows} != set(
        range(int(nf))
    ):
        raise ValueError(
            "recorded_model: the store's feature rows do not form "
            "exactly 0..n_features-1 — mixed appends from different "
            "training runs; rewrite it with quality_model_frame"
        )
    weights = [0.0] * int(nf)
    for r in rows:
        weights[int(r["feature"])] = float(r["weight"])
    if model_fingerprint(weights, float(bias)) != fp:
        raise ValueError(
            "recorded_model: the store's rows do not match their own "
            "recorded fingerprint — the store mixes rows from "
            "different training runs; rewrite it with "
            "quality_model_frame"
        )
    raw = meta.get(_QW_BASE_KEY)
    baseline = (
        [float(x) for x in json.loads(raw)] if raw is not None else None
    )
    return weights, float(bias), baseline


def score_histogram(
    df: DataFrame,
    weights: list[float],
    bias: float = 0.0,
    n_bins: int = 10,
    text_col: str = "text",
) -> list[float]:
    """Fraction of documents per equal-width score bin — the
    baseline artifact :func:`score_drift_report` compares against.
    Persist it next to the weights at training time. One bounded
    aggregate (``n_bins`` numbers); the binning is on the round-6
    score, so it is deterministic across runs and engines."""
    score = model_score_column(F.col(text_col), weights, bias)
    b = F.least(
        F.floor(score * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    rows = (
        df.select(b.alias("_b"))
        .groupBy("_b")
        .agg(F.count(F.lit(1)).alias("_c"))
        .collect()
    )
    total = sum(int(r["_c"]) for r in rows)
    if total == 0:
        # the family convention: refuse degenerate input rather than
        # fabricate a signal — an all-zero "histogram" would read as
        # maximal drift (PSI >> the retrain threshold) from no data
        raise ValueError(
            "score_histogram: the frame has no rows — a histogram "
            "of nothing is not a distribution, and drift against it "
            "would report a spurious retrain signal"
        )
    hist = [0.0] * n_bins
    for r in rows:
        hist[int(r["_b"])] = int(r["_c"]) / total
    return hist


def model_drift_report(
    df: DataFrame,
    store: DataFrame,
    text_col: str = "text",
) -> dict:
    """:func:`score_drift_report` resolved entirely from a
    :func:`quality_model_frame` store — weights, bias, AND the
    training-time baseline come from the store's own footer (the
    configless-drift path; a store persisted without a baseline
    REFUSES rather than accepting a hand-guessed one — drift against
    someone else's baseline reports nonsense PSI, the hazard the
    store exists to close)."""
    weights, bias, baseline = recorded_model(store)
    if baseline is None:
        raise ValueError(
            "model_drift_report: the store records no baseline "
            "histogram — persist one (quality_model_frame(...,"
            "baseline=score_histogram(train_df, w, b))) or call "
            "score_drift_report with an explicit baseline"
        )
    return score_drift_report(
        df, weights, baseline, bias=bias, text_col=text_col
    )


def score_drift_report(
    df: DataFrame,
    weights: list[float],
    baseline: list[float],
    bias: float = 0.0,
    text_col: str = "text",
) -> dict:
    """The classifier's member of the decision-signal family
    (jaccard → order drift, IVF → centroid drift, PQ → codebook
    drift, this → WEIGHT drift): how differently today's corpus
    scores under the frozen weights than the training-time corpus
    did, as the Population Stability Index — the published
    model-monitoring metric (PSI = Σ (cur-base)·ln(cur/base) over
    score bins; rule of thumb: < 0.1 stable, 0.1-0.2 drifting,
    > 0.2 retrain). A drifting corpus does not make scores WRONG —
    it makes the training distribution unrepresentative, which is
    when a min_model_quality threshold calibrated on the old corpus
    silently starts gating the wrong fraction.

    One bounded aggregate pass (the scoring fold is narrow, the
    histogram is ``len(baseline)`` numbers). Returns ``{"psi",
    "histogram", "baseline", "max_bin_shift"}``; retrain with
    :func:`logreg_train` on freshly labeled data and re-baseline
    with :func:`score_histogram` — the report then returns to ~0,
    the fixpoint the tests pin."""
    import math

    n_bins = len(baseline)
    if n_bins < 2:
        raise ValueError(
            "score_drift_report: baseline must have >= 2 bins"
        )
    cur = score_histogram(df, weights, bias, n_bins, text_col)
    eps = 1e-4  # the standard PSI zero-bin clamp
    psi = sum(
        (c - b) * math.log(max(c, eps) / max(b, eps))
        for c, b in zip(cur, baseline)
    )
    return {
        "psi": psi,
        "histogram": cur,
        "baseline": list(baseline),
        "max_bin_shift": max(
            abs(c - b) for c, b in zip(cur, baseline)
        ),
    }
