"""End-to-end corpus-curation pipeline (SURVEY.md §7 M4).

Composes the training-data operators into the shape a real pipeline
runs over 100 TB of raw text, as one lazy DataFrame plan:

    quality/repetition annotate  (narrow — fuses into the scan)
      → threshold filter          (narrow; pushed predicates)
      → exact dedup               (one hash shuffle)
      → MinHash near-dup removal  (LSH band join; see operators/dedup)
      → deterministic split       (narrow)

Everything before the near-dup step is a single narrow pass; the
whole pipeline is 4 shuffles end-to-end (exact-dedup window, band
self-join, pair dedup, cluster anti-join). Filters run FIRST so the
expensive pair space is built over the smallest possible corpus —
at 100 TB the quality gate typically drops 30-50% of raw documents
before any shuffle happens.

Determinism: thresholds compare 6-dp-rounded scores, survivors are
minimum-id per group, and the split is a content hash — so the whole
pipeline is exactly reproducible by the DuckDB oracle
(``__spark_entry__.curation_pipeline``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mydatasyncer_spark.operators.dedup import dedup_clusters, minhash_lsh_pairs
from mydatasyncer_spark.operators.partitioning import ensure_min_parallelism
from mydatasyncer_spark.operators.sampling import split_column
from mydatasyncer_spark.operators.text import (
    normalize_text,
    quality_score,
    repetition_ratio,
    tokens,
    word_ngrams,
)


@dataclass(frozen=True)
class CurationConfig:
    """Thresholds and split for :func:`curate`. Defaults keep the
    fixture corpus non-degenerate (~60% survive the quality gate).

    ``model_weights``/``model_bias``/``min_model_quality`` switch on
    the published recipes' SECOND filter stage (fastText/CCNet: the
    heuristics drop the degenerate tail, a trained linear model
    ranks content): when weights are set, documents also need
    ``model_quality >= min_model_quality`` to survive the gate. The
    model pass is a narrow projection (``operators/classify.py``),
    so turning it on adds zero shuffles to the pipeline — train
    weights once with ``logreg_train`` and pin them in the config,
    or (preferred) persist them as a self-describing store and pass
    ``model_store_path`` to :func:`curate` so nothing is threaded by
    hand; the hash-bucketed features need no vocabulary shared
    between the training run and any batch or stream that scores."""

    min_quality: float = 0.70
    max_repetition: float = 0.01
    near_dup_threshold: float = 0.5
    split_fractions: dict[str, float] = field(
        default_factory=lambda: {"train": 0.8, "valid": 0.1, "test": 0.1}
    )
    model_weights: tuple[float, ...] | None = None
    model_bias: float = 0.0
    min_model_quality: float = 0.5


def annotate_quality(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Add 6-dp ``quality`` and ``repetition`` columns (narrow)."""
    with_toks = df.withColumn("_toks", tokens(F.col(text_col)))
    with_grams = with_toks.withColumn("_grams", word_ngrams(F.col("_toks"), 3))
    return with_grams.withColumn(
        "quality", F.round(quality_score(F.col(text_col)), 6)
    ).withColumn("repetition", F.round(repetition_ratio(F.col("_grams")), 6)).drop(
        "_toks", "_grams"
    )


def exact_survivors(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the minimum-id document per exact content group (md5 of
    normalized text). Window formulation: one shuffle, no join-back."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(F.md5(normalize_text(F.col(text_col))))
        .orderBy(F.col(id_col))
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def curate(
    df: DataFrame,
    config: CurationConfig | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    model_store_path: str | None = None,
) -> DataFrame:
    """Run the full curation pipeline; returns surviving documents
    with their ``quality`` score and ``split`` assignment (all input
    columns preserved).

    ``model_store_path`` (r12): the stage-2 gate's trained
    weights+bias resolve from a self-describing
    :func:`~mydatasyncer_spark.operators.classify.
    quality_model_frame` store — the SAME configless contract the
    streaming twin (``streaming/continuous.continuous_curation``)
    already had, so batch and stream have one story: a batch run
    needs no weights threaded by hand, and a run that passes BOTH
    the store path and explicit ``config.model_weights`` is
    fingerprint-checked and REFUSES a mismatch rather than gating
    under whichever happened to win. ``min_model_quality`` stays in
    the config (operating threshold, not a training artifact)."""
    config = config or CurationConfig()
    model_weights = (
        list(config.model_weights)
        if config.model_weights is not None
        else None
    )
    model_bias = config.model_bias
    if model_store_path is not None:
        from mydatasyncer_spark.operators.classify import (
            model_fingerprint,
            recorded_model,
        )

        mw, mb, _base = recorded_model(
            df.sparkSession.read.parquet(model_store_path)
        )
        if model_weights is not None and model_fingerprint(
            model_weights, model_bias
        ) != model_fingerprint(mw, mb):
            raise ValueError(
                "curate: config.model_weights do not match the model "
                "store at model_store_path — gating under whichever "
                "happened to win would be silently wrong; drop the "
                "explicit weights (the store is self-describing) or "
                "point at the store they came from"
            )
        model_weights, model_bias = mw, mb
    # The annotate expressions (tokenize + n-grams + quality) are the
    # per-row-heaviest narrow work in the pipeline; a single-row-group
    # parquet would run them on one core. Widen first — no-op at
    # scale, one tiny shuffle on small fixtures (ADR mirrored in
    # operators/partitioning.py).
    annotated = annotate_quality(
        ensure_min_parallelism(df), text_col, id_col
    )
    kept = annotated.filter(
        (F.col("quality") >= config.min_quality)
        & (F.col("repetition") <= config.max_repetition)
    )
    if model_weights is not None:
        # stage 2 of the published recipe: the trained linear model
        # gates on content, not surface shape — still narrow
        from mydatasyncer_spark.operators.classify import (
            model_score_column,
        )

        kept = kept.withColumn(
            "model_quality",
            model_score_column(
                F.col(text_col),
                model_weights,
                model_bias,
            ),
        ).filter(
            F.col("model_quality") >= config.min_model_quality
        )
    # `exact` feeds BOTH the near-dup pair build and the final
    # survivor anti-join; checkpoint it so the annotate+window chain
    # runs once, not once per consumer. Corpus-sized but post-filter —
    # the same cache the reference's "load outside the transaction"
    # rule (SURVEY §4.1) would demand.
    exact = exact_survivors(kept, text_col, id_col).localCheckpoint(eager=True)
    pairs = minhash_lsh_pairs(exact, text_col, id_col).filter(
        F.col("est_jaccard") >= config.near_dup_threshold
    )
    clusters = dedup_clusters(pairs)
    non_survivors = clusters.filter(
        F.col("cluster_id") != F.col("doc_id")
    ).select(F.col("doc_id").alias(id_col))
    survivors = exact.join(non_survivors, id_col, "left_anti")
    return survivors.withColumn(
        "split", split_column(F.col(id_col), config.split_fractions)
    )
