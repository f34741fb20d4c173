"""mydatasyncer_spark — a PySpark-native data-sync & analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference tool ``yoRyuuuuu/mydatasyncer`` (a Go batch ETL that diffs
CSV/JSON snapshots against RDBMS tables by primary key and applies
INSERT/UPDATE/DELETE in dependency-ordered transactions), extended
with the operators a large-scale (100 TB-class) training-data
pipeline needs: deduplication, similarity search, text analysis, and
multimodal column plumbing.

Design stance (see SURVEY.md §7):
- Everything is declared with the DataFrame API so Catalyst owns
  predicate pushdown, column pruning, join strategy, and codegen.
- The diff "query" is a composition of anti/inner joins on a
  canonicalized key column — no hand-rolled hash maps.
- Writes go through a staging-table + single-connection transactional
  applier, keeping the heavy lifting distributed and the ACID
  boundary narrow.
"""

from mydatasyncer_spark.config import SyncConfig, TableSpec
from mydatasyncer_spark.operators.asof import asof_join_backward
from mydatasyncer_spark.operators.curation import CurationConfig, curate
from mydatasyncer_spark.operators.dedup import (
    containment_inverted_store,
    containment_join,
    dedup_clusters,
    exact_dedup,
    id_bucketed_index,
    jaccard_compact,
    jaccard_drift_report,
    jaccard_join_incremental,
    jaccard_ordered_index,
    jaccard_prefix_index,
    jaccard_prefix_store,
    jaccard_refreeze,
    jaccard_self_join,
    jaccard_token_order,
    minhash_band_store,
    minhash_lsh_pairs,
    minhash_lsh_pairs_incremental,
    minhash_signature,
    simhash,
)
from mydatasyncer_spark.operators.maintenance import (
    band_occupancy_report,
    compact_content_keys,
    compact_ivf_index,
    compact_lsh_index,
    compact_minhash_index,
    compact_pq_index,
    compaction_report,
    containment_occupancy_report,
    ivf_drift_report,
    lsh_occupancy_report,
    pq_drift_report,
    pq_rebuild,
    compact_pairs,
    compact_partials,
    compact_survivors,
    compact_table,
    ivf_rebuild,
)
from mydatasyncer_spark.operators.sampling import (
    cap_per_group,
    cap_per_group_scalable,
    epoch_shuffle,
    mix_weights,
    pack_sequences,
    sample_hash,
    stratified_sample_hash,
    train_test_split,
    weighted_sample,
)
from mydatasyncer_spark.operators.diff import (
    DiffResult,
    diff_counts,
    diff_snapshots,
    diff_snapshots_pruned,
)
from mydatasyncer_spark.operators.classify import (
    hashed_token_features,
    logreg_train,
    model_score_column,
    quality_weight_values,
    score_documents,
    score_drift_report,
    score_histogram,
)
from mydatasyncer_spark.operators.curriculum import (
    assign_quality_tiers,
    quality_tier_cutpoints,
)
from mydatasyncer_spark.operators.intervals import interval_overlap_join
from mydatasyncer_spark.operators.partitioning import (
    salted_join,
    salted_join_auto,
    skew_report,
)
from mydatasyncer_spark.operators.scd import (
    scd2_apply,
    scd2_apply_to_table,
    scd2_init,
    scd2_init_table,
)
from mydatasyncer_spark.operators.sketches import (
    quantile_sketch_merge,
    quantile_sketch_rollup,
    sketch_rollup,
    sketch_rollup_merge,
    theta_pairwise_overlap,
    theta_rollup,
)
from mydatasyncer_spark.operators.ivm import (
    affected_join_keys,
    join_view_state,
    maintain_join_view,
    maintain_rollup,
    maintain_rollup_minmax,
    rollup_state,
    rollup_state_minmax,
)
from mydatasyncer_spark.operators.similarity import (
    centroid_fingerprint,
    cosine_topk,
    embedding_near_dup_pairs,
    ivf_index,
    ivf_topk_indexed,
    kmeans_centroids,
    kmeans_inertia,
    lsh_ann_topk,
    lsh_ann_topk_indexed,
    lsh_index,
    pq_adc_topk,
    pq_codebook_fingerprint,
    pq_encode,
    pq_index,
    pq_topk_indexed,
    pq_train,
    recorded_centroids,
    recorded_codebooks,
    semantic_dedup_pairs,
    semantic_dedup_survivors,
)
from mydatasyncer_spark.operators.tokenizer import (
    bpe_drift_report,
    bpe_encode,
    bpe_pieces_per_word,
    bpe_token_count,
    bpe_train,
)
from mydatasyncer_spark.operators.text import (
    remove_repeated_segments,
    unigram_baseline,
    unigram_drift_report,
    unigram_logprob_table,
    unigram_perplexity,
)
from mydatasyncer_spark.operators.validation import (
    column_entropy,
    mutual_information,
    profile_columns,
)
from mydatasyncer_spark.operators.zorder import (
    ZDim,
    merge_into_zordered,
    write_zordered,
    zorder_key,
)
from mydatasyncer_spark.sources.writers import (
    batch_key_intervals,
    manifest_key_ranges,
    merge_into_range_sorted,
    plan_merge_groups,
    read_layout_manifest,
    write_layout_manifest,
    write_range_sorted,
)
from mydatasyncer_spark.session import get_spark
from mydatasyncer_spark.sinks.jdbc import JdbcBackend
from mydatasyncer_spark.sinks.table_merge import merge_into_table
from mydatasyncer_spark.syncer import sync

__all__ = [
    "SyncConfig",
    "TableSpec",
    "DiffResult",
    "diff_snapshots",
    "sync",
    "get_spark",
    "asof_join_backward",
    "exact_dedup",
    "minhash_lsh_pairs",
    "minhash_lsh_pairs_incremental",
    "simhash",
    "dedup_clusters",
    "cosine_topk",
    "lsh_ann_topk",
    "lsh_ann_topk_indexed",
    "lsh_index",
    "ivf_index",
    "ivf_topk_indexed",
    "kmeans_centroids",
    "centroid_fingerprint",
    "recorded_centroids",
    "kmeans_inertia",
    "embedding_near_dup_pairs",
    "JdbcBackend",
    "merge_into_table",
    "CurationConfig",
    "curate",
    "train_test_split",
    "sample_hash",
    "stratified_sample_hash",
    "pack_sequences",
    "mix_weights",
    "diff_counts",
    "diff_snapshots_pruned",
    "maintain_rollup",
    "rollup_state",
    "maintain_rollup_minmax",
    "rollup_state_minmax",
    "join_view_state",
    "affected_join_keys",
    "maintain_join_view",
    "interval_overlap_join",
    "epoch_shuffle",
    "weighted_sample",
    "remove_repeated_segments",
    "unigram_baseline",
    "unigram_drift_report",
    "unigram_logprob_table",
    "unigram_perplexity",
    "column_entropy",
    "mutual_information",
    "quality_tier_cutpoints",
    "assign_quality_tiers",
    "scd2_init",
    "scd2_init_table",
    "scd2_apply",
    "scd2_apply_to_table",
    "salted_join",
    "salted_join_auto",
    "skew_report",
    "sketch_rollup",
    "sketch_rollup_merge",
    "quantile_sketch_rollup",
    "quantile_sketch_merge",
    "theta_rollup",
    "theta_pairwise_overlap",
    "cap_per_group",
    "cap_per_group_scalable",
    "merge_into_zordered",
    "merge_into_range_sorted",
    "write_range_sorted",
    "batch_key_intervals",
    "plan_merge_groups",
    "manifest_key_ranges",
    "read_layout_manifest",
    "write_layout_manifest",
    "profile_columns",
    "ZDim",
    "zorder_key",
    "write_zordered",
    "jaccard_self_join",
    "jaccard_join_incremental",
    "jaccard_prefix_index",
    "jaccard_ordered_index",
    "jaccard_token_order",
    "jaccard_prefix_store",
    "jaccard_compact",
    "jaccard_drift_report",
    "jaccard_refreeze",
    "containment_join",
    "containment_inverted_store",
    "minhash_signature",
    "minhash_band_store",
    "id_bucketed_index",
    "semantic_dedup_pairs",
    "semantic_dedup_survivors",
    "compact_table",
    "ivf_rebuild",
    "compact_minhash_index",
    "compaction_report",
    "ivf_drift_report",
    "lsh_occupancy_report",
    "compact_survivors",
    "compact_pairs",
    "compact_partials",
    "compact_ivf_index",
    "compact_lsh_index",
    "compact_pq_index",
    "band_occupancy_report",
    "compact_content_keys",
    "containment_occupancy_report",
    "pq_drift_report",
    "pq_rebuild",
    "pq_adc_topk",
    "pq_codebook_fingerprint",
    "pq_encode",
    "pq_index",
    "pq_topk_indexed",
    "pq_train",
    "recorded_codebooks",
    "hashed_token_features",
    "logreg_train",
    "model_score_column",
    "quality_weight_values",
    "score_documents",
    "score_drift_report",
    "score_histogram",
    "bpe_train",
    "bpe_encode",
    "bpe_token_count",
    "bpe_drift_report",
    "bpe_pieces_per_word",
]

__version__ = "0.1.0"
