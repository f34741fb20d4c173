"""Registry hygiene: fast, Spark-free pins on the driver-contract
surface in ``__spark_entry__.py``.

The driver's correctness gate evaluates only the FIRST 50 entries of
``queries()``, so window membership is load-bearing — r5's
hand-counted rotation comment silently misplaced one query
(`array_functions_pack` sat at position 51 while labeled in-window).
These tests make the boundary and the queries/oracles pairing
machine-checked instead."""

from __future__ import annotations

import __spark_entry__ as entry_mod

GATE_CAP = 50

# the r9 window boundary, pinned by name: position 50 (last inside
# the driver gate) and position 51 (first outside). Update these —
# consciously — whenever the rotation changes.
LAST_IN_WINDOW = "canonical_stringify"
FIRST_PAST_CAP = "cap_docs_per_lang_scalable"

# everything added or implementation-touched in r9 MUST sit inside
# the gate window (rotation policy rule 1-2)
R9_TOUCHED = [
    # new in r9
    "dedup_containment_inv",
    "dedup_semantic",
    "dedup_minhash_incr",
    # implementation touched in r9 (containment_join grew the
    # corpus_inv store path: provenance guards, probe bucketing,
    # verify-side candidate-id prune; _verify_pairs grew the
    # id-bucket static prune; jaccard_join_incremental carries the
    # bucket column through corpus_src)
    "dedup_containment_join",
    "dedup_containment_probe",
    "dedup_jaccard_incremental",
    "dedup_jaccard_incr_reorder",
    "dedup_jaccard_join_exact",
]

# the entire last-green-r6 cohort rotates in this round (VERDICT r8
# item #2: no proof may grow older than two rounds)
R6_STALE_COHORT = [
    "array_agg_customer_orders",
    "array_functions_pack",
    "asof_next_purchase",
    "asof_purchase_view",
    "boilerplate_line_removal",
    "cap_docs_per_lang",
    "column_entropy_profile",
    "contamination_check",
    "corpus_shuffle_epoch",
    "curation_pipeline",
    "dedup_cluster_assign",
    "dedup_edit_distance",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash_near",
    "dedup_survivors",
    "doc_chunks_tokens",
    "domain_mix_weights",
    "embedding_near_dup",
    "event_gaps",
    "funnel_steps",
    "interval_overlap_half_open",
    "interval_overlap_pairs",
    "json_extract_events",
    "lang_id_pred",
    "pii_redaction",
    "pivot_event_type_counts",
    "range_join_view_purchase",
    "semi_join_big_orders",
    "sessionization",
    "skew_salted_join",
    "skew_salted_join_right",
    "text_quality",
    "text_stats",
    "tfidf_top_terms",
    "trailing_hour_value",
    "train_test_split_assign",
    "tumbling_windows",
    "window_analytics_suite",
]


def test_every_query_has_an_oracle_and_vice_versa():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(q) == set(o), (
        sorted(set(q) - set(o)),
        sorted(set(o) - set(q)),
    )
    assert len(q) == len(o)


def test_gate_window_boundary_is_pinned_by_name():
    names = list(entry_mod.queries())
    assert len(names) >= GATE_CAP
    assert names[GATE_CAP - 1] == LAST_IN_WINDOW
    assert names[GATE_CAP] == FIRST_PAST_CAP


def test_round_touched_queries_sit_inside_the_gate_window():
    window = set(list(entry_mod.queries())[:GATE_CAP])
    missing = [n for n in R9_TOUCHED if n not in window]
    assert not missing, missing


def test_stale_cohort_rotated_into_the_window():
    window = set(list(entry_mod.queries())[:GATE_CAP])
    missing = [n for n in R6_STALE_COHORT if n not in window]
    assert not missing, missing


def test_registry_values_are_named_callables():
    for name, fn in entry_mod.queries().items():
        assert callable(fn), name
        assert fn.__name__ == name, (name, fn.__name__)
