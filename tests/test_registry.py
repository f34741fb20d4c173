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

# the r8 window boundary, pinned by name: position 50 (last inside
# the driver gate) and position 51 (first outside). Update these —
# consciously — whenever the rotation changes.
LAST_IN_WINDOW = "ann_lsh_topk"
FIRST_PAST_CAP = "ivm_join_view_left"

# everything added or implementation-touched in r8 MUST sit inside
# the gate window (rotation policy rule 1-2)
R8_TOUCHED = [
    # new in r8
    "scd2_asof_join_ts",
    "dedup_containment_probe",
    "dedup_jaccard_incr_reorder",
    # implementation touched in r8 (dedup.py stored-order ingest +
    # containment corpus-side simplification/prefilter + _verify_pairs
    # prune, scd.py effectivity-type derivation + asof dtype cast +
    # columns guard)
    "dedup_jaccard_incremental",
    "dedup_jaccard_join_exact",
    "dedup_containment_join",
    "scd2_asof_join_lineitem",
    "scd2_keep_policy",
    "scd2_orders_history",
    "scd2_asof_state",
]

# the entire last-green-r5 cohort rotates in this round (VERDICT r7
# item #4: no proof may grow older than two rounds)
R5_STALE_COHORT = [
    "dedup_exact_best_quality",
    "dedup_simhash",
    "diff_delete",
    "diff_insert",
    "diff_plan_counts",
    "diff_update",
    "distinct_agg_segments",
    "doc_chunks",
    "doc_fingerprint",
    "doc_rolling_hash",
    "duplicate_key_detection",
    "grouping_sets_parts",
    "intersect_repeat_buyers",
    "multimodal_meta",
    "percentiles_by_segment",
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q3_top_orders",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "q13_order_count_distribution",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "quantile_rollup_values",
    "rollup_revenue",
    "running_total_events",
    "session_window_native",
    "set_ops_except",
    "sketch_error_bounds",
    "sketch_rollup_cube",
    "sketch_rollup_users",
    "sliding_windows_events",
    "theta_audience_overlap",
    "top_ngrams_per_lang",
    "unigram_perplexity_docs",
    "unigram_perplexity_oov",
    "window_topk_customers",
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
    missing = [n for n in R8_TOUCHED if n not in window]
    assert not missing, missing


def test_stale_cohort_rotated_into_the_window():
    window = set(list(entry_mod.queries())[:GATE_CAP])
    missing = [n for n in R5_STALE_COHORT if n not in window]
    assert not missing, missing


def test_registry_values_are_named_callables():
    for name, fn in entry_mod.queries().items():
        assert callable(fn), name
        assert fn.__name__ == name, (name, fn.__name__)
