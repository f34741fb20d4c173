"""Registry hygiene: fast, Spark-free pins on the driver-contract
surface in ``__spark_entry__.py``.

The driver's correctness gate evaluates only the FIRST 50 entries of
``queries()``, so window membership is load-bearing — r5's
hand-counted rotation comment silently misplaced one query
(`array_functions_pack` sat at position 51 while labeled in-window).
These tests make the boundary and the queries/oracles pairing
machine-checked instead."""

from __future__ import annotations

import re
from pathlib import Path

import __spark_entry__ as entry_mod

GATE_CAP = 50

# the r11 window boundary, pinned by name: position 50 (last inside
# the driver gate) and position 51 (first outside). Update these —
# consciously — whenever the rotation changes.
LAST_IN_WINDOW = "window_topk_customers"
FIRST_PAST_CAP = "ann_pq_residual"  # the pinned R12_PRIORITY entry

# everything added or implementation-touched in r11 MUST sit inside
# the gate window (rotation policy rule 1-2)
R11_TOUCHED = [
    # new in r11: the model-ON curation twin (proves the stage-2
    # composition the pinned r10 exception deferred) and the
    # self-describing weights-store scoring path (oracle legitimately
    # shared with quality_model_score — results identical by
    # construction, the resolve MECHANISM is what differs)
    "curation_pipeline_scored",
    "quality_model_score_stored",
    # rule-2 priority carried over from r10 (the pinned exception:
    # curate() gained the inert stage-2 gate there; the scored twin
    # now proves the branch ON, this entry proves it still-inert-off)
    "curation_pipeline",
    # implementation touched in r11: pq_codes/_pq_lut gained the
    # row-level vector-length guard and pq_encode/pq_index/
    # _resolve_codebooks the driver-side dim check — both PQ gate
    # queries run through those expressions
    "ann_pq_topk",
    "ann_pq_refined",
]

# the entire last-green-r8 cohort rotates in this round (VERDICT r10
# item #1: no proof may grow older than two rounds) — 45 queries,
# alphabetical so the cut is auditable
R8_STALE_COHORT = [
    "ann_cosine_topk",
    "ann_ivf_topk",
    "ann_lsh_topk",
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
    "q13_order_count_distribution",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q3_top_orders",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "quantile_rollup_values",
    "rollup_revenue",
    "running_total_events",
    "scd2_asof_join_lineitem",
    "scd2_asof_join_ts",
    "scd2_asof_state",
    "scd2_keep_policy",
    "scd2_orders_history",
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

# r12's rotation debt, recorded now so the next round's window is
# planned against it: the 46-query last-green-r9 cohort (their proofs
# turn three rounds old if r12 doesn't rotate them in). First names,
# full list = the "last-green r9" block in queries().
R12_DEBT_HEAD = ["dedup_minhash_incr", "dedup_jaccard_incremental"]

# PINNED EXCEPTION (r11): ann_pq_residual (the IVFADC residual
# construction) is NEW this round but the gate window is exactly
# full with rule-1/2 entries + the 45-query r8 rotation debt — the
# same full-window situation r10 resolved for curation_pipeline
# with the R11_PRIORITY pin, applied symmetrically. The query is
# fully DuckDB-oracle-checked locally every round
# (tests/test_oracle_parity.py); it enters the r12 window with
# rule-2 priority alongside the r9 debt cohort.
R12_PRIORITY = ["ann_pq_residual"]


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
    """Also retires the r10 R11_PRIORITY exception the documented
    way: curation_pipeline is now IN the window (rule 2), checked
    here rather than via the standalone exception pin."""
    window = set(list(entry_mod.queries())[:GATE_CAP])
    missing = [n for n in R11_TOUCHED if n not in window]
    assert not missing, missing


def test_stale_cohort_rotated_into_the_window():
    window = set(list(entry_mod.queries())[:GATE_CAP])
    missing = [n for n in R8_STALE_COHORT if n not in window]
    assert not missing, missing
    # the window is EXACTLY rule-1/2 entries + the stale cohort —
    # no silent filler displacing a debt entry
    assert window == set(R11_TOUCHED) | set(R8_STALE_COHORT)
    assert len(R11_TOUCHED) + len(R8_STALE_COHORT) == GATE_CAP


def test_r12_debt_is_first_past_the_r10_block():
    """The r9-green cohort heads r12's rotation; pin that its block
    ordering survived the r11 reshuffle."""
    names = list(entry_mod.queries())
    for n in R12_DEBT_HEAD:
        assert n in names, n
        assert n not in names[:GATE_CAP], n


def test_registry_values_are_named_callables():
    for name, fn in entry_mod.queries().items():
        assert callable(fn), name
        assert fn.__name__ == name, (name, fn.__name__)


def test_r12_priority_exception_is_real():
    """The pinned window exception must stay TRUE, not rot: every
    R12_PRIORITY query exists, and each one is currently OUTSIDE the
    gate window (when the r12 rotation lands, this pin flips into
    that round's touched-queries window check — the R11_PRIORITY
    lifecycle)."""
    names = list(entry_mod.queries())
    window = set(names[:GATE_CAP])
    for q in R12_PRIORITY:
        assert q in names, q
        assert q not in window, (
            f"{q} entered the window — retire the R12_PRIORITY "
            "exception note and this pin together"
        )


def test_registry_literals_have_no_duplicate_keys():
    """A duplicate key in the queries()/oracle_sql() dict literal is
    invisible at runtime (same value wins, first position kept) but
    corrupts the rotation bookkeeping the comments audit by — r11's
    reshuffle left `curation_pipeline` listed twice. Parse the source
    and refuse duplicates outright."""
    import ast

    src = (
        Path(__file__).resolve().parent.parent / "__spark_entry__.py"
    ).read_text()
    for node in ast.walk(ast.parse(src)):
        if isinstance(node, ast.FunctionDef) and node.name in (
            "queries",
            "oracle_sql",
        ):
            for sub in ast.walk(node):
                if isinstance(sub, ast.Dict):
                    keys = [
                        k.value
                        for k in sub.keys
                        if isinstance(k, ast.Constant)
                    ]
                    dupes = sorted(
                        k for k in set(keys) if keys.count(k) > 1
                    )
                    assert not dupes, (node.name, dupes)


def test_readme_query_count_matches_registry():
    """Counts in prose rot (the r10 verdict caught '133 named
    queries' two rounds stale) — pin every README occurrence of the
    registry count to the live registry instead."""
    readme = (
        Path(__file__).resolve().parent.parent / "README.md"
    ).read_text()
    counts = re.findall(r"(\d+) named queries|all (\d+) —", readme)
    found = [int(a or b) for a, b in counts]
    assert found, "README no longer states the query count"
    n = len(entry_mod.queries())
    assert all(c == n for c in found), (found, n)
