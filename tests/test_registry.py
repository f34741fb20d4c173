"""Registry hygiene: fast, Spark-free pins on the driver-contract
surface in ``__spark_entry__.py``.

The driver's correctness gate evaluates only the FIRST 50 entries of
``queries()``, so window membership is load-bearing — r5's
hand-counted rotation comment silently misplaced one query
(`array_functions_pack` sat at position 51 while labeled in-window).
These tests make the boundary and the queries/oracles pairing
machine-checked instead.

r12 change (r11 verdict, what's-wrong #1): the stale cohort is no
longer a hand-maintained name list — prose-counting it produced two
rot bugs in two rounds (r5's off-by-one placement, r11's "46-query"
label on a 45-query cohort). The cohort is now COMPUTED from the
``CORRECTNESS_r*.json`` files the driver itself writes: a query's
proof age is when it last appeared green in a gate run, so "the
last-green-rN cohort" is derivable, not quotable."""

from __future__ import annotations

import json
import re
from pathlib import Path

import __spark_entry__ as entry_mod

GATE_CAP = 50
REPO = Path(__file__).resolve().parent.parent

# the r15 window boundary, pinned by name: position 50 (last inside
# the driver gate) and position 51 (first outside). Update these —
# consciously — whenever the rotation changes.
LAST_IN_WINDOW = "sessionization"
FIRST_PAST_CAP = "skew_salted_join"

# rule-2 (r15): queries REWRITTEN in the r14/r15 optimization rounds
# AFTER their last driver-oracle proof (r13) — the r14 verdict's
# item-#2 list verbatim, plus the three r15-touched queries
# (contamination_check Expand split, diff_pruned_* size-adaptive
# strategy, quality_model_score_stored resolve path). Their
# equivalence rests on local tests until the driver gate re-greens
# them, so they take the window slots ahead of plain debt.
R15_TOUCHED = [
    "contamination_check",
    "quality_model_score_stored",
    "diff_pruned_counts",
    "diff_pruned_localized",
    "diff_full_localized",
    "q21_sole_late_supplier",
    "table_profile",
    "incremental_rollup",
    "incremental_rollup_minmax",
    "ivm_join_view_left",
    "ivm_join_view_orders",
    "dedup_jaccard_incremental",
    "dedup_jaccard_incr_reorder",
    "dedup_jaccard_join_exact",
    "dedup_minhash_incr",
    "dedup_containment_join",
    "dedup_containment_inv",
    "dedup_containment_probe",
    "curation_pipeline",
    "curation_pipeline_scored",
    "unigram_perplexity_stored",
]


def _green(round_tag: str) -> set[str]:
    """Queries that passed the driver gate in a recorded round —
    the machine-readable ground truth the rotation policy is defined
    over (rows+schema green, no error, and the value hash not
    recorded as a mismatch)."""
    data = json.loads(
        (REPO / f"CORRECTNESS_r{round_tag}.json").read_text()
    )
    return {
        name
        for name, v in data.items()
        if v.get("rows_match")
        and v.get("schema_match")
        and not v.get("err")
        and v.get("hash_match") is not False
    }


def _stale_cohort() -> set[str]:
    """The last-green-r12 cohort — r15's rotation debt, computed:
    green in the r12 gate and never re-greened since. The r14 window
    is read from CORRECTNESS_r14.json's own keys (the registry order
    no longer encodes it after the r15 rotation)."""
    r14_window = set(
        json.loads((REPO / "CORRECTNESS_r14.json").read_text())
    )
    return _green("12") - _green("13") - r14_window


def _r16_debt() -> set[str]:
    """r16's rotation debt (assuming the r15 window goes green): the
    last-green-r12 cohort members the r15 window had no slot for."""
    window = set(list(entry_mod.queries())[:GATE_CAP])
    return _stale_cohort() - window


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
    missing = [n for n in R15_TOUCHED if n not in window]
    assert not missing, missing


def test_stale_cohort_rotated_into_the_window():
    """The window is EXACTLY the rule-2 touched list + the
    alphabetical head of the remaining last-green-r12 debt — no
    silent filler displacing a debt entry, and the cut position
    derivable from the files alone. The cohort size is asserted too,
    so a missing or truncated CORRECTNESS file fails loudly instead
    of silently shrinking the debt."""
    cohort = _stale_cohort()
    assert len(cohort) == 45, sorted(cohort)
    window = set(list(entry_mod.queries())[:GATE_CAP])
    fill = sorted(cohort - set(R15_TOUCHED))[: GATE_CAP - len(R15_TOUCHED)]
    assert window == set(R15_TOUCHED) | set(fill), (
        sorted(window - (set(R15_TOUCHED) | set(fill))),
        sorted((set(R15_TOUCHED) | set(fill)) - window),
    )
    assert len(R15_TOUCHED) + len(fill) == GATE_CAP


def test_r16_debt_is_recorded_and_outside_the_window():
    """r16's rotation debt is computed now so the next round's window
    is planned against it: the 7 alphabetically-last members of the
    last-green-r12 cohort (45 in the cohort, minus the 9 doubling as
    rule-2 touched entries and the 29 rule-3 fill slots)."""
    names = list(entry_mod.queries())
    debt = _r16_debt()
    assert len(debt) == 7, sorted(debt)
    window = set(names[:GATE_CAP])
    for n in sorted(debt):
        assert n in names, n
        assert n not in window, n


def test_registry_values_are_named_callables():
    for name, fn in entry_mod.queries().items():
        assert callable(fn), name
        assert fn.__name__ == name, (name, fn.__name__)


def test_registry_literals_have_no_duplicate_keys():
    """A duplicate key in the queries()/oracle_sql() dict literal is
    invisible at runtime (same value wins, first position kept) but
    corrupts the rotation bookkeeping the comments audit by — r11's
    reshuffle left `curation_pipeline` listed twice. Parse the source
    and refuse duplicates outright."""
    import ast

    src = (REPO / "__spark_entry__.py").read_text()
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
    readme = (REPO / "README.md").read_text()
    counts = re.findall(r"(\d+) named queries|all (\d+) —", readme)
    found = [int(a or b) for a, b in counts]
    assert found, "README no longer states the query count"
    n = len(entry_mod.queries())
    assert all(c == n for c in found), (found, n)
