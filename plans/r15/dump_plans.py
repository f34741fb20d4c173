"""Dump .explain("formatted") for every registered query to
plans/r15/<query>_<tag>.txt. Usage: python plans/r14/dump_plans.py <tag>
[query ...]. Driver-side only (no job execution). Set
SPARK_GRAFT_REPO to dump from a different checkout (e.g. a worktree
at the pre-optimization commit for the _before tag)."""

import contextlib
import io
import os
import sys

sys.path.insert(0, os.environ.get("SPARK_GRAFT_REPO", "/root/repo"))

import __spark_entry__ as entry_mod
from mydatasyncer_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.dirname(os.path.abspath(__file__))
    spark = get_spark(
        "plan-dump", **{"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = entry_mod.queries()
    for name, fn in registry.items():
        if only and name not in only:
            continue
        buf = io.StringIO()
        try:
            df = fn(spark, sf_dir)
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:
            plan = f"ERROR: {type(exc).__name__}: {exc}"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        print(name, "ok" if not plan.startswith("ERROR") else plan[:80], flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
