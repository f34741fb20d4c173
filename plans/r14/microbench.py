"""Targeted microbench: median-of-3 INTERLEAVED timings for the named
queries at $SPARK_GRAFT_SF_DIR (default sf0.1), same methodology as
bench.py (warm-up scan + calibration, fn().count() timed). Usage:
python plans/r14/microbench.py query [query ...]. Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.environ.get("SPARK_GRAFT_REPO", "/root/repo"))

import __spark_entry__ as entry_mod
from mydatasyncer_spark.contract import TABLES, table
from mydatasyncer_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "microbench", **{"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = entry_mod.queries()
    for t in TABLES:
        table(spark, sf_dir, t).count()
    registry["q1_pricing_summary"](spark, sf_dir).count()
    spark.range(0, 1024, 1, 32).mapInPandas(lambda it: it, "id long").count()
    cal_start = time.perf_counter()
    spark.range(0, 200_000_000, 1, 32).selectExpr(
        "sum(pmod(id * 2654435761, 1000003)) AS s"
    ).collect()
    calibration = round(time.perf_counter() - cal_start, 3)
    shots = {n: [] for n in names}
    for _ in range(3):
        for n in names:
            spark.sparkContext.setJobDescription(f"microbench:{n}")
            start = time.perf_counter()
            registry[n](spark, sf_dir).count()
            shots[n].append(round(time.perf_counter() - start, 4))
    medians = {n: sorted(s)[1] for n, s in shots.items()}
    print(json.dumps({
        "calibration": calibration,
        "medians": medians,
        "shots": shots,
    }))
    spark.stop()


if __name__ == "__main__":
    main()


