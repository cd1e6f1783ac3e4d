"""Capture the INNER physical plans of EAGER queries.

Several operators collect a bounded result while their caches are live
and return a local frame, so their own explain() is a bare
LocalTableScan. This tool monkeypatches DataFrame.collect to dump
explain("formatted") of every frame collected while the query runs —
the judge-facing plan evidence for the eager family.

Usage:
    python tools/capture_inner_plans.py [--sf DIR] [--tag before|after]
                                        query [query ...]

Writes plans/r13/<query>_inner<k>_<tag>.txt (k = collect order).
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", default="before")
    args = ap.parse_args()

    # Spark 4: the concrete class is classic.dataframe.DataFrame —
    # patching the pyspark.sql.DataFrame facade never fires
    from pyspark.sql.classic.dataframe import DataFrame

    from open_pulsar_spark import get_spark, registry

    spark = get_spark("open-pulsar-inner-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.all_queries()

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r13",
    )
    os.makedirs(plans_dir, exist_ok=True)

    state = {"name": None, "k": 0}
    orig_collect = DataFrame.collect

    def patched(self):
        if state["name"] is not None:
            state["k"] += 1
            buf = io.StringIO()
            with redirect_stdout(buf):
                self.explain("formatted")
            path = os.path.join(
                plans_dir,
                f"{state['name']}_inner{state['k']}_{args.tag}.txt",
            )
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
        return orig_collect(self)

    DataFrame.collect = patched
    try:
        for name in args.queries:
            if name not in qs:
                print(f"!! unknown query {name}", flush=True)
                continue
            spark.catalog.clearCache()
            state["name"], state["k"] = name, 0
            n = len(qs[name](spark, args.sf).collect())
            print(f"{name}: {state['k']} inner plans captured ({n} rows)",
                  flush=True)
            state["name"] = None
    finally:
        DataFrame.collect = orig_collect
    spark.stop()


if __name__ == "__main__":
    main()
