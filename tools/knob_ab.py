"""Interleaved same-session A/B/C of the r12 join knobs.

Both knobs are runtime SQL confs, so each sample sets them just before
running — configs alternate within one session, which removes the
box-drift confound that plagued every cross-run comparison on this
host. Usage: python tools/knob_ab.py [--runs N] query [query ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = {
    "A": {"spark.sql.join.preferSortMergeJoin": "false",
          "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64m"},
    "B": {"spark.sql.join.preferSortMergeJoin": "true",
          "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64m"},
    "C": {"spark.sql.join.preferSortMergeJoin": "true",
          "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "0"},
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from open_pulsar_spark import get_spark, registry

    spark = get_spark("open-pulsar-knob-ab")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.all_queries()
    qs["q1_pricing_summary"](spark, args.sf).collect()
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long").count()

    times: dict[tuple[str, str], list[float]] = {}
    for r in range(args.runs):
        for cfg, confs in CONFIGS.items():
            for k, v in confs.items():
                spark.conf.set(k, v)
            for name in args.queries:
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"ab:{cfg}:{name}")
                t0 = time.time()
                qs[name](spark, args.sf).collect()
                times.setdefault((name, cfg), []).append(time.time() - t0)
    for name in args.queries:
        row = "  ".join(
            f"{cfg}={min(times[(name, cfg)]):5.2f}"
            f"{sorted(round(t, 2) for t in times[(name, cfg)])}"
            for cfg in CONFIGS
        )
        print(f"{name:34s} {row}", flush=True)
    tot = {cfg: sum(min(times[(n, cfg)]) for n in args.queries)
           for cfg in CONFIGS}
    print("TOTAL(min-of-runs)", {k: round(v, 2) for k, v in tot.items()})
    spark.stop()


if __name__ == "__main__":
    main()
