"""Enumerate explicit broadcast hints over SF-linear tables in every
registered query (the SCALE.md hint rule — see open_pulsar_spark/plan_hints).

Usage: python tools/hint_audit.py [sf_dir]

Prints one line per hint that touches an SF-linear table:
    <query>  tables={...}  bounding=<bool>
Exit code 1 if any hint lacks a bounding operator (raw broadcast of an
SF-linear table — the hard 100 TB failure class).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from open_pulsar_spark import get_spark, registry
    from open_pulsar_spark.plan_hints import broadcast_hints

    spark = get_spark("hint-audit")
    spark.sparkContext.setLogLevel("ERROR")
    raw = 0
    for name, fn in sorted(registry.all_queries().items()):
        try:
            df = fn(spark, sf_dir)
        except Exception as exc:  # noqa: BLE001
            print(f"{name}  BUILD-ERROR {type(exc).__name__}: {exc}", flush=True)
            raw += 1
            continue
        for h in broadcast_hints(df):
            if not h.sf_linear_tables:
                continue
            print(
                f"{name}  tables={sorted(h.tables)}  bounding={h.has_bounding_op}",
                flush=True,
            )
            if not h.has_bounding_op:
                raw += 1
    spark.stop()
    sys.exit(1 if raw else 0)


if __name__ == "__main__":
    main()
