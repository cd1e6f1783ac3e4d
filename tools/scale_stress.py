"""Scale-sensitivity smoke: replicate the big tables N× and measure
how the registered queries' runtimes scale.

The correctness gate runs at sf0.01 and bench at sf0.1; this tool
answers the next question — does runtime grow ~linearly with data, or
is something quadratic/skew-bound hiding below the test sizes? It
builds a synthetic sf-dir whose FACT tables (documents, embeddings,
events, lineitem, orders) are the sf0.1 data unioned N times with
id-offsets (dimension tables copied as-is), then times real registry
queries against it.

Replica perturbation (keeps the measurement falsifiable): a naive
N× replication makes every replica a TRUE duplicate of the original,
so the near-dup/similarity pair set grows ~quadratically in N by
construction — the tool then cannot distinguish "operator is
superlinear" from "output is superlinear". So replicas i>0 are
deterministically perturbed:
  - documents.text: every token is prefixed with a replica tag
    (r{i}…) — all shingles change, so cross-replica Jaccard ≈ 0 while
    WITHIN-replica near-dups survive verbatim (both sides perturbed
    identically). The true pair count scales ~linearly in N.
  - embeddings.embedding: per-(replica, vec, dim) hash-keyed additive
    noise at ~1× the vector's mean |x| — cross-replica cosine drops
    far below any dedup threshold (and replica-internal near-pairs
    mostly break too, so the true pair set is bounded by replica 0's).
Replica 0 is byte-identical to the base data, so x1-vs-xN compares
like against like.

Results are written to stdout as one JSON line:
  {"factor": N, "queries": {name: {"x1": s, "xN": s, "ratio": r}}}
A ratio near N is linear scaling; well above N is the smell this tool
exists to catch. The replica lives under .scale-stress/ (gitignored)
and is rebuilt only when missing.

Usage: python tools/scale_stress.py [factor] [query ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF = "/root/testdata/sf0.1"
WORK = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale-stress"
)

# fact tables replicate with id offsets; dims copy as-is
FACTS = {
    "documents": "doc_id",
    "embeddings": "vec_id",
    "events": "event_id",
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
}
DIMS = ("region", "nation", "customer", "supplier", "part")

DEFAULT_QUERIES = [
    "q1_pricing_summary",
    "q5_region_revenue",
    "dedup_exact",
    "dedup_minhash_lsh",
    "doc_text_stats",
    "events_rollup_cascade",
    "source_kmv_distinct",
    "ann_lsh_bucketed",
    # round-4 families: iterative graph + SAX blocking scale with their
    # own fact tables (lineitem / events)
    "part_copurchase_pagerank",
    "user_value_sax_blocks",
]


def _perturb(name: str, copy, i: int):
    """Deterministic per-replica perturbation (identity for replica 0):
    holds the true duplicate/similar-pair RATE constant as the data
    scales, so a superlinear runtime ratio indicts the plan, not the
    output size."""
    from pyspark.sql import functions as F

    if i == 0:
        return copy
    if name == "documents":
        # prefix every token with a replica tag: all word-shingles (and
        # simhash/minhash features) change, cross-replica Jaccard ~ 0
        return copy.withColumn(
            "text", F.regexp_replace(F.col("text"), r"(\S+)", f"r{i}$1")
        )
    if name == "embeddings":
        # additive hash-keyed noise, amplitude ~ the vector's mean |x|:
        # cross-replica cosine collapses; within-replica pairs keep the
        # base data's exact geometry (rigid identical perturbation is
        # NOT used — each vec gets its own noise — but base-pair
        # similarity only matters within replica 0; the pair RATE per
        # replica stays bounded either way)
        mean_abs = F.aggregate(
            "embedding", F.lit(0.0), lambda a, x: a + F.abs(x)
        ) / F.size("embedding")
        vid = F.col("vec_id")
        return copy.withColumn(
            "embedding",
            F.transform(
                "embedding",
                # pmod keeps the noise symmetric in ±1× mean|x|: plain %
                # preserves the dividend's sign (range -2000..2000, ~2×
                # amplitude) and drops half the distribution's symmetry
                lambda x, j: (
                    x
                    + mean_abs
                    * (
                        F.pmod(F.hash(vid, j, F.lit(i)), F.lit(2001)).cast("float")
                        / 1000.0
                        - 1.0
                    )
                ).cast("float"),
            ),
        )
    return copy


def build_replica(spark, factor: int) -> str:
    from pyspark.sql import functions as F

    from open_pulsar_spark.tables import load_table

    dest = os.path.join(WORK, f"x{factor}")
    marker = os.path.join(dest, "_READY")
    if os.path.exists(marker):
        return dest
    shutil.rmtree(dest, ignore_errors=True)
    os.makedirs(dest, exist_ok=True)
    # orders and lineitem SHARE the orderkey id space: their offset
    # span must be computed jointly, or replicas misalign the join key
    # whenever max(l_orderkey) != max(o_orderkey) (orders with no
    # lineitems at the top of the range) and every cross-table join
    # silently matches only replica 0.
    shared_span = (
        max(
            load_table(spark, BASE_SF, "orders").agg(F.max("o_orderkey")).collect()[0][0],
            load_table(spark, BASE_SF, "lineitem").agg(F.max("l_orderkey")).collect()[0][0],
        )
        + 1
    )
    for name, id_col in FACTS.items():
        df = load_table(spark, BASE_SF, name)
        if name in ("orders", "lineitem"):
            span = shared_span
        else:
            span = df.agg(F.max(id_col)).collect()[0][0] + 1
        copies = [
            _perturb(name, df.withColumn(id_col, F.col(id_col) + F.lit(i * span)), i)
            for i in range(factor)
        ]
        out = copies[0]
        for c in copies[1:]:
            out = out.unionAll(c)
        out.write.mode("overwrite").parquet(os.path.join(dest, f"{name}.parquet"))
    for name in DIMS:
        load_table(spark, BASE_SF, name).write.mode("overwrite").parquet(
            os.path.join(dest, f"{name}.parquet")
        )
    open(marker, "w").close()
    return dest


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    names = sys.argv[2:] or DEFAULT_QUERIES

    from open_pulsar_spark import get_spark, registry

    spark = get_spark("scale-stress")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.all_queries()

    dest = build_replica(spark, factor)

    # warm the JVM / Arrow workers off the clock
    qs["q1_pricing_summary"](spark, BASE_SF).collect()
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long").count()

    def best_of_two(name: str, sf_dir: str) -> float:
        times = []
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.time()
            qs[name](spark, sf_dir).collect()
            times.append(time.time() - t0)
        return min(times)

    out: dict[str, dict] = {}
    for name in names:
        t1 = best_of_two(name, BASE_SF)
        tn = best_of_two(name, dest)
        out[name] = {
            "x1": round(t1, 3),
            f"x{factor}": round(tn, 3),
            "ratio": round(tn / t1, 2) if t1 > 0 else None,
        }
        print(f"# {name}: x1={t1:.2f}s x{factor}={tn:.2f}s ratio={tn / t1:.2f}", file=sys.stderr)

    print(json.dumps({"factor": factor, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
