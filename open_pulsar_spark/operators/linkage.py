"""Record linkage: approximate string joins without all-pairs work.

The missing piece between exact dedup (hash equality) and the
set-similarity family (minhash / prefix-filter Jaccard over token
sets): EDIT-DISTANCE matching of short identity strings (names, ids,
titles) — the classic entity-resolution primitive (Splink/dedupe-style
blocking + verify). The reference engine has no analogue; this is part
of the training-data-pipeline surface the brief adds (linking noisy
metadata across snapshots before dedup decides survivorship).

Blocking is the whole game at scale: a naive edit-distance join is
O(n²) string comparisons. `customer_fuzzy_matches` uses the
DELETION-NEIGHBORHOOD scheme (FastSS / SymSpell): two strings are
within Levenshtein distance 1 iff they share a member of
{s} ∪ {s with one char deleted}, so generating |s|+1 variants per row
turns the similarity join into an equi-join on a variant key, and the
(expensive) exact verify runs on candidates only. Distance-k
generalizes with k-deletion neighborhoods (SymSpell) — same plan,
larger constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_pulsar_spark.registry import query
from open_pulsar_spark.tables import load_table

# xxhash64 of {s} ∪ single-deletion variants of s — the distance-1
# blocking keys, hashed inside the transform so only 8-byte keys ever
# leave the projection (explode cannot nest inside another expression).
_DELETION_VARIANT_HASHES = (
    "array_union(array(xxhash64({col})), transform(sequence(1, length({col})), "
    "i -> xxhash64(concat(substring({col}, 1, i - 1), "
    "substring({col}, i + 1, length({col}) - i)))))"
)


@query(
    "customer_fuzzy_matches",
    oracle="""
    SELECT a.c_custkey AS a_custkey,
           b.c_custkey AS b_custkey,
           levenshtein(a.c_name, b.c_name)::BIGINT AS dist
    FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    ORDER BY a_custkey, b_custkey
    """,
)
def customer_fuzzy_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All customer-name pairs within Levenshtein distance 1 — the
    entity-resolution candidate set for a noisy identity column
    (one-keystroke typos, OCR slips, single-digit id drift).

    Plan (vs the oracle's brute-force O(n²) scan): explode each name
    into its |s|+1 deletion-neighborhood variants, equi-join on the
    xxhash64 of the variant (8-byte shuffle key — the string itself
    never shuffles; a hash collision only adds a candidate the exact
    verify then rejects), distinct the candidate KEY pairs (two
    longs — identical strings share every variant, substitutions
    share one), then join the names back and verify exact
    levenshtein ≤ 1 on candidates only. At 100 TB the candidate set
    is |true matches| + collision noise, not n²; the verify join is
    two key-equi-joins against the dimension. The variant explode is
    ~(len+1)× row amplification on the BLOCKING projection only
    (key + 8-byte hash), the standard FastSS trade.
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    variants = cust.select(
        "c_custkey",
        F.explode(
            F.expr(_DELETION_VARIANT_HASHES.format(col="c_name"))
        ).alias("vh"),
    )
    a, b = variants.alias("a"), variants.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.vh") == F.col("b.vh"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .select(
            F.col("a.c_custkey").alias("a_custkey"),
            F.col("b.c_custkey").alias("b_custkey"),
        )
        .distinct()
    )
    an = cust.select(
        F.col("c_custkey").alias("a_custkey"), F.col("c_name").alias("a_name")
    )
    bn = cust.select(
        F.col("c_custkey").alias("b_custkey"), F.col("c_name").alias("b_name")
    )
    return (
        cand.join(an, "a_custkey")
        .join(bn, "b_custkey")
        .withColumn("dist", F.levenshtein("a_name", "b_name").cast("bigint"))
        .where(F.col("dist") <= 1)
        .select("a_custkey", "b_custkey", "dist")
        .orderBy("a_custkey", "b_custkey")
    )
