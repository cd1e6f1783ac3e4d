"""L4 deduplication operators over `documents`: exact, MinHash+LSH,
SimHash, n-gram Jaccard. (Embedding-cosine near-dup lives in
similarity.py next to the ANN operators.)

Scale design — the whole point of these operators is that they stay
shuffle-bounded at 100 TB:

  - exact dedup:      one hash-groupBy on a 128-bit fingerprint.
  - MinHash+LSH:      per-doc signature (map-only) → explode b bands →
                      equi-join on (band, signature) → verify ONLY the
                      candidate pairs. Never all-pairs.
  - SimHash:          map-only 16-bit signature; near-dup pairs via the
                      pigeonhole blocking join (4 blocks of 4 bits —
                      hamming ≤ 3 ⇒ at least one block identical), so
                      candidates come from an equi-join, never a cross
                      join.
  - n-gram Jaccard:   the exact all-pairs formulation, deliberately
                      restricted to a bounded slice — it is the
                      brute-force baseline the LSH paths are verified
                      against, not the scale path.

Hash parity note: signatures use md5 (identical hex in Spark and
DuckDB); MinHash takes the lexicographic MIN of seeded md5 hex strings
(a fixed pseudo-random permutation both engines order identically), so
the oracle reproduces signatures bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_pulsar_spark.registry import query
from open_pulsar_spark.tables import load_table

MINHASH_K = 12
LSH_BANDS = 4
LSH_ROWS = MINHASH_K // LSH_BANDS  # 3
JACCARD_THRESHOLD = 0.5
SIMHASH_BITS = 32
SIMHASH_BLOCKS = 4          # 4 blocks × 8 bits; hamming ≤ 3 ⇒ ≥1 equal block
SIMHASH_HAMMING_MAX = 3


# ---------------------------------------------------------------- helpers
def _shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, sh: distinct word-3-gram shingles)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.split("text", " ").alias("toks"))
        .where(F.size("toks") >= 3)
        .select(
            "doc_id",
            F.array_distinct(
                F.expr(
                    "transform(sequence(0, size(toks) - 3),"
                    " i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"
                )
            ).alias("sh"),
        )
    )


_SHINGLE_SQL = """
    SELECT doc_id,
           list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                          for i in range(1, len(toks) - 1)]) AS sh
    FROM (SELECT doc_id, str_split(text, ' ') AS toks FROM documents)
    WHERE len(toks) >= 3
"""


def _minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sh, mh: array of MINHASH_K lexicographic-min seeded md5)."""
    sh = _shingled(spark, sf_dir)
    mh = F.array(
        *[
            F.array_min(
                F.expr(f"transform(sh, s -> md5(concat('{k}|', s)))")
            )
            for k in range(MINHASH_K)
        ]
    )
    return sh.select("doc_id", "sh", mh.alias("mh"))


_MINHASH_SQL = f"""
    SELECT doc_id, sh,
           [list_min([md5(k::VARCHAR || '|' || s) for s in sh])
            for k in range(0, {MINHASH_K})] AS mh
    FROM shingled
"""


# --------------------------------------------------------------------------
# dedup_exact — hash-groupBy exact duplicate detection.
# --------------------------------------------------------------------------
@query(
    "dedup_exact",
    oracle="""
    SELECT md5(text)    AS fingerprint,
           count(*)     AS n_copies,
           min(doc_id)  AS keep_doc_id
    FROM documents
    GROUP BY md5(text)
    ORDER BY fingerprint
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by content fingerprint, keep the lowest
    doc_id. One shuffle on the 128-bit hash — at 100 TB this is the
    canonical first dedup pass, and the hash key is uniformly
    distributed so there is no skew."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5("text").alias("fingerprint"))
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("keep_doc_id"))
        .orderBy("fingerprint")
    )


# --------------------------------------------------------------------------
# dedup_minhash_lsh — MinHash signatures → LSH banding → verified pairs.
# --------------------------------------------------------------------------
_MINHASH_PAIRS_CTE = f"""
    shingled AS ({_SHINGLE_SQL}),
    sigs AS ({_MINHASH_SQL}),
    bands AS (
        SELECT doc_id, u.band,
               CASE u.band {' '.join(
                   f"WHEN {b} THEN mh[{b * LSH_ROWS + 1}] || mh[{b * LSH_ROWS + 2}] || mh[{b * LSH_ROWS + 3}]"
                   for b in range(LSH_BANDS))} END AS sig
        FROM sigs CROSS JOIN unnest(range(0, {LSH_BANDS})) AS u(band)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
        WHERE a.doc_id < b.doc_id
    ),
    pairs AS (
        SELECT c.a_id, c.b_id
        FROM cand c
        JOIN shingled x ON c.a_id = x.doc_id
        JOIN shingled y ON c.b_id = y.doc_id
        WHERE len(list_filter(x.sh, s -> list_contains(y.sh, s))) * 1.0 /
              (len(x.sh) + len(y.sh)
               - len(list_filter(x.sh, s -> list_contains(y.sh, s)))) >= {JACCARD_THRESHOLD}
    )
"""

@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH shingled AS ({_SHINGLE_SQL}),
    sigs AS ({_MINHASH_SQL}),
    bands AS (
        SELECT doc_id, u.band,
               CASE u.band {' '.join(
                   f"WHEN {b} THEN mh[{b * LSH_ROWS + 1}] || mh[{b * LSH_ROWS + 2}] || mh[{b * LSH_ROWS + 3}]"
                   for b in range(LSH_BANDS))} END AS sig
        FROM sigs CROSS JOIN unnest(range(0, {LSH_BANDS})) AS u(band)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
        WHERE a.doc_id < b.doc_id
    )
    SELECT c.a_id, c.b_id,
           round(len(list_filter(x.sh, s -> list_contains(y.sh, s))) * 1.0 /
                 (len(x.sh) + len(y.sh)
                  - len(list_filter(x.sh, s -> list_contains(y.sh, s)))), 6) AS jaccard
    FROM cand c
    JOIN shingled x ON c.a_id = x.doc_id
    JOIN shingled y ON c.b_id = y.doc_id
    WHERE len(list_filter(x.sh, s -> list_contains(y.sh, s))) * 1.0 /
          (len(x.sh) + len(y.sh)
           - len(list_filter(x.sh, s -> list_contains(y.sh, s)))) >= {JACCARD_THRESHOLD}
    ORDER BY a_id, b_id
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs: MinHash(k=12) → 4 bands × 3 rows → candidate
    equi-join on band signature → exact-Jaccard verify ≥ 0.5.

    Scale: signatures are map-only; the only joins are (a) the band
    equi-join whose fan-out is bounded by real collisions and (b) the
    verify join over candidates. No all-pairs stage anywhere.
    """
    # persist: the signature subplan feeds the band self-join AND the
    # verify join — without it Spark recomputes shingling+minhash 4×.
    sigs = _minhash_signature(spark, sf_dir).persist()
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat(
                            *[F.col("mh")[b * LSH_ROWS + r] for r in range(LSH_ROWS)]
                        ).alias("sig"),
                    )
                    for b in range(LSH_BANDS)
                ]
            )
        ).alias("bs"),
    ).select("doc_id", "bs.band", "bs.sig")

    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.sig") == F.col("b.sig")))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )

    x = sigs.select(F.col("doc_id").alias("a_id"), F.col("sh").alias("sh_a"))
    y = sigs.select(F.col("doc_id").alias("b_id"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jacc = inter * F.lit(1.0) / (F.size("sh_a") + F.size("sh_b") - inter)
    return (
        cand.join(x, "a_id")
        .join(y, "b_id")
        .where(jacc >= JACCARD_THRESHOLD)
        .select("a_id", "b_id", F.round(jacc, 6).alias("jaccard"))
        .orderBy("a_id", "b_id")
    )


# --------------------------------------------------------------------------
# dedup_clusters — transitive closure of near-dup pairs → representatives.
# --------------------------------------------------------------------------
@query(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_MINHASH_PAIRS_CTE},
    edges AS (SELECT a_id AS u, b_id AS v FROM pairs
              UNION ALL SELECT b_id, a_id FROM pairs),
    reach(u, v) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM edges)
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    )
    SELECT u AS doc_id, min(v) AS cluster_rep,
           CASE WHEN u = min(v) THEN 'keep' ELSE 'drop' END AS action
    FROM reach GROUP BY u
    ORDER BY doc_id
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS, not just pairs: transitive closure over the
    MinHash-verified pair graph; every member maps to the cluster's
    minimum doc_id, and only the representative survives ('keep').

    Spark side is iterative min-label propagation (the standard
    large-scale connected-components loop): each round joins labels
    across edges and keeps the elementwise min, until a fixpoint. At
    100 TB each round is one shuffle on the node id; round count is
    the cluster diameter (tiny for dedup graphs — duplicate clusters
    are cliques or near-cliques from the band join). The oracle states
    the same closure as a recursive CTE.
    """
    pairs = dedup_minhash_lsh(spark, sf_dir).select("a_id", "b_id").persist()
    # Branch on count(), not a full collect(): the count materializes
    # the persisted pair set exactly once (executor-side; nothing ships
    # to the driver), and only the small branch ever collects. A
    # limit-probe would be cheaper per se but skips cache population,
    # forcing the LSH pipeline to run twice.
    if pairs.count() <= SMALL_GRAPH_PAIRS:
        # The verified pair graph is the SMALL output of LSH (≈0.1% of
        # corpus); below the threshold a driver-side union-find beats N
        # shuffle rounds. Above it, the distributed min-label loop runs.
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in pairs.collect():
            for n in (r.a_id, r.b_id):
                parent.setdefault(n, n)
            ra, rb = find(r.a_id), find(r.b_id)
            if ra != rb:  # union by min so the representative is min id
                parent[max(ra, rb)] = min(ra, rb)
        pairs.unpersist()
        labels = spark.createDataFrame(
            [(n, find(n)) for n in parent], "u LONG, label LONG"
        )
    else:
        labels = _propagate_labels_distributed(pairs)
    return labels.select(
        F.col("u").alias("doc_id"),
        F.col("label").alias("cluster_rep"),
        F.when(F.col("u") == F.col("label"), "keep").otherwise("drop").alias("action"),
    ).orderBy("doc_id")


SMALL_GRAPH_PAIRS = 100_000


def _propagate_labels_distributed(pairs: DataFrame) -> DataFrame:
    """Iterative min-label propagation (large-scale connected
    components): one shuffle on the node id per round; rounds bounded
    by cluster diameter. Used when the pair graph exceeds
    SMALL_GRAPH_PAIRS."""
    edges = (
        pairs.select(F.col("a_id").alias("u"), F.col("b_id").alias("v"))
        .unionAll(pairs.select(F.col("b_id").alias("u"), F.col("a_id").alias("v")))
        .persist()
    )
    labels = edges.select("u").distinct().withColumn("label", F.col("u")).persist()
    while True:
        neighbor_min = (
            edges.join(labels.withColumnRenamed("u", "v"), "v")
            .groupBy("u")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, "u", "left")
            .select("u", F.least("label", F.coalesce("nmin", "label")).alias("label"))
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "u")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    return labels


# --------------------------------------------------------------------------
# minhash_band_profile — signature/bucket profile (always-nonempty check
# that both engines compute identical signatures).
# --------------------------------------------------------------------------
@query(
    "minhash_band_profile",
    oracle=f"""
    WITH shingled AS ({_SHINGLE_SQL}),
    sigs AS ({_MINHASH_SQL})
    SELECT doc_id, len(sh) AS n_shingles,
           mh[1] AS h0, mh[{MINHASH_K}] AS h_last
    FROM sigs
    ORDER BY doc_id
    """,
)
def minhash_band_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc MinHash signature endpoints — pins the signature
    computation itself (not just surviving pairs) to the oracle."""
    sigs = _minhash_signature(spark, sf_dir)
    return sigs.select(
        "doc_id",
        F.size("sh").alias("n_shingles"),
        F.col("mh")[0].alias("h0"),
        F.col("mh")[MINHASH_K - 1].alias("h_last"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# doc_simhash — 16-bit SimHash signature per document.
# --------------------------------------------------------------------------
_SIMHASH_SUM_SQL = ", ".join(
    f"sum((((hv >> {j}) & 1) * 2 - 1)) AS s{j}" for j in range(SIMHASH_BITS)
)
_SIMHASH_FOLD_SQL = " + ".join(
    f"(CASE WHEN s{j} > 0 THEN {1 << j}::BIGINT ELSE 0 END)" for j in range(SIMHASH_BITS)
)

@query(
    "doc_simhash",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id,
               unnest(list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                                     for i in range(1, len(toks) - 1)])) AS t
        FROM (SELECT doc_id, str_split(text, ' ') AS toks FROM documents)
        WHERE len(toks) >= 3),
    h AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS hv FROM tok),
    s AS (SELECT doc_id, {_SIMHASH_SUM_SQL} FROM h GROUP BY doc_id)
    SELECT doc_id, {_SIMHASH_FOLD_SQL} AS simhash
    FROM s
    ORDER BY doc_id
    """,
)
def doc_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash over word-3-gram shingle features: per shingle
    take 60 bits of md5, vote ±1 per bit position, fold sign votes
    into the signature. Shingles (not unigrams) because distinctive
    features are what make SimHash discriminate — and one explode +
    one groupBy on doc_id is still the whole plan."""
    tok = _shingled(spark, sf_dir).select(
        "doc_id", F.explode("sh").alias("t")
    )
    h = tok.select(
        "doc_id",
        F.conv(F.substring(F.md5("t"), 1, 15), 16, 10).cast("bigint").alias("hv"),
    )
    sums = h.groupBy("doc_id").agg(
        *[
            F.sum((F.shiftright("hv", j).bitwiseAND(1)) * 2 - 1).alias(f"s{j}")
            for j in range(SIMHASH_BITS)
        ]
    )
    simhash = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(0)
        simhash = term if simhash is None else simhash + term
    return sums.select("doc_id", simhash.alias("simhash")).orderBy("doc_id")


# --------------------------------------------------------------------------
# dedup_simhash_pairs — near-dup pairs via pigeonhole block join.
# --------------------------------------------------------------------------
_SIMHASH_CTE = f"""
    tok AS (
        SELECT doc_id,
               unnest(list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                                     for i in range(1, len(toks) - 1)])) AS t
        FROM (SELECT doc_id, str_split(text, ' ') AS toks FROM documents)
        WHERE len(toks) >= 3),
    h AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS hv FROM tok),
    s AS (SELECT doc_id, {_SIMHASH_SUM_SQL} FROM h GROUP BY doc_id),
    sig AS (SELECT doc_id, {_SIMHASH_FOLD_SQL} AS simhash FROM s)
"""

@query(
    "dedup_simhash_pairs",
    oracle=f"""
    WITH {_SIMHASH_CTE},
    blocks AS (
        SELECT doc_id, simhash, u.blk,
               (simhash >> (u.blk * 8)) & 255 AS blk_val
        FROM sig CROSS JOIN unnest(range(0, {SIMHASH_BLOCKS})) AS u(blk)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
               a.simhash AS sim_a, b.simhash AS sim_b
        FROM blocks a JOIN blocks b ON a.blk = b.blk AND a.blk_val = b.blk_val
        WHERE a.doc_id < b.doc_id
    )
    SELECT a_id, b_id, bit_count(xor(sim_a, sim_b)) AS hamming
    FROM cand
    WHERE bit_count(xor(sim_a, sim_b)) <= {SIMHASH_HAMMING_MAX}
    ORDER BY a_id, b_id
    """,
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs with hamming ≤ 3, candidates from the
    pigeonhole block join: 32 bits in 4 blocks of 8 — any pair within
    hamming 3 shares at least one identical block, so candidates come
    from an equi-join on (block_idx, block_value), never a cross join."""
    # persist: both sides of the block self-join reference the simhash
    # subplan (explode + md5 + 32-way agg) — cache it, compute once.
    sig = doc_simhash(spark, sf_dir).persist()
    blocks = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(blk).alias("blk"),
                        F.shiftright("simhash", blk * 8).bitwiseAND(255).alias("blk_val"),
                    )
                    for blk in range(SIMHASH_BLOCKS)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "simhash", "b.blk", "b.blk_val")
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.blk_val") == F.col("b.blk_val")))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cand.where(hamming <= SIMHASH_HAMMING_MAX)
        .select("a_id", "b_id", hamming.alias("hamming"))
        .orderBy("a_id", "b_id")
    )


# --------------------------------------------------------------------------
# dedup_ngram_jaccard — brute-force baseline on a bounded slice.
# --------------------------------------------------------------------------
@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH shingled AS ({_SHINGLE_SQL.replace("FROM documents", "FROM documents")}),
    sliced AS (SELECT * FROM shingled WHERE doc_id < 150)
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           round(len(list_filter(a.sh, s -> list_contains(b.sh, s))) * 1.0 /
                 (len(a.sh) + len(b.sh)
                  - len(list_filter(a.sh, s -> list_contains(b.sh, s)))), 6) AS jaccard
    FROM sliced a JOIN sliced b ON a.doc_id < b.doc_id
    WHERE len(list_filter(a.sh, s -> list_contains(b.sh, s))) * 1.0 /
          (len(a.sh) + len(b.sh)
           - len(list_filter(a.sh, s -> list_contains(b.sh, s)))) >= 0.02
    ORDER BY a_id, b_id
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs 3-gram Jaccard on doc_id < 150 — the brute-force
    ground truth the LSH operators are validated against. Bounded slice
    on purpose: the all-pairs formulation is O(n²) and is NOT the
    100 TB path (dedup_minhash_lsh is)."""
    sh = _shingled(spark, sf_dir).where(F.col("doc_id") < 150)
    a = sh.select(F.col("doc_id").alias("a_id"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("b_id"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jacc = inter * F.lit(1.0) / (F.size("sh_a") + F.size("sh_b") - inter)
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .where(jacc >= 0.02)
        .select("a_id", "b_id", F.round(jacc, 6).alias("jaccard"))
        .orderBy("a_id", "b_id")
    )
