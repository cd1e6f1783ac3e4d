"""Streaming posting-index maintenance — per-term bounded posting
samples of an unbounded document stream, kept as mergeable bottom-k
partial segments (the incremental form of
operators.text.term_posting_index's posting side).

A 100 TB ingest wants "which documents carry this term" answerable
without re-scanning history — contamination lookups and
exact-substring attribution consult it at serve time. The bottom-k
posting sample is the right store for the same reason the KMV sketch
is (kmv_stream's contract, same kernel, same merge):

  micro-batch of (doc_id, source, text)
    → tokens → per-(term, Arrow batch) bottom-k doc_id partial
      (the SAME sketch.bottom_k_kernel the batch index runs —
      truncation inside the map task, ≤ k rows per term per batch)
    → one epoch segment of (term, doc_id) rows

  fold: bottom-k of the distinct union of all segment rows per term
    == the batch sample of the union of all batches' rows, exactly —
    so a stream-maintained posting sample and term_posting_index's
    over the same rows are BIT-IDENTICAL (tested), whatever the
    batching.

Replay contract: the shared segments.update_partial_store contract
(epoch-overwrite segments give exactly-once partials under
at-least-once foreachBatch), and the fold is duplicate-TOLERANT
(array_distinct before the slice), so crash-duplicated rows and
repeated epoch-less backfills cannot change the result.

Scale: each epoch segment holds ≤ k rows per term SEEN IN THAT BATCH
(not per term in the vocabulary); the read-side merge is O(live
segment rows). Serving a bounded query (the usual case) should pass
`terms` to read_postings so the merge aggregates only the probed
terms — maintaining the full vocabulary's samples is the index
builder's job, probing a handful is the serve path's.

Unlike the hash-only stores (kmv, cms, drift), this store carries raw
doc_ids — so it needs the same right-to-be-forgotten path as the
neardup/embedding indexes, PLUS one hazard those share but this store
must close: an at-least-once replay can RECOMPUTE a purged document's
rows from source (epoch committed → compaction removed its dir →
crash before the checkpoint commit → replay rebuilds the epoch).
A one-time rewrite therefore cannot make the guarantee absolute;
deletions are durable TOMBSTONES (a sibling parquet store) that
delete_from_posting_index appends to and every read anti-joins —
the physical rows are also dropped at delete time (compact_segments'
drop_ids protocol), but serving correctness never depends on that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_pulsar_spark.operators.text import _posting_kernel, _posting_merge
from open_pulsar_spark.streaming.segments import (
    append_tombstones,
    compact_segments,
    exclude_tombstoned,
    read_segments,
    start_partial_stream,
    update_partial_store,
)

_PARTIAL_SCHEMA = "term STRING, doc_id LONG, epoch LONG"
_DEDUP_KEYS = ["epoch", "term", "doc_id"]
_CLUSTER_COLS = ["term"]


def _posting_partial(docs: DataFrame) -> DataFrame:
    """tokens → per-batch bottom-k doc_id rows per term (the SAME
    tokenizer and kernel as term_posting_index, so the fold
    bit-matches the batch index)."""
    tok = docs.select(
        F.explode(F.split("text", " ")).alias("term"), "doc_id"
    )
    return tok.mapInPandas(_posting_kernel(), "term STRING, doc_id LONG")


def update_postings(
    spark: SparkSession,
    docs: DataFrame,
    store_path: str,
    epoch_id: int | None,
) -> None:
    """Fold one batch of (doc_id, ..., text) rows into the posting
    store: tokens → bottom-k partial rows → one epoch segment.
    Idempotent per epoch (the shared update_partial_store contract);
    epoch-less calls write a unique batch segment, safe because the
    fold is duplicate-tolerant (module docstring)."""
    update_partial_store(docs, store_path, epoch_id, _posting_partial)


def read_postings(
    spark: SparkSession,
    store_path: str,
    terms: DataFrame | list[str] | None = None,
) -> DataFrame:
    """The current merged samples (term, posting_sample) — the
    bottom-k of the distinct union of every segment's rows,
    bit-identical to the batch index's sample over the same rows.
    Pass `terms` to merge only the probed terms: an iterable of
    strings, a 1-column string DataFrame (any column name — renamed
    positionally), or a wider DataFrame that carries a column named
    `term`. The probe is a left-semi join, not an IN literal,
    so a contamination check probing thousands of n-gram terms costs
    one join, not an O(|terms|) py4j expression (and AQE picks
    broadcast-vs-shuffle by the probe's actual size — a benchmark-
    scale probe of millions of n-grams must not be force-broadcast).
    Tombstoned doc_ids are excluded unconditionally (module
    docstring: serving correctness never depends on the physical
    delete having stuck through a replay)."""
    raw = read_segments(spark, store_path, _PARTIAL_SCHEMA)
    if raw is None:
        return spark.createDataFrame(
            [], "term STRING, posting_sample STRING"
        )
    rows = exclude_tombstoned(
        spark, raw.select("term", "doc_id"), store_path, "doc_id"
    )
    if terms is not None:
        if not isinstance(terms, DataFrame):
            terms = spark.createDataFrame(
                [(str(t),) for t in terms], "term STRING"
            )
        elif len(terms.columns) > 1:
            # multi-column probe frames keep working via name lookup;
            # only a 1-column frame is positionally renamed
            terms = terms.select("term")
        probe = terms.toDF("term").dropDuplicates(["term"])
        rows = rows.join(probe, "term", "left_semi")
    return _posting_merge(rows)


def delete_from_posting_index(
    spark: SparkSession, store_path: str, doc_ids, target_files: int = 8
) -> int:
    """DELETE PROPAGATION (right-to-be-forgotten): durably tombstone
    the given doc_ids, then rewrite the posting store without them.
    `doc_ids` is a 1-column DataFrame or an iterable of ids. Returns
    surviving row count.

    Two layers, and the ORDER is the contract:
    1. The ids append to the sibling tombstone store FIRST — every
       read anti-joins tombstones, so from this moment the ids cannot
       be served even if a crash-window epoch replay recomputes their
       rows from source (the hazard a one-time rewrite cannot close:
       epoch committed → compaction removed its dir → crash before
       the checkpoint commit → replay rebuilds the epoch, purged rows
       included).
    2. The physical rows are dropped by a compaction carrying the
       FULL tombstone set as drop_ids (same crash-safe segment-swap
       protocol as neardup_stream.delete_from_index) — storage
       hygiene, re-run safe, and re-applied by any later delete.

    Deletion is exact on the stored partial rows (the fold is
    unchanged); because the store is a bottom-k SAMPLE, a purged
    term's sample may hold fewer ids than a fresh rebuild over the
    surviving corpus would — candidates truncated at ingest are not
    recoverable. The RTBF guarantee (purged ids never served) is
    absolute via layer 1 (tested, including the replay-after-delete
    window)."""
    append_tombstones(spark, store_path, doc_ids, "doc_id")
    # id_col alone makes the compaction fold in the FULL tombstone set
    return compact_segments(
        spark,
        store_path,
        _PARTIAL_SCHEMA,
        dedup_keys=_DEDUP_KEYS,
        cluster_cols=_CLUSTER_COLS,
        target_files=target_files,
        id_col="doc_id",
    )


def start_posting_stream(
    spark: SparkSession,
    docs_stream: DataFrame,
    store_path: str,
    checkpoint: str,
    compact_max_segments: int | None = 64,
):
    """docs(doc_id, ..., text) stream → continuously-maintained
    posting store, on the shared partial-stream scaffold. File-level
    auto-compaction bounds the segment count; the duplicate-tolerant
    fold makes the mid-compaction window a non-event (the kmv_stream
    contract)."""
    return start_partial_stream(
        docs_stream,
        store_path,
        checkpoint,
        partial_of=_posting_partial,
        schema=_PARTIAL_SCHEMA,
        dedup_keys=_DEDUP_KEYS,
        cluster_cols=_CLUSTER_COLS,
        compact_max_segments=compact_max_segments,
        id_col="doc_id",
    )
