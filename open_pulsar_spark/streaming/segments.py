"""Epoch-keyed parquet segment store — the shared persistence protocol
behind the incremental dedup streams (text: neardup_stream, embedding:
embedding_stream).

Layout: one directory per committed write under a root —
  root/epoch=<id>/      a stream epoch's rows (replay target)
  root/batch-<token>/   a backfill batch's rows (caller-managed)
  root/compact-<token>/ a compaction's merged output

Invariants the protocol provides:
  - REPLAY SAFETY: `write_segment` with an epoch id overwrites its own
    segment and is a no-op once the segment committed (_SUCCESS), so
    at-least-once foreachBatch delivery yields exactly-once contents.
  - NO INDEX-LESS WINDOW: compaction writes the merged rows into a new
    `compact-` segment INSIDE the live root, then deletes the sources;
    a concurrent reader sees old+new (duplicate rows — callers must
    tolerate duplicates, which the dedup candidate joins do) but never
    an empty root.
  - CRASH SAFETY: a crash between compaction write and source delete
    leaves duplicates that the next compaction's dropDuplicates
    removes; a crash mid-write leaves an uncommitted segment that the
    next replay overwrites.

Deployment note: commit detection relies on the _SUCCESS marker, which
Spark's file committers write by default; deployments that disable
`mapreduce.fileoutputcommitter.marksuccessfuljobs` must keep it on for
these index roots (or every segment would read as uncommitted).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def collapse_same_id(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Same-id rows in one delivery are the same document; collapse
    them DETERMINISTICALLY (max text wins) — the ONE collapse rule the
    incremental streams share. dropDuplicates picks an arbitrary row,
    and a replay that picked different text than the original run
    would write different index rows than the committed output."""
    from pyspark.sql import functions as F

    return docs.groupBy(id_col).agg(F.max(text_col).alias(text_col))


def list_segments(root: str) -> list[str]:
    """Committed (has _SUCCESS) segment dirs under root, sorted."""
    if not os.path.isdir(root):
        return []
    return sorted(
        os.path.join(root, d)
        for d in os.listdir(root)
        if os.path.isdir(os.path.join(root, d))
        and os.path.exists(os.path.join(root, d, "_SUCCESS"))
    )


def read_segments(spark: SparkSession, root: str, schema: str) -> DataFrame | None:
    """All committed rows, or None when the store is empty. Explicit
    path list (no partition discovery) so epoch/batch/compact segments
    coexist; duplicates across segments are the caller's contract."""
    dirs = list_segments(root)
    if not dirs:
        return None
    return spark.read.schema(schema).parquet(*dirs)


def segment_path(root: str, epoch_id: int | None) -> tuple[str, bool]:
    """(target dir, already_committed) for a write. Epoch-less writes
    get a unique batch segment (never 'already committed')."""
    if epoch_id is not None:
        seg = os.path.join(root, f"epoch={epoch_id}")
        return seg, os.path.exists(os.path.join(seg, "_SUCCESS"))
    return os.path.join(root, f"batch-{uuid.uuid4().hex[:12]}"), False


def write_segment(df: DataFrame, root: str, epoch_id: int | None) -> str:
    """Write df into its segment (overwrite; skipped when the epoch
    already committed). Returns the segment path — callers that need
    the written rows should READ THEM BACK from the returned path:
    that makes the write the materialization point, so no consumer
    recomputes the producing plan after caches are released."""
    seg, committed = segment_path(root, epoch_id)
    if not committed:
        df.write.mode("overwrite").parquet(seg)
    return seg


def update_partial_store(
    docs: DataFrame,
    store_path: str,
    epoch_id: int | None,
    partial_of,
) -> None:
    """Fold one micro-batch into a partial-segment store: skip a
    committed epoch, run the caller's `partial_of(docs)` kernel, stamp
    the epoch column, write one segment. The shared write half of every
    mergeable-partial stream (kmv_stream, posting_stream) — the replay
    contract (epoch-overwrite segments, -1 sentinel for epoch-less
    backfills) lives HERE so the stream modules cannot diverge on it."""
    if epoch_id is not None:
        _, committed = segment_path(store_path, epoch_id)
        if committed:
            return
    from pyspark.sql import functions as F

    partial = partial_of(docs).withColumn(
        "epoch", F.lit(-1 if epoch_id is None else epoch_id).cast("long")
    )
    write_segment(partial, store_path, epoch_id)


def start_partial_stream(
    stream: DataFrame,
    store_path: str,
    checkpoint: str,
    *,
    partial_of,
    schema: str,
    dedup_keys: list[str],
    cluster_cols: list[str],
    compact_max_segments: int | None = 64,
    id_col: str | None = None,
):
    """The shared foreachBatch scaffold of the mergeable-partial
    streams: per micro-batch, update_partial_store then threshold-
    triggered auto_compact. Callers supply only what genuinely differs
    — the partial kernel, the partial schema, the compaction keys, and
    (for id-bearing stores) the tombstone id column so routine
    compaction scrubs purged rows (auto_compact docstring)."""

    def step(batch_df: DataFrame, epoch_id: int) -> None:
        update_partial_store(batch_df, store_path, epoch_id, partial_of)
        auto_compact(
            batch_df.sparkSession,
            store_path,
            schema,
            dedup_keys=dedup_keys,
            cluster_cols=cluster_cols,
            max_segments=compact_max_segments,
            id_col=id_col,
        )

    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(step)
        .start()
    )


def tombstone_root(root: str) -> str:
    """The durable purged-id store of a segment store: a SIBLING of
    the root (never inside it — any committed dir under the root is
    data), itself a mini segment store of 1-column id rows."""
    return root.rstrip("/") + ".tombstones"


_TOMBSTONE_COMPACT_AT = 16  # segment-count threshold, not per-append


def append_tombstones(spark: SparkSession, root: str, ids, id_col: str) -> None:
    """Durably record purged ids BEFORE any physical delete — the
    read-side anti-join (exclude_tombstoned) is what makes a
    right-to-be-forgotten guarantee hold through the crash-replay
    window where an epoch replay recomputes purged rows from source
    (a one-time rewrite cannot close that window). Writes one batch
    segment; once the store accumulates _TOMBSTONE_COMPACT_AT
    segments it is compacted (write-then-delete-sources — a crash
    leaves duplicate tombstones, harmless, never lost ones), so the
    file count stays bounded however many deletes arrive.

    Semantics are BY ID AND PERMANENT: a tombstoned id is excluded
    from every future read even if rows for it are later re-ingested
    — legitimate re-submission of deleted content must use a new id
    (or an operator clears the store with clear_tombstones after a
    verified physical purge). Maintenance ops (delete/compact) follow
    the segment store's existing single-maintenance-writer
    assumption: like data-segment compaction, deleting source files
    can break a concurrently COMPILED read's frozen file list."""
    if not isinstance(ids, DataFrame):
        ids = list(ids)
        if not ids:
            return
        ids = spark.createDataFrame(
            [(int(i),) for i in ids], f"{id_col} LONG"
        )
    troot = tombstone_root(root)
    write_segment(ids.toDF(id_col).dropDuplicates([id_col]), troot, None)
    if len(list_segments(troot)) >= _TOMBSTONE_COMPACT_AT:
        compact_segments(
            spark, troot, f"{id_col} LONG", [id_col], [id_col],
            target_files=1,
        )


def clear_tombstones(root: str) -> None:
    """Remove a store's tombstone set — the un-delete path, for after
    the physical rows are verifiably gone (every segment rewritten
    since the last delete) and the operator wants the ids usable
    again. Until this is called, a tombstoned id can never re-enter
    the index (append_tombstones' permanence contract)."""
    shutil.rmtree(tombstone_root(root), ignore_errors=True)


def read_tombstones(spark: SparkSession, root: str, id_col: str):
    """All purged ids of a store, or None when nothing was ever
    purged. Duplicates possible mid-compaction; both consumers (the
    anti-join and compact_segments' drop_ids, which dedups itself)
    tolerate them."""
    return read_segments(spark, tombstone_root(root), f"{id_col} LONG")


def exclude_tombstoned(
    spark: SparkSession, df: DataFrame, root: str, id_col: str
) -> DataFrame:
    """df minus tombstoned ids — the serve-path filter every read of
    an id-bearing segment store must apply (module docstring of
    posting_stream: serving correctness never depends on the physical
    delete having stuck)."""
    tomb = read_tombstones(spark, root, id_col)
    if tomb is None:
        return df
    return df.join(tomb, id_col, "left_anti")


def committed_ids(
    spark: SparkSession, root: str, epoch_id: int | None, schema: str, id_col: str
):
    """Short-circuit for epoch replay: when the epoch's segment already
    committed, its distinct ids ARE the step's result — callers return
    them directly and skip recomputing the whole batch pipeline (the
    common crash-recovery replay). None when not committed / no epoch."""
    if epoch_id is None:
        return None
    seg, committed = segment_path(root, epoch_id)
    if not committed:
        return None
    return spark.read.schema(schema).parquet(seg).select(id_col).distinct()


def commit_survivors(
    spark: SparkSession, rows: DataFrame, root: str, epoch_id: int | None, schema: str, id_col: str
) -> DataFrame:
    """Write a step's surviving rows as their segment and read the ids
    back from it — the write is the materialization point, so consuming
    the returned frame never re-executes the producing plan."""
    seg = write_segment(rows, root, epoch_id)
    return spark.read.schema(schema).parquet(seg).select(id_col).distinct()


def replay_exclusion(id_col: str, idx_id_col: str, idx_epoch_col: str, epoch_id: int):
    """History-join predicate that drops ONLY the current epoch's own
    index rows. Needed even with the committed-epoch short-circuit:
    after compaction, an epoch's rows live (epoch-tagged) inside a
    compact segment while its own segment dir is gone — a replay then
    recomputes and WOULD self-match at similarity 1.0 without this.
    A same-id row written by any OTHER epoch is a redelivery and must
    still count as a duplicate."""
    from pyspark.sql import functions as F

    return ~(
        (F.col(id_col) == F.col(idx_id_col))
        & (F.col(idx_epoch_col) == F.lit(epoch_id))
    )


def auto_compact(
    spark: SparkSession,
    root: str,
    schema: str,
    dedup_keys: list[str],
    cluster_cols: list[str],
    max_segments: int | None,
    target_files: int = 8,
    id_col: str | None = None,
) -> int | None:
    """Threshold-triggered compaction: when the committed segment count
    reaches `max_segments`, merge (compact_segments); else no-op.

    Called from a stream's foreachBatch AFTER the epoch segment commit,
    so the store self-maintains: a long-lived stream holds segment
    count ≤ max_segments + a few in-flight, instead of accreting one
    dir per micro-batch forever. Crash-safety is the compact_segments
    protocol's: a crash mid-compaction leaves duplicates the candidate
    joins tolerate and the next compaction removes; a crash after
    compaction but before the streaming checkpoint commit replays the
    epoch WITHOUT its own segment dir — the replay_exclusion predicate
    covers exactly that window. Returns the deduped row count when a
    compaction ran, else None.

    Pass `id_col` for id-bearing stores (neardup/embedding/posting):
    routine compaction then re-applies the store's tombstones, so
    purged rows physically resurrected by a crash-window replay are
    scrubbed at the next compaction instead of lingering until an
    unrelated later delete (reads hide them either way; erasure wants
    the bytes gone too)."""
    if max_segments is None or len(list_segments(root)) < max_segments:
        return None
    return compact_segments(
        spark, root, schema, dedup_keys, cluster_cols,
        target_files=target_files, id_col=id_col,
    )


def compact_segments(
    spark: SparkSession,
    root: str,
    schema: str,
    dedup_keys: list[str],
    cluster_cols: list[str],
    target_files: int = 8,
    drop_ids=None,
    id_col: str | None = None,
) -> int:
    """Merge all committed segments into one `compact-` segment
    clustered on `cluster_cols`, then delete the sources. Returns the
    deduped row count (0 for an empty store).

    `drop_ids` (a 1-column DataFrame of `id_col` values) turns the
    rewrite into DELETE PROPAGATION: tombstoned rows are anti-joined
    out during the merge, so the new segment — and therefore every
    future read and candidate join — no longer contains them. This is
    the right-to-be-forgotten path for the index stores: deletion is
    a metadata-plus-rewrite operation on the columnar store (the same
    mechanics a Delta DELETE performs), NOT a per-key state mutation.
    Crash safety is unchanged: a crash mid-delete leaves the old
    segments (rows still present, retried next compaction); the swap
    is the same write-then-delete-sources protocol."""
    src_dirs = list_segments(root)
    if not src_dirs:
        return 0
    df = spark.read.schema(schema).parquet(*src_dirs).dropDuplicates(dedup_keys)
    if drop_ids is None and id_col is not None:
        # id-bearing stores re-apply their durable tombstones on EVERY
        # compaction, so purged rows resurrected by a crash-window
        # replay are physically scrubbed at the next maintenance pass
        drop_ids = read_tombstones(spark, root, id_col)
    if drop_ids is not None:
        if id_col is None:
            raise ValueError("drop_ids requires id_col")
        # AQE decides broadcast-vs-shuffle for the anti join: delete
        # lists are usually config-sized (broadcast) but a bulk purge
        # can be millions of ids (shuffle on the id) — same pattern as
        # the contamination join.
        tomb = drop_ids.toDF(id_col).dropDuplicates([id_col])
        df = df.join(tomb, id_col, "left_anti")
    dest = os.path.join(root, f"compact-{uuid.uuid4().hex[:12]}")
    (
        df.repartition(target_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .parquet(dest)
    )
    # count from the WRITTEN segment: counting the plan first would
    # execute the whole merge (multi-segment scan + dedup shuffle)
    # twice — once for the count, once for the write. The write is the
    # materialization point; reading it back is one cheap scan.
    n = spark.read.schema(schema).parquet(dest).count()
    for d in src_dirs:
        shutil.rmtree(d, ignore_errors=True)
    return n
