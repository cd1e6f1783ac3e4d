"""Streaming retry-with-backoff where backoff is DATA, not sleep
(SURVEY §7.3 item 3; reference agent-loop.sh:373-391, 740-748).

The reference retries a failed task by sleeping 2^attempt seconds in
the worker loop. In Spark, sleeping in an executor blocks a core, so
failed rows are instead RE-ENQUEUED with a `not_before` timestamp and
flow back through the same source; each micro-batch processes only the
rows that are due and defers the rest untouched. The loop:

    work dir ──┐
               ├─ readStream ── foreachBatch:
    retry dir ─┘       due rows   → run model → ok → results dir
                                            └ fail → retry dir
                                              (attempt+1, not_before =
                                               now + base·2^attempt,
                                               capped — X7 semantics)
                       not-due rows → rewritten to retry dir verbatim

State never sleeps: a deferred row costs one parquet rewrite per
trigger, executors keep draining due work, and the attempt cap turns a
row into a terminal `failed` result instead of retrying forever. All
effects run in `foreachBatch` on the driver (SURVEY §7.3 item 2:
attempt-keyed, no executor-side mutation).

Delivery contract (foreachBatch is at-least-once): EXECUTION is
at-least-once — a crash inside the commit window can re-run a task
attempt — but terminal RESULTS are exactly-once after read-side dedup:
  - a fully-committed epoch replays as a no-op: per-epoch marker files
    live UNDER THE CHECKPOINT LOCATION, so their lifetime is exactly
    the lifetime of the batch numbering they guard — a fresh
    checkpoint (batch ids restart at 0) starts with no markers, and
    two pipelines sharing a results_dir cannot see each other's
    markers;
  - a row whose task already has a terminal result is skipped before
    the model runs (terminal-state guard: an in-memory task_id set,
    rebuilt once per (re)start from read_results and appended to
    incrementally per batch — O(new results) per trigger, not
    O(all results)). SINGLE ACTIVE WRITER contract: the incremental
    set only sees results THIS incarnation wrote or that existed at
    its start, so at most one pipeline may be actively writing a
    results_dir at a time (restarts — including with a fresh
    checkpoint — are fine; concurrent writers could re-run a task the
    other just decided, though read_results still collapses the
    duplicate terminals on read);
  - read_results dedupes on task_id keeping the lowest terminal
    attempt, so even a crash between the result append and the marker
    cannot surface duplicate terminals.
This matches the reference: its bash loop can also re-run an attempt
after a kill between "model returned" and "state.json written".
"""

from __future__ import annotations

import datetime as dt
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

WORK_SCHEMA = StructType(
    [
        StructField("task_id", LongType()),
        StructField("payload", StringType()),
        StructField("attempt", IntegerType()),
        StructField("not_before", TimestampType()),
    ]
)

RESULT_SCHEMA = "task_id LONG, payload STRING, attempt INT, status STRING"

MAX_ATTEMPTS = 5          # reference agent-loop.sh:14
BACKOFF_CAP_SEC = 60      # reference agent-loop.sh:385-388


def _append_rows(spark: SparkSession, rows: list[tuple], schema, path: str) -> None:
    if rows:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(
            path
        )


def start_retry_pipeline(
    spark: SparkSession,
    work_dir: str,
    retry_dir: str,
    results_dir: str,
    checkpoint: str,
    model_fn,
    base_backoff_sec: float = 1.0,
    trigger_sec: str = "500 milliseconds",
):
    """Start the retry loop. `model_fn(payload, attempt) -> bool`
    decides success. Returns the StreamingQuery (caller stops it)."""
    os.makedirs(retry_dir, exist_ok=True)
    os.makedirs(results_dir, exist_ok=True)
    # epoch markers are keyed by batch id, and batch ids are only
    # meaningful relative to ONE checkpoint — so the markers live under
    # it. (Stale markers from a deleted checkpoint die with it; a second
    # pipeline on the same results_dir has its own checkpoint and its
    # own markers.)
    marker_dir = os.path.join(checkpoint, "epoch_markers")
    os.makedirs(marker_dir, exist_ok=True)
    src = (
        spark.readStream.schema(WORK_SCHEMA)
        .parquet(work_dir)
        .unionByName(spark.readStream.schema(WORK_SCHEMA).parquet(retry_dir))
    )

    # terminal-state guard, incremental: rebuilt once per (re)start —
    # covering everything a previous incarnation committed — then
    # appended to in-process as this incarnation decides tasks. A
    # replayed/duplicated row whose task is already decided must not
    # re-run the model or fork a retry. Only the ids travel to the
    # driver (payloads would make the rebuild O(results × payload)).
    terminal: set[int] = {
        r.task_id
        for r in read_results(spark, results_dir).select("task_id").collect()
    }

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        # replay of a fully-committed epoch: no-op (marker written LAST)
        marker = os.path.join(marker_dir, f"_epoch-{batch_id}")
        if os.path.exists(marker):
            return
        rows = batch_df.collect()  # control plane: O(tasks), not O(data)
        if not rows:
            return
        # Within-batch dedup: a crash inside a previous commit window
        # can leave DUPLICATE rows of the same (task, attempt) in the
        # retry dir, and both copies can land due in one batch — the
        # model must run once per task per trigger, and the duplicate
        # must be CONSUMED here (kept rows are the ones forwarded or
        # requeued; dropped ones simply never get rewritten). Lowest
        # attempt first mirrors read_results' first-decision-wins.
        rows = sorted(
            rows,
            key=lambda r: (r.task_id, r.attempt, r.not_before or dt.datetime.min),
        )
        deduped, seen = [], set()
        for r in rows:
            if r.task_id not in seen:
                seen.add(r.task_id)
                deduped.append(r)
        now = dt.datetime.now()
        results: list[tuple] = []
        requeue: list[tuple] = []
        for r in deduped:
            if r.task_id in terminal:
                continue
            if r.not_before is not None and r.not_before > now:
                requeue.append((r.task_id, r.payload, r.attempt, r.not_before))
                continue
            attempt = r.attempt
            if model_fn(r.payload, attempt):
                results.append((r.task_id, r.payload, attempt, "completed"))
            elif attempt >= MAX_ATTEMPTS:
                results.append((r.task_id, r.payload, attempt, "failed"))
            else:
                delay = _backoff_delay(attempt, base_backoff_sec)
                requeue.append(
                    (
                        r.task_id,
                        r.payload,
                        attempt + 1,
                        now + dt.timedelta(seconds=delay),
                    )
                )
        _append_rows(spark, results, RESULT_SCHEMA, results_dir)
        _append_rows(spark, requeue, WORK_SCHEMA, retry_dir)
        # only after the result append is durable may the in-memory set
        # learn the decisions (a crash before this point replays the
        # batch, and the startup rebuild re-derives the set anyway)
        terminal.update(task_id for task_id, _, _, _ in results)
        open(marker, "w").close()

    return (
        src.writeStream.foreachBatch(handle)
        .trigger(processingTime=trigger_sec)
        .option("checkpointLocation", checkpoint)
        .queryName(f"retry-{uuid.uuid4().hex[:6]}")
        .start()
    )


def read_results(spark: SparkSession, results_dir: str) -> DataFrame:
    """Terminal results, exactly one row per task: a crash between the
    result append and the epoch marker can leave a duplicate terminal
    row, so reads keep the lowest-attempt row per task (the first
    decision wins — replays can only re-decide at the same or a later
    attempt)."""
    from pyspark.sql import Window as W

    try:
        raw = spark.read.schema(
            "task_id LONG, payload STRING, attempt INT, status STRING"
        ).parquet(results_dir)
    except Exception:  # noqa: BLE001 — empty dir before first result
        return spark.createDataFrame([], RESULT_SCHEMA)
    w = W.partitionBy("task_id").orderBy("attempt", "status")
    return (
        raw.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def _backoff_delay(attempt: int, base: float = 1.0) -> float:
    """The X7 backoff expression as data (pure; property-testable)."""
    return min(base * (2**attempt), BACKOFF_CAP_SEC)
