"""The composed message pipeline — SURVEY §3.2's entry point B as one
streaming application: bus source → projection → filters → router →
per-chat stateful turns → chunked reply sink.

Each branch is its own streaming query over the same routed stream —
the Spark-native form of the reference's executor-pool isolation
(SURVEY T5): a slow task branch can never starve the chat branch
because they are independent queries with independent state and
checkpoints, each started under its own fair-scheduler pool
(`set_scheduler_pool` below — the streaming execution thread inherits
the pool set on the thread that calls .start(), so every job of the
branch lands in that pool).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from open_pulsar_spark.streaming.heartbeat import (
    HeartbeatListener,
    attach_heartbeat,
    detach_heartbeat,
)
from open_pulsar_spark.streaming.router import (
    filter_authorized,
    filter_text,
    project_updates,
    route,
)
from open_pulsar_spark.streaming.sessions import ModelFn, chat_turns, stub_model
from open_pulsar_spark.streaming.sinks import explode_chunks


def build_message_pipeline(
    spark: SparkSession,
    updates: DataFrame,
    allowed_ids: set[int] | None = None,
    mode: str = "auto",
    model: ModelFn = stub_model,
) -> dict[str, DataFrame]:
    """Wire the full route over a (batch or streaming) updates frame.

    Returns the three branch frames — callers attach sinks per branch:
      chat:     stateful turns → chunked replies
      task:     rows destined for the task pipeline (operators.pipeline)
      command:  parsed commands for the control-plane handler
    """
    msgs = route(
        filter_authorized(spark, filter_text(project_updates(updates)), allowed_ids or set()),
        mode=mode,
    )
    # '/reset' is a command, but the state it clears lives in the CHAT
    # query's keyed store — no other query can remove that key, so the
    # reset rows must flow through the chat branch (whose handler
    # recognizes '/reset' text) as well as appearing on the command
    # branch for the control plane.
    chat_rows = msgs.where(
        (msgs.route == "chat") | ((msgs.route == "command") & (F.col("cmd") == "/reset"))
    )
    return {
        "chat": chat_turns(chat_rows, model=model),
        "task": msgs.where(msgs.route == "task"),
        "command": msgs.where(msgs.route == "command").select(
            "chat_id", "update_id", "cmd", "cmd_args"
        ),
    }


def set_scheduler_pool(spark: SparkSession, pool: str | None) -> None:
    """Assign subsequent jobs started from THIS thread to a fair pool.

    Called immediately before a branch's `.start()`: structured
    streaming snapshots the caller thread's local properties into the
    query's execution thread, so the branch's micro-batch jobs all run
    in `pool`. With `spark.scheduler.mode=FAIR` on a cluster this is
    the isolation the reference gets from separate executor pools —
    a saturated task branch cannot starve the chat branch's scheduler
    share. Passing None clears the assignment.
    """
    spark.sparkContext.setLocalProperty("spark.scheduler.pool", pool)


def start_chat_sink(
    chat: DataFrame,
    deliver,
    checkpoint: str,
    chunk_limit: int = 4096,
    pool: str | None = "chat",
):
    """Chunked delivery sink for the chat branch (SURVEY K1): each
    micro-batch is exploded into ≤chunk_limit labeled chunks and handed
    to `deliver(batch_df, epoch_id)` — the external-messaging boundary.

    Chunking runs inside foreachBatch (a batch context) rather than in
    the streaming plan: sink-side formatting belongs at the sink, and
    it keeps the streaming plan free of Python row-format seams after
    the stateful operator.
    """

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        deliver(explode_chunks(batch_df, limit=chunk_limit), epoch_id)

    return _start_branch_sink(chat, process, checkpoint, pool)


def _start_branch_sink(
    df: DataFrame, handler, checkpoint: str, pool: str | None
) -> StreamingQuery:
    """foreachBatch sink for one branch. Pool scoping: the query's
    execution thread snapshots the caller thread's scheduler-pool
    property at .start(), and restoring the previous value afterwards
    keeps later queries started from this thread out of this branch's
    pool (they must isolate, not inherit)."""
    sc = df.sparkSession.sparkContext
    prev_pool = sc.getLocalProperty("spark.scheduler.pool")
    set_scheduler_pool(df.sparkSession, pool)
    try:
        return (
            df.writeStream.outputMode("append")
            .foreachBatch(handler)
            .option("checkpointLocation", checkpoint)
            .start()
        )
    finally:
        set_scheduler_pool(df.sparkSession, prev_pool)


@dataclass
class AppHandle:
    """Running application: the three branch queries plus the attached
    heartbeat listener. `stop()` is the one-call teardown."""

    spark: SparkSession
    queries: dict[str, StreamingQuery]
    heartbeat: HeartbeatListener | None = None
    _stopped: bool = field(default=False, repr=False)

    def process_all_available(self) -> None:
        for q in self.queries.values():
            q.processAllAvailable()

    def stop(self) -> None:
        """Stop every branch and detach the listener. Best-effort on
        partial failure: a q.stop() raising must not leave the other
        queries running or the listener attached — every teardown step
        is attempted, then the first error re-raised."""
        if self._stopped:
            return
        self._stopped = True
        first_err: Exception | None = None
        for q in self.queries.values():
            try:
                q.stop()
            except Exception as e:  # noqa: BLE001 — finish teardown first
                first_err = first_err or e
        if self.heartbeat is not None:
            try:
                detach_heartbeat(self.spark, self.heartbeat)
            except Exception as e:  # noqa: BLE001 — keep the FIRST error
                first_err = first_err or e
        if first_err is not None:
            raise first_err


def run_app(
    spark: SparkSession,
    updates: DataFrame,
    checkpoint_root: str,
    deliver,
    handle_task=None,
    handle_command=None,
    allowed_ids: set[int] | None = None,
    mode: str = "auto",
    model: ModelFn = stub_model,
    chunk_limit: int = 4096,
    heartbeat_emit=print,
) -> AppHandle:
    """Start the whole message application (SURVEY §3.2 entry point B):
    route → three pool-isolated branch queries → sinks, with the T8
    heartbeat attached BY DEFAULT.

    The reference keeps a "typing…" keepalive thread per in-flight
    reply (telegram-agent.py:397-416, ~4 s cadence). Here the keepalive
    is the session-wide `HeartbeatListener`: every micro-batch of every
    branch emits a progress beat to `heartbeat_emit`, and `idle` events
    distinguish a quiet stream from a wedged one — no polling thread.
    Pass `heartbeat_emit=None` to opt out.

    `deliver(batch_df, epoch_id)` receives chunked chat replies;
    `handle_task` / `handle_command` receive their branches' batches
    (default: no-op — callers wire the task pipeline / control plane).
    """
    branches = build_message_pipeline(
        spark, updates, allowed_ids=allowed_ids, mode=mode, model=model
    )
    listener = (
        attach_heartbeat(spark, emit=heartbeat_emit)
        if heartbeat_emit is not None
        else None
    )
    noop = lambda batch_df, epoch_id: None  # noqa: E731
    queries: dict[str, StreamingQuery] = {}
    try:
        queries["chat"] = start_chat_sink(
            branches["chat"],
            deliver,
            checkpoint=f"{checkpoint_root}/chat",
            chunk_limit=chunk_limit,
            pool="chat",
        )
        queries["task"] = _start_branch_sink(
            branches["task"], handle_task or noop, f"{checkpoint_root}/task", "task"
        )
        queries["command"] = _start_branch_sink(
            branches["command"],
            handle_command or noop,
            f"{checkpoint_root}/command",
            "command",
        )
    except Exception:
        # a later branch failing to start must not leak the earlier
        # branches (running forever, unreachable) or the listener
        for q in queries.values():
            try:
                q.stop()
            except Exception:  # noqa: BLE001 — best-effort teardown
                pass
        if listener is not None:
            detach_heartbeat(spark, listener)
        raise
    return AppHandle(spark=spark, queries=queries, heartbeat=listener)
