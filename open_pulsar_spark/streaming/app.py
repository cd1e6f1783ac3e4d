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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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

    # scope the pool to THIS .start(): the query's execution thread
    # snapshots the property at start, and restoring the previous value
    # afterwards keeps later queries started from this caller thread
    # out of the chat pool (they must isolate, not inherit)
    sc = chat.sparkSession.sparkContext
    prev_pool = sc.getLocalProperty("spark.scheduler.pool")
    set_scheduler_pool(chat.sparkSession, pool)
    try:
        return (
            chat.writeStream.outputMode("append")
            .foreachBatch(process)
            .option("checkpointLocation", checkpoint)
            .start()
        )
    finally:
        set_scheduler_pool(chat.sparkSession, prev_pool)
