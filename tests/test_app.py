"""End-to-end composed message pipeline (SURVEY §3.2): bus → router →
stateful chat branch → chunked sink, driven as real streaming queries,
plus a late-data watermark check."""

from __future__ import annotations

import datetime as dt

from open_pulsar_spark.streaming.app import build_message_pipeline, start_chat_sink
from open_pulsar_spark.streaming.events_stream import (
    EVENT_SCHEMA,
    read_event_stream,
    tumbling_counts,
)
from open_pulsar_spark.streaming.router import UPDATE_SCHEMA


def test_full_message_pipeline_streaming(spark, tmp_path):
    src, ckpt = str(tmp_path / "updates"), str(tmp_path / "ckpt")
    rows = [
        (1, {"chat": {"id": 10}, "from": {"id": 1, "username": "a"}, "text": "hello there"}, None),
        (2, {"chat": {"id": 10}, "from": {"id": 1, "username": "a"}, "text": "/status"}, None),
        (3, {"chat": {"id": 11}, "from": {"id": 2, "username": "b"}, "text": "fix the login bug"}, None),
        (4, {"chat": {"id": 12}, "from": {"id": 9, "username": "x"}, "text": "intruder!"}, None),
    ]
    spark.createDataFrame(rows, UPDATE_SCHEMA).coalesce(1).write.parquet(src)
    updates = spark.readStream.schema(UPDATE_SCHEMA).parquet(src)
    branches = build_message_pipeline(spark, updates, allowed_ids={1, 2})

    delivered: list = []
    queries = [
        start_chat_sink(
            branches["chat"],
            lambda df, epoch: delivered.extend(df.collect()),
            checkpoint=f"{ckpt}/chat",
            chunk_limit=500,
        )
    ]
    for name in ("task", "command"):
        q = (
            branches[name]
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(f"app_{name}")
            .option("checkpointLocation", f"{ckpt}/{name}")
            .start()
        )
        queries.append(q)
    for q in queries:
        q.processAllAvailable()
        q.stop()

    chat = delivered
    task = spark.sql("select * from app_task").collect()
    cmd = spark.sql("select * from app_command").collect()
    # auth filter dropped user 9; router split the rest
    assert [r.update_id for r in chat] == [1]
    assert chat[0].chunk.startswith("ack:hello there")
    assert [r.update_id for r in task] == [3]
    assert [(r.update_id, r.cmd) for r in cmd] == [(2, "/status")]


def test_run_app_attaches_heartbeat_and_routes_all_branches(spark, tmp_path):
    """T8 wired at the app level: run_app starts all three pool-isolated
    branch queries AND the heartbeat listener by default — beats are
    observed while the micro-batches run (reference: per-reply typing
    keepalive, telegram-agent.py:397-416)."""
    import time

    from open_pulsar_spark.streaming.app import run_app

    src = str(tmp_path / "updates")
    rows = [
        (1, {"chat": {"id": 10}, "from": {"id": 1, "username": "a"}, "text": "hi app"}, None),
        (2, {"chat": {"id": 10}, "from": {"id": 1, "username": "a"}, "text": "/status"}, None),
        (3, {"chat": {"id": 11}, "from": {"id": 2, "username": "b"}, "text": "fix the login bug"}, None),
    ]
    spark.createDataFrame(rows, UPDATE_SCHEMA).coalesce(1).write.parquet(src)
    updates = spark.readStream.schema(UPDATE_SCHEMA).parquet(src)

    beats: list = []
    delivered: list = []
    tasks: list = []
    cmds: list = []
    app = run_app(
        spark,
        updates,
        checkpoint_root=str(tmp_path / "ckpt"),
        deliver=lambda df, epoch: delivered.extend(df.collect()),
        handle_task=lambda df, epoch: tasks.extend(df.collect()),
        handle_command=lambda df, epoch: cmds.extend(df.collect()),
        allowed_ids={1, 2},
        heartbeat_emit=beats.append,
    )
    try:
        app.process_all_available()
        # listener bus is async — drain while the listener is STILL
        # attached (stop() detaches it; draining after would race late
        # events into the void)
        for _ in range(50):
            prog = [e for e in beats if e["event"] == "progress"]
            if len(prog) >= 3 and sum(e["num_input_rows"] for e in prog) >= 3:
                break
            time.sleep(0.2)
    finally:
        app.stop()

    assert [r.update_id for r in delivered] == [1]
    assert [r.update_id for r in tasks] == [3]
    assert [(r.update_id, r.cmd) for r in cmds] == [(2, "/status")]
    kinds = {e["event"] for e in beats}
    assert "started" in kinds and "progress" in kinds
    # all three branch queries beat (3 distinct stream ids)
    prog_ids = {e["id"] for e in beats if e["event"] == "progress"}
    assert len(prog_ids) == 3
    # after stop() the listener is detached — no further beats possible
    assert app.heartbeat is not None


def test_stateful_query_uses_rocksdb_state_store(spark, tmp_path):
    """100 TB posture: the session default state-store provider is
    RocksDB (+ changelog checkpointing), and a stateful query's
    checkpoint actually materializes RocksDB state artifacts — per-key
    state spills to local disk instead of living on the executor heap."""
    import glob
    import os

    assert (
        spark.conf.get("spark.sql.streaming.stateStore.providerClass")
        .endswith("RocksDBStateStoreProvider")
    )
    assert (
        spark.conf.get(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
        )
        == "true"
    )

    from open_pulsar_spark.streaming.quota import token_quota

    src, ckpt = str(tmp_path / "q_src"), str(tmp_path / "q_ckpt")
    spark.createDataFrame(
        [(1, 1, 100_000), (1, 2, 90_000), (2, 3, 10)],
        "chat_id LONG, update_id LONG, tokens LONG",
    ).coalesce(1).write.parquet(src)
    ledger = token_quota(
        spark.readStream.schema("chat_id LONG, update_id LONG, tokens LONG").parquet(src)
    )
    q = (
        ledger.writeStream.outputMode("append")
        .format("memory")
        .queryName("rocks_quota")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = {r.update_id: r for r in spark.sql("select * from rocks_quota").collect()}
    assert out[2].action == "compact" and out[3].action == "ok"
    # changelog checkpointing writes .changelog (delta) files; a full
    # snapshot upload writes .zip — either proves the RocksDB provider
    # owned the state directory
    state_files = glob.glob(os.path.join(ckpt, "state", "**", "*"), recursive=True)
    assert any(
        f.endswith(".changelog") or f.endswith(".zip") for f in state_files
    ), state_files[:20]


def test_heartbeat_listener_emits_progress_per_batch(spark, tmp_path):
    """T8: the keepalive analogue — a StreamingQueryListener heartbeat
    fires started + per-micro-batch progress events while a query runs
    (reference behavior: telegram-agent.py:397-400 typing keepalive)."""
    from open_pulsar_spark.streaming.heartbeat import (
        attach_heartbeat,
        detach_heartbeat,
    )

    src, ckpt = str(tmp_path / "hb_src"), str(tmp_path / "hb_ckpt")
    spark.createDataFrame([(i,) for i in range(10)], "v LONG").coalesce(
        2
    ).write.parquet(src)

    emitted: list = []
    hb = attach_heartbeat(spark, emit=emitted.append)
    try:
        q = (
            spark.readStream.schema("v LONG")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.format("memory")
            .queryName("hb_q")
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination()
        # listener bus is async; give it a beat to drain
        import time

        for _ in range(50):
            done = (
                "started" in {e["event"] for e in emitted}
                and sum(
                    e["num_input_rows"]
                    for e in emitted
                    if e["event"] == "progress"
                )
                >= 10
            )
            if done:
                break
            time.sleep(0.2)
    finally:
        detach_heartbeat(spark, hb)

    kinds = [e["event"] for e in emitted]
    assert "started" in kinds and "progress" in kinds
    prog = [e for e in emitted if e["event"] == "progress"]
    # two files, one per trigger → at least two progress beats, and the
    # payload carries the fields a typing-indicator would key on
    assert len(prog) >= 2
    assert prog[0]["name"] == "hb_q"
    assert sum(e["num_input_rows"] for e in prog) == 10


def test_branch_jobs_run_in_assigned_scheduler_pool(spark, tmp_path):
    """T5: the chat branch's micro-batch jobs carry the fair-scheduler
    pool set at .start() time (reference: per-route executor pools,
    telegram-agent.py:613-616)."""
    from open_pulsar_spark.streaming.app import set_scheduler_pool

    src, ckpt = str(tmp_path / "pool_src"), str(tmp_path / "pool_ckpt")
    spark.createDataFrame([(1,)], "v LONG").write.parquet(src)

    seen_pools: list = []

    def probe(batch_df, epoch_id):
        # runs on the query's execution thread — the thread whose jobs
        # the scheduler assigns to the pool
        seen_pools.append(
            batch_df.sparkSession.sparkContext.getLocalProperty(
                "spark.scheduler.pool"
            )
        )

    set_scheduler_pool(spark, "chat")
    try:
        q = (
            spark.readStream.schema("v LONG")
            .parquet(src)
            .writeStream.foreachBatch(probe)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        set_scheduler_pool(spark, None)

    assert seen_pools == ["chat"]


def test_late_event_beyond_watermark_is_dropped(spark, tmp_path):
    src, ckpt = str(tmp_path / "ev"), str(tmp_path / "ck")

    # FileStreamSource orders batches by file modification time; pin
    # strictly increasing mtimes so arrival order is deterministic
    import glob as _glob
    import os as _os

    clock = [1_700_000_000]
    pinned: set[str] = set()

    def write(rows):
        spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        clock[0] += 60
        for f in _glob.glob(f"{src}/*.parquet"):
            if f not in pinned:
                _os.utime(f, (clock[0], clock[0]))
                pinned.add(f)

    t0 = dt.datetime(2024, 1, 1, 10, 0)
    write([(1, t0, 1, "click", 1.0, "{}")])
    # advance event time far ahead → watermark moves past 10:00-11:00
    write([(2, dt.datetime(2024, 1, 1, 15, 0), 1, "click", 1.0, "{}")])
    # one more batch so the 10:00 window is EMITTED (watermark 13:00)
    write([(3, dt.datetime(2024, 1, 1, 18, 0), 1, "click", 1.0, "{}")])
    # a LATE event for the already-emitted 10:00 window — must be dropped
    # (observed Spark subtlety: a late row landing in the same batch that
    # evicts its window still merges in; once the window has been emitted
    # in a previous batch, the row is dropped for good)
    write([(4, dt.datetime(2024, 1, 1, 10, 30), 1, "click", 7.0, "{}")])
    # and one more to trigger another emission round
    write([(5, dt.datetime(2024, 1, 1, 21, 0), 1, "click", 1.0, "{}")])

    out = tumbling_counts(
        read_event_stream(spark, src), window="1 hour", watermark="2 hours"
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_out")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = {r.window_start: r for r in spark.sql("select * from late_out").collect()}
    w10 = rows[dt.datetime(2024, 1, 1, 10, 0)]
    # the late event (value 7.0) did NOT make it into the finalized window
    assert w10.n == 1 and w10.total_value == 1.0


def test_reset_command_reaches_chat_state(spark, tmp_path):
    """'/reset' routes as a command, but ONLY the chat query can clear
    its own keyed state — the pipeline must thread reset rows through
    the chat branch too (a command-branch-only reset can never clear
    the session)."""
    from open_pulsar_spark.streaming.app import build_message_pipeline
    from open_pulsar_spark.streaming.router import UPDATE_SCHEMA

    src = str(tmp_path / "updates")
    rows = [
        (1, {"chat": {"id": 10}, "from": {"id": 10, "username": "u"},
             "text": "hello"}, None),
        (2, {"chat": {"id": 10}, "from": {"id": 10, "username": "u"},
             "text": "/reset"}, None),
    ]
    spark.createDataFrame(rows, UPDATE_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    updates = spark.readStream.schema(UPDATE_SCHEMA).parquet(src)
    branches = build_message_pipeline(spark, updates, allowed_ids={10})
    q = (
        branches["chat"]
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("reset_route_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    chat_rows = {
        r.update_id: r
        for r in spark.sql("select * from reset_route_out").collect()
    }
    assert chat_rows[2].status == "reset"
    # and the control plane still sees the command (batch check of the
    # stateless branch on the same routed frame)
    static = build_message_pipeline(
        spark, spark.read.schema(UPDATE_SCHEMA).parquet(src), allowed_ids={10}
    )
    cmds = {r.update_id: r.cmd for r in static["command"].collect()}
    assert cmds[2] == "/reset"
