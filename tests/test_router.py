"""Router semantics (reference telegram-agent.py:538-572): projection,
non-text filter, auth semi-join, command/chat/task routing."""

from __future__ import annotations

from open_pulsar_spark.streaming.router import (
    UPDATE_SCHEMA,
    filter_authorized,
    filter_text,
    project_updates,
    route,
)


def _updates(spark):
    rows = [
        (1, {"chat": {"id": 10}, "from": {"id": 100, "username": "alice"}, "text": "hello"}, None),
        (2, None, {"chat": {"id": 11}, "from": {"id": 101, "username": "bob"}, "text": "edited!"}),
        (3, {"chat": {"id": 12}, "from": {"id": 102, "username": "carol"}, "text": None}, None),
        (4, {"chat": {"id": 13}, "from": {"id": 103, "username": "dan"}, "text": "/status@mybot now"}, None),
        (5, {"chat": {"id": 14}, "from": {"id": 100, "username": "alice"}, "text": "fix the build please"}, None),
    ]
    return spark.createDataFrame(rows, UPDATE_SCHEMA)


def test_projection_falls_back_to_edited_message(spark):
    out = {r.update_id: r for r in project_updates(_updates(spark)).collect()}
    assert out[1].chat_id == 10 and out[1].text == "hello"
    assert out[2].chat_id == 11 and out[2].text == "edited!"  # edited_message
    assert out[3].text is None


def test_non_text_filter(spark):
    msgs = filter_text(project_updates(_updates(spark)))
    assert {r.update_id for r in msgs.collect()} == {1, 2, 4, 5}


def test_auth_semi_join_and_allow_all(spark):
    msgs = project_updates(_updates(spark))
    kept = filter_authorized(spark, msgs, {100, 103})
    assert {r.update_id for r in kept.collect()} == {1, 4, 5}
    # empty set = allow everyone (reference :91-94 warning path)
    assert filter_authorized(spark, msgs, set()).count() == msgs.count()


def test_route_command_chat_task(spark):
    msgs = filter_text(project_updates(_updates(spark)))
    routed = {r.update_id: r for r in route(msgs, mode="auto").collect()}
    assert routed[4].route == "command"
    assert routed[4].cmd == "/status"        # @botname stripped
    assert routed[4].cmd_args == "now"
    assert routed[5].route == "task"         # imperative opener
    assert routed[1].route == "chat"


def test_route_pinned_mode(spark):
    msgs = filter_text(project_updates(_updates(spark)))
    routed = {r.update_id: r.route for r in route(msgs, mode="task").collect()}
    assert routed[1] == "task"               # pinned overrides heuristic
    assert routed[4] == "command"            # commands always win


def test_live_auth_filter_hot_reloads_per_batch(spark, tmp_path):
    """S7 hot reload: a user appended to the allowlist dir AFTER the
    stream starts is admitted from the next micro-batch on — because
    live_auth_filter re-reads the dir inside foreachBatch (an in-plan
    stream-static parquet join freezes its file listing at .start(),
    which is exactly why the combinator exists)."""
    from open_pulsar_spark.streaming.router import live_auth_filter

    src = str(tmp_path / "msgs")
    allow = str(tmp_path / "allow")
    ckpt = str(tmp_path / "ckpt")
    schema = "update_id LONG, from_id LONG"
    spark.createDataFrame([(1,)], "from_id LONG").coalesce(1).write.parquet(allow)
    # batch 1: user 1 (allowed) + user 2 (not yet)
    spark.createDataFrame([(1, 1), (2, 2)], schema).coalesce(1).write.parquet(src)

    auth = live_auth_filter(spark, allow)
    admitted: list = []

    def step(batch_df, epoch_id):
        admitted.extend(auth(batch_df).collect())

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(step)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    assert sorted(r.update_id for r in admitted) == [1]

    # authorize user 2 mid-stream, then their next message is admitted
    spark.createDataFrame([(2,)], "from_id LONG").coalesce(1).write.mode(
        "append"
    ).parquet(allow)
    spark.createDataFrame([(3, 2)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q.processAllAvailable()
    q.stop()
    assert sorted(r.update_id for r in admitted) == [1, 3]


def test_live_auth_filter_empty_allowlist_allows_everyone(spark, tmp_path):
    from open_pulsar_spark.streaming.router import live_auth_filter

    allow = str(tmp_path / "allow_empty")
    spark.createDataFrame([], "from_id LONG").write.parquet(allow)
    auth = live_auth_filter(spark, allow)
    batch = spark.createDataFrame([(1, 10), (2, 20)], "update_id LONG, from_id LONG")
    assert sorted(r.update_id for r in auth(batch).collect()) == [1, 2]


def test_live_auth_filter_missing_dir_allows_everyone(spark, tmp_path):
    """An allowlist dir that was never written is the same contract as
    an empty list (allow everyone) — and must not kill the query from
    inside foreachBatch."""
    from open_pulsar_spark.streaming.router import live_auth_filter

    auth = live_auth_filter(spark, str(tmp_path / "never_written"))
    batch = spark.createDataFrame([(1, 10)], "update_id LONG, from_id LONG")
    assert [r.update_id for r in auth(batch).collect()] == [1]


def test_live_auth_filter_fails_closed_after_configured(spark, tmp_path):
    """Configured-then-vanished is an operational fault, not a policy
    change: once a trigger has seen a non-empty allowlist, a later
    unreadable (or truncated-to-empty) allowlist BLOCKS the batch
    instead of silently admitting everyone."""
    import shutil

    from open_pulsar_spark.streaming.router import live_auth_filter

    allow = str(tmp_path / "allow")
    spark.createDataFrame([(10,)], "from_id LONG").coalesce(1).write.parquet(allow)
    auth = live_auth_filter(spark, allow)
    batch = spark.createDataFrame(
        [(1, 10), (2, 20)], "update_id LONG, from_id LONG"
    )
    # trigger 1: configured — user 10 admitted, user 20 filtered
    assert [r.update_id for r in auth(batch).collect()] == [1]
    # the volume vanishes: fail closed, not open
    shutil.rmtree(allow)
    assert auth(batch).collect() == []
    # ...and the guard survives a job RESTART (the standard operator
    # response to a persistent fault): the configured-marker is durable,
    # so a fresh filter instance still fails closed
    auth2 = live_auth_filter(spark, allow)
    assert auth2(batch).collect() == []
