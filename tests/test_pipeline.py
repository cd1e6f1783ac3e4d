"""Orchestration state machine (SURVEY §2.12): retry/backoff/failover/
compaction policies against the deterministic scripted model."""

from __future__ import annotations

import pytest

from open_pulsar_spark.operators.pipeline import (
    ScriptedModel,
    backoff_sec,
    classify_error_text,
    run_pipeline,
    status_summary,
)


def _run(spark, lines):
    rows = run_pipeline(spark, lines, model=ScriptedModel()).collect()
    return {r.task_idx: r for r in rows}


def test_happy_path_sessions_thread_within_group(spark):
    lines = [
        (1, "## g1"),
        (2, "- task one"),
        (3, "- task two"),
        (4, "## g2"),
        (5, "- task three"),
    ]
    out = _run(spark, lines)
    assert all(r.status == "completed" for r in out.values())
    assert all(r.attempts == 1 for r in out.values())
    # within g1 the session chains (task two sees task one's session);
    # g2 is a different segment → independent session chain
    assert out[1].segment_id != out[3].segment_id
    assert out[2].session_id is not None


def test_rate_limit_retries_with_backoff_and_failover(spark):
    out = _run(spark, [(1, "- flaky !fail:rate_limit:2")])
    r = out[1]
    assert r.status == "completed"
    assert r.attempts == 3
    # backoff recorded, 2x multiplier for rate limit: 2^1*2 + 2^2*2 = 12
    assert r.backoff_total_sec == 12
    # two failovers: primary -> fallback -> primary
    assert r.model_used == "primary"
    assert "done[primary]" in r.result


def test_auth_failure_aborts_without_retry(spark):
    out = _run(spark, [(1, "- secret !fail:auth:5"), (2, "- next task")])
    assert out[1].status == "failed"
    assert out[1].attempts == 1          # C3: auth aborts immediately
    assert out[1].error_class == "auth"
    # C5: pipeline continues, next task unaffected, fresh session chain
    assert out[2].status == "completed"


def test_context_overflow_gets_fresh_session_and_hint(spark):
    out = _run(spark, [(1, "- huge !fail:context_overflow:1")])
    r = out[1]
    assert r.status == "completed"
    assert r.attempts == 2
    assert "concise" in (r.hint or "")


def test_unknown_error_exhausts_attempts_then_fails(spark):
    out = _run(spark, [(1, "- cursed !fail:unknown:99")])
    r = out[1]
    assert r.status == "failed"
    assert r.attempts == 5               # C1: MAX_ATTEMPTS
    assert r.error_class == "unknown"


def test_unknown_error_with_no_retry_verdict_aborts(spark):
    # a malformed analyzer verdict coalesces to retry=false (U4 double
    # fallback) → the task fails after ONE attempt
    state = run_pipeline(
        spark,
        [(1, "- cursed !fail:unknown:99")],
        model=ScriptedModel(),
        analyzer=lambda task, err: "this is not json at all",
    )
    r = state.collect()[0]
    assert r.status == "failed" and r.attempts == 1


def test_compaction_triggers_at_80_percent(spark):
    lines = [
        (1, "## g"),
        (2, "- big one !tokens:90000"),
        (3, "- big two !tokens:90000"),
        (4, "- small !tokens:10"),
    ]
    out = _run(spark, lines)  # task_idx 1..3
    # 90k + 90k = 180k >= 0.8 * 200k -> compaction after task two
    assert out[2].compactions == 1
    assert out[3].session_tokens == 10     # counter reset, then +10
    assert all(r.status == "completed" for r in out.values())


def test_status_summary(spark):
    state = run_pipeline(
        spark, [(1, "- ok"), (2, "- bad !fail:unknown:99")], model=ScriptedModel()
    )
    summary = {r.status: r.n for r in status_summary(state).collect()}
    assert summary == {"completed": 1, "failed": 1}


def test_summarize_segments_folds_group_to_one_row(spark):
    from open_pulsar_spark.operators.pipeline import summarize_segments

    state = run_pipeline(
        spark,
        [
            (1, "## g1"),
            (2, "- alpha"),
            (3, "- beta !fail:unknown:99"),
            (4, "## g2"),
            (5, "- gamma"),
        ],
        model=ScriptedModel(),
    )
    out = {r.segment_id: r for r in summarize_segments(state, max_words=4).collect()}
    assert len(out) == 2
    s1 = out[1]
    assert s1.n_tasks == 2 and s1.n_completed == 1
    assert s1.summary_words <= 4
    assert s1.summary.startswith("done[primary]")
    assert out[2].n_completed == 1


def test_run_task_message_recursive_invocation(spark):
    from open_pulsar_spark.operators.pipeline import run_task_message

    assert run_task_message(spark, "do a thing") == "completed (attempts=1)"
    assert (
        run_task_message(spark, "broken !fail:auth:1") == "failed (attempts=1)"
    )


@pytest.mark.parametrize(
    ("text", "expected"),
    [
        ("HTTP 429 too many requests", "rate_limit"),
        ("Rate Limit hit", "rate_limit"),
        ("context_length_exceeded", "context_overflow"),
        ("401 unauthorized", "auth"),
        ("timed out waiting", "timeout"),
        ("ECONNREFUSED", "network"),
        ("???", "unknown"),
    ],
)
def test_classify_error_text(text, expected):
    assert classify_error_text(text) == expected


def test_backoff_arithmetic():
    assert backoff_sec(1, False) == 2
    assert backoff_sec(3, False) == 8
    assert backoff_sec(1, True) == 4
    assert backoff_sec(10, False) == 60  # cap
    assert backoff_sec(10, True) == 60   # cap applies after multiplier
