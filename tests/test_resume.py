"""Resume semantics (SURVEY F1/F8/T6): skip filter, hash guard,
killed-run recovery; plus the U4 analysis contract and boot context."""

from __future__ import annotations

import pytest

from open_pulsar_spark.operators.pipeline import (
    ScriptedModel,
    analyze_failure,
    file_fingerprint,
    run_pipeline,
)

LINES = [
    (1, "## g1"),
    (2, "- task one"),
    (3, "- task two !fail:unknown:99"),
    (4, "- task three"),
]


def test_resume_skips_finished_and_reruns_unfinished(spark):
    first = run_pipeline(spark, LINES, model=ScriptedModel())
    h = file_fingerprint(LINES)
    # simulate a killed run: task three stuck in 'running'
    prior = first.replace("completed", "running", subset=["status"]).where(
        first.task_idx == 3
    ).unionByName(first.where(first.task_idx != 3))
    resumed = run_pipeline(
        spark, LINES, model=ScriptedModel(), prior_state=prior, prior_hash=h
    )
    rows = {r.task_idx: r for r in resumed.collect()}
    assert len(rows) == 3
    assert rows[1].status == "completed"   # carried, not re-run
    assert rows[2].status == "failed"      # carried failure
    assert rows[3].status == "completed"   # 'running' row re-executed


def test_resume_refuses_changed_file(spark):
    first = run_pipeline(spark, LINES, model=ScriptedModel())
    h = file_fingerprint(LINES)
    changed = LINES[:-1] + [(4, "- task three EDITED")]
    with pytest.raises(ValueError, match="refusing to resume"):
        run_pipeline(
            spark, changed, model=ScriptedModel(), prior_state=first, prior_hash=h
        )


def test_boot_context_reaches_prompts(spark):
    class Capture(ScriptedModel):
        def __call__(self, prompt, session_id, model_name):
            assert prompt.startswith("[boot] project uses strict mode")
            return super().__call__(prompt, session_id, model_name)

    state = run_pipeline(
        spark,
        [(1, "- only task")],
        model=Capture(),
        boot_context="project uses strict mode",
    )
    assert state.collect()[0].status == "completed"


def test_analyze_failure_contract():
    ok = analyze_failure('{"retry": false, "reason": "bad input", "hint": "skip"}')
    assert ok == {"retry": False, "reason": "bad input", "hint": "skip"}
    # unparsable / wrong-shape output falls back to retry=false
    # (reference double-fallback semantics, agent-loop.sh:576-586)
    for bad in ["not json", '{"retry": "yes"}', "[]", None, '{"reason": "x"}']:
        out = analyze_failure(bad)
        assert out["retry"] is False
        assert out["reason"].startswith("Could not")


def test_fingerprint_sensitive_to_content():
    assert file_fingerprint(LINES) != file_fingerprint(LINES[:-1])
    assert file_fingerprint(LINES) == file_fingerprint(list(LINES))


def test_resume_without_hash_refuses(spark):
    """The hash guard is NOT optional: prior_state without prior_hash
    must refuse to resume — the skip filter joins by task_idx against
    the new parse, so an unguarded resume against an edited file would
    silently skip the wrong tasks."""
    import pytest

    from open_pulsar_spark.operators.pipeline import ScriptedModel, run_pipeline

    first = run_pipeline(spark, LINES, model=ScriptedModel())
    with pytest.raises(ValueError, match="prior_hash"):
        run_pipeline(spark, LINES, model=ScriptedModel(), prior_state=first)
