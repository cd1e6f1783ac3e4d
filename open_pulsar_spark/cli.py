"""CLI entry points mirroring the reference's operational surface
(SURVEY §3.3): run a markdown task file with persistent, resumable
state; --dry-run shows the parsed plan; --status aggregates the state
table; --reset drops it.

State layout under --state-dir:
    state.parquet/   one row per task (the D2 state table)
    fingerprint      sha-256 of the task file at init (F8 hash guard)

Resume: a rerun on the same state dir skips finished tasks, re-runs
interrupted/running ones, and refuses if the task file changed.

    python -m open_pulsar_spark.cli run tasks.md --state-dir .pulsar-state
    python -m open_pulsar_spark.cli status --state-dir .pulsar-state
    python -m open_pulsar_spark.cli dry-run tasks.md
    python -m open_pulsar_spark.cli reset --state-dir .pulsar-state

The model defaults to the deterministic stub; a real backend plugs in
through operators.pipeline.ModelFn.
"""

from __future__ import annotations

import argparse
import os
import re
import shutil
import sys

from pyspark.sql import SparkSession

# Task-file boot directive, same syntax as the reference
# (agent-loop.sh:50-64): `<!-- boot: relative/or/absolute/path -->`.
_BOOT_DIRECTIVE = re.compile(r"^<!-- boot: (.+) -->$")


def _read_lines(path: str) -> list[tuple[int, str]]:
    with open(path, encoding="utf-8") as fh:
        return [(i + 1, line.rstrip("\n")) for i, line in enumerate(fh)]


def find_boot_file(task_path: str) -> str | None:
    """Boot-file discovery with the reference's precedence
    (agent-loop.sh:47-69): (1) a `<!-- boot: path -->` directive in the
    task file (relative to the task file's directory), else (2)
    `.pulsar/boot.md` next to the task file."""
    task_dir = os.path.dirname(os.path.abspath(task_path))
    with open(task_path, encoding="utf-8") as fh:
        for line in fh:
            m = _BOOT_DIRECTIVE.match(line.strip())
            if m:
                rel = m.group(1)
                return rel if os.path.isabs(rel) else os.path.join(task_dir, rel)
    default = os.path.join(task_dir, ".pulsar", "boot.md")
    return default if os.path.exists(default) else None


def load_boot_context(task_path: str) -> tuple[str | None, str | None]:
    """(boot_path, boot_content) — (None, None) when no boot file."""
    p = find_boot_file(task_path)
    if p is None:
        return None, None
    with open(p, encoding="utf-8") as fh:
        return p, fh.read().strip()


def _state_paths(state_dir: str) -> tuple[str, str]:
    return os.path.join(state_dir, "state.parquet"), os.path.join(state_dir, "fingerprint")


def cmd_dry_run(spark: SparkSession, path: str) -> int:
    from open_pulsar_spark.operators.pipeline import parse_markdown, sessionize_segments

    boot_path, _ = load_boot_context(path)
    if boot_path is not None:
        print(f"boot: {boot_path}")
    tasks = sessionize_segments(parse_markdown(spark, _read_lines(path)))
    rows = tasks.orderBy("task_idx").collect()
    for r in rows:
        print(f"  [{r.task_idx:03d}] ({r.grp} / segment {r.segment_id}) {r.task}")
    print(f"{len(rows)} task(s) parsed; nothing executed")
    return 0


def cmd_run(
    spark: SparkSession,
    path: str,
    state_dir: str,
    primary_model: str = "primary",
    fallback_model: str = "fallback",
) -> int:
    from open_pulsar_spark.operators.pipeline import (
        file_fingerprint,
        run_pipeline,
        status_summary,
    )

    lines = _read_lines(path)
    fp = file_fingerprint(lines)
    state_path, fp_path = _state_paths(state_dir)
    # Crash recovery for the two-rename swap below: a kill between the
    # renames leaves only state.parquet.old — without this, the next
    # run would see "no state" and silently RE-EXECUTE every completed
    # task. Roll the old state back; if both exist the swap completed
    # and .old is just the unreclaimed previous generation.
    old_path = state_path + ".old"
    if os.path.exists(old_path):
        if not os.path.exists(state_path):
            os.rename(old_path, state_path)
        else:
            shutil.rmtree(old_path, ignore_errors=True)
    prior = prior_hash = None
    if os.path.exists(state_path):
        if not os.path.exists(fp_path):
            # State without its fingerprint is unverifiable (F8 hash
            # guard) — refuse to resume rather than silently rerun.
            print(
                f"state at {state_dir} has no fingerprint file; "
                "refusing to resume (use reset to start over)",
                file=sys.stderr,
            )
            return 2
        prior = spark.read.parquet(state_path)
        with open(fp_path, encoding="utf-8") as fh:
            prior_hash = fh.read().strip()
    _, boot_context = load_boot_context(path)
    state = run_pipeline(
        spark,
        lines,
        prior_state=prior,
        prior_hash=prior_hash,
        primary_model=primary_model,
        fallback_model=fallback_model,
        boot_context=boot_context,
    )
    os.makedirs(state_dir, exist_ok=True)
    # The new state's plan still READS the prior state.parquet, so never
    # overwrite in place: write to a temp dir, then swap via renames
    # (the reference's tmp+mv idiom, agent-loop.sh:315-319).
    tmp_path = state_path + ".tmp"
    shutil.rmtree(tmp_path, ignore_errors=True)
    state.write.mode("overwrite").parquet(tmp_path)
    # Fingerprint BEFORE the swap: a crash between the state rename and
    # a later fingerprint write would strand state.parquet without its
    # hash — unresumable, recoverable only by reset (discarding every
    # completed task). This order is safe in both directions: on a
    # resume run the hash was already verified equal, so the write is
    # a no-op; on a first run a crash after fp-write but before the
    # swap leaves fingerprint-without-state, which the next run treats
    # as a clean fresh start.
    with open(fp_path, "w", encoding="utf-8") as fh:
        fh.write(fp)
    if os.path.exists(state_path):
        os.rename(state_path, old_path)
    os.rename(tmp_path, state_path)
    shutil.rmtree(old_path, ignore_errors=True)
    written = spark.read.parquet(state_path)
    for r in status_summary(written).collect():
        print(f"{r.status}: {r.n}")
    failed = written.where(written.status == "failed").count()
    return 1 if failed else 0


def cmd_status(spark: SparkSession, state_dir: str) -> int:
    state_path, _ = _state_paths(state_dir)
    if not os.path.exists(state_path):
        print("no state found")
        return 1
    state = spark.read.parquet(state_path)
    from open_pulsar_spark.operators.pipeline import status_summary

    for r in status_summary(state).collect():
        print(f"{r.status}: {r.n}")
    for r in state.where(state.status == "failed").orderBy("task_idx").collect():
        print(f"  failed [{r.task_idx:03d}] {r.grp} > {r.task}")
    return 0


def cmd_reset(state_dir: str) -> int:
    if os.path.isdir(state_dir):
        shutil.rmtree(state_dir)
        print(f"removed {state_dir}")
    else:
        print("no state to remove")
    return 0


def cmd_query(spark: SparkSession, name: str, sf_dir: str, limit: int) -> int:
    """Run one registered query (or list them all with name='list')."""
    from open_pulsar_spark import registry

    qs = registry.all_queries()
    if name == "list":
        for n in sorted(qs):
            print(n)
        return 0
    if name not in qs:
        print(f"unknown query {name!r}; `query list` shows all", file=sys.stderr)
        return 2
    qs[name](spark, sf_dir).show(limit, truncate=False)
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="open_pulsar_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    p_run = sub.add_parser("run")
    p_run.add_argument("task_file")
    p_run.add_argument("--state-dir", default=".pulsar-state")
    p_run.add_argument("--model", default="primary")
    p_run.add_argument("--fallback-model", default="fallback")
    p_dry = sub.add_parser("dry-run")
    p_dry.add_argument("task_file")
    p_dry.add_argument("--model", default="primary")
    p_dry.add_argument("--fallback-model", default="fallback")
    p_status = sub.add_parser("status")
    p_status.add_argument("--state-dir", default=".pulsar-state")
    p_reset = sub.add_parser("reset")
    p_reset.add_argument("--state-dir", default=".pulsar-state")
    p_query = sub.add_parser("query")
    p_query.add_argument("name", help="registered query name, or 'list'")
    p_query.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_query.add_argument("--limit", type=int, default=20)
    args = ap.parse_args(argv)

    if args.cmd == "query" and args.name == "list":
        return cmd_query(None, "list", "", 0)  # no session needed to list

    if args.cmd == "reset":
        return cmd_reset(args.state_dir)

    from open_pulsar_spark import get_spark

    spark = get_spark("open-pulsar-cli")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        if args.cmd == "dry-run":
            return cmd_dry_run(spark, args.task_file)
        if args.cmd == "run":
            return cmd_run(
                spark,
                args.task_file,
                args.state_dir,
                primary_model=args.model,
                fallback_model=args.fallback_model,
            )
        if args.cmd == "status":
            return cmd_status(spark, args.state_dir)
        if args.cmd == "query":
            return cmd_query(spark, args.name, args.sf_dir, args.limit)
        raise AssertionError(args.cmd)
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
