"""L3 — the task-pipeline state machine (SURVEY §2.12 C1-C6, §3.1) as
a Spark job: ordered stateful per-segment execution with retry,
backoff, error-class policy, model failover, and context compaction.

Shape: tasks parse into a DataFrame, group-sessionize into segments
(consecutive same-group tasks share an LLM session — SURVEY W1), and
each segment is processed IN ORDER inside one `applyInPandas` group
while segments run in parallel across the cluster. That is the 100 TB
posture the reference's single-threaded loop can't reach: per-key
ordering, cross-key parallelism (SURVEY §4.3).

The model boundary is a pluggable callable; `ScriptedModel` is the
deterministic test stub (the reference never tests live LLM calls
either — its CLAUDE.md:100). Backoff is RECORDED as data
(`backoff_total_sec`) rather than slept in tests; a production runner
re-enqueues with a not_before column (SURVEY §7.3.3).

Policy parity (reference file:line):
  C1 attempt cap 5            agent-loop.sh:14, :679-784
  C2 backoff 2^n ×2-on-429 ≤60  agent-loop.sh:373-391
  C3 error-class policy       agent-loop.sh:722-782
  C4 model failover           agent-loop.sh:750-759
  C5 failure isolation        agent-loop.sh:802-811 (session chain breaks)
  A4/A5/A8 token accumulation + 80% compaction  agent-loop.sh:786-800
"""

from __future__ import annotations

import hashlib
import json
import re
from collections.abc import Callable
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from open_pulsar_spark.operators.tasks import ERROR_CLASSES

ERROR_TAIL_BYTES = 3000  # classify over the log tail only (agent-loop.sh:397)

MAX_ATTEMPTS = 5
CONTEXT_WINDOW = 200_000
COMPACT_THRESHOLD = 0.8
BACKOFF_CAP_SEC = 60

STATE_SCHEMA = (
    "task_idx LONG, grp STRING, task STRING, segment_id LONG, status STRING, "
    "attempts LONG, session_id STRING, model_used STRING, tokens LONG, "
    "session_tokens LONG, error_class STRING, hint STRING, compactions LONG, "
    "backoff_total_sec LONG, result STRING"
)


@dataclass
class ModelReply:
    ok: bool
    result: str = ""
    session_id: str | None = None
    tokens: int = 0
    error: str = ""


ModelFn = Callable[[str, str | None, str], ModelReply]


class ScriptedModel:
    """Deterministic stub model driven by directives in the task text:

      ``!fail:<class>:<n>``  — fail the first n attempts with an error
                               message matching error class <class>
      ``!tokens:<n>``        — report n tokens used (default 1000)
      ``!fail:auth:1``       — auth failures abort regardless of n

    Session ids chain deterministically (md5 of prior id + prompt), so
    session threading is observable in assertions.
    """

    ERROR_TEXT = {
        "rate_limit": "HTTP 429 rate limit exceeded",
        "context_overflow": "error: context_length_exceeded",
        "auth": "401 unauthorized",
        "timeout": "operation timed out",
        "network": "ECONNREFUSED",
        "unknown": "mystery failure",
    }

    def __init__(self) -> None:
        self.calls: int = 0

    def __call__(self, prompt: str, session_id: str | None, model_name: str) -> ModelReply:
        self.calls += 1
        m = re.search(r"!fail:(\w+):(\d+)", prompt)
        attempt = int(re.search(r"\[attempt (\d+)\]", prompt).group(1)) if "[attempt" in prompt else 1
        if m and attempt <= int(m.group(2)):
            return ModelReply(ok=False, error=self.ERROR_TEXT.get(m.group(1), "boom"))
        tok = re.search(r"!tokens:(\d+)", prompt)
        tokens = int(tok.group(1)) if tok else 1000
        new_session = hashlib.md5(f"{session_id or ''}|{prompt}".encode()).hexdigest()[:12]
        return ModelReply(
            ok=True, result=f"done[{model_name}]:{prompt[:30]}",
            session_id=new_session, tokens=tokens,
        )


def classify_error_text(text: str) -> str:
    """Python port of the classify_error regex CASE (same table the
    declarative operator uses — operators.tasks.ERROR_CLASSES),
    applied to the last ERROR_TAIL_BYTES of the log (S6 tail scan)."""
    tail = text[-ERROR_TAIL_BYTES:]
    for name, rx in ERROR_CLASSES:
        if re.search(rx, tail, re.IGNORECASE):
            return name
    return "unknown"


def analyze_failure(raw_analysis: str) -> dict:
    """Schema-enforced failure-analysis contract (SURVEY §2.10 U4;
    reference agent-loop.sh:548-587): the analyzer must return JSON
    {retry: bool, reason: str, hint: str}; anything unparsable falls
    back to retry=false (the reference's double fallback,
    agent-loop.sh:576-586) — the `from_json`+`coalesce` pattern in
    Python form for the executor-side policy loop."""
    default = {
        "retry": False,
        "reason": "Could not parse analysis output",
        "hint": "",
    }
    try:
        doc = json.loads(raw_analysis)
    except (TypeError, ValueError):
        return default
    if not isinstance(doc, dict) or not isinstance(doc.get("retry"), bool):
        return default
    return {
        "retry": doc["retry"],
        "reason": str(doc.get("reason", "")),
        "hint": str(doc.get("hint", "")),
    }


def file_fingerprint(lines: list[tuple[int, str]]) -> str:
    """SHA-256 of the task-file content (SURVEY §2.2 F8; reference
    agent-loop.sh:250-251) — the resume-integrity key."""
    blob = "\n".join(raw for _, raw in sorted(lines)).encode()
    return hashlib.sha256(blob).hexdigest()


def backoff_sec(attempt: int, rate_limited: bool) -> int:
    return min((2**attempt) * (2 if rate_limited else 1), BACKOFF_CAP_SEC)


def parse_markdown(spark: SparkSession, lines: list[tuple[int, str]]) -> DataFrame:
    """Markdown lines → (task_idx, grp, task) via the declarative parse
    pipeline (operators.tasks.parse_task_lines)."""
    from open_pulsar_spark.operators.tasks import parse_task_lines

    return parse_task_lines(
        spark.createDataFrame(lines, "line_id INT, raw STRING")
    )


def sessionize_segments(tasks: DataFrame) -> DataFrame:
    """Add segment_id: consecutive same-group runs (SURVEY W1)."""
    w = Window.orderBy("task_idx")
    changed = F.when(~F.col("grp").eqNullSafe(F.lag("grp").over(w)), 1).otherwise(0)
    return tasks.withColumn(
        "segment_id",
        F.sum(changed).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def run_pipeline(
    spark: SparkSession,
    lines: list[tuple[int, str]],
    model: ModelFn | None = None,
    primary_model: str = "primary",
    fallback_model: str = "fallback",
    max_attempts: int = MAX_ATTEMPTS,
    context_window: int = CONTEXT_WINDOW,
    boot_context: str | None = None,
    prior_state: DataFrame | None = None,
    prior_hash: str | None = None,
    analyzer: Callable[[str, str], str] | None = None,
) -> DataFrame:
    """Execute a markdown task list through the state machine; returns
    the final state table (one row per task).

    Resume semantics (SURVEY F1/F8/T6): pass the previous run's state
    as `prior_state` plus the fingerprint it was built against as
    `prior_hash` — a changed task file refuses to resume (hash guard),
    finished rows (completed/failed) are carried through untouched
    (skip filter), and rows stuck in 'running' (a killed run) are
    re-executed like interrupted ones (SIGKILL recovery).

    `boot_context` is the boot-file scan (SURVEY S2): a config-time
    scalar prepended to every prompt — broadcast by closure capture.
    """
    model = model or ScriptedModel()
    # U4 analyzer: (task, error) → raw JSON verdict. The default stub
    # always advises retry with a hint; a live LLM (or a deliberately
    # broken stub, in tests) plugs in here.
    analyzer = analyzer or (
        lambda task, err: '{"retry": true, "reason": "transient", '
        '"hint": "try a different approach"}'
    )
    if prior_state is not None:
        # the hash guard is NOT optional on resume: the skip filter
        # joins finished rows by task_idx against the NEW file's parse,
        # so resuming against an edited/reordered file would silently
        # skip the wrong tasks. A caller without the fingerprint must
        # not resume (cli.py enforces the same rule at its layer).
        if prior_hash is None:
            raise ValueError(
                "resume requires prior_hash (the fingerprint the prior "
                "state was built against); refusing to resume unguarded"
            )
        current = file_fingerprint(lines)
        if current != prior_hash:
            raise ValueError(
                f"task file changed since the interrupted run "
                f"(hash {current[:12]} != stored {prior_hash[:12]}); refusing to resume"
            )
    tasks = sessionize_segments(parse_markdown(spark, lines))

    carried = None
    if prior_state is not None:
        finished = prior_state.where(F.col("status").isin("completed", "failed"))
        carried = finished
        # skip-filter: only unfinished tasks re-run ('running' rows from a
        # killed driver re-run like 'interrupted' ones)
        tasks = tasks.join(
            finished.select("task_idx"), "task_idx", "left_anti"
        )

    def run_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("task_idx")
        session_id: str | None = None
        session_tokens = 0
        compactions = 0
        summary: str | None = None
        current_model = primary_model
        out = []
        for r in pdf.itertuples():
            status, attempts, hint, error_class = "pending", 0, None, None
            backoff_total = 0
            tokens = 0
            result = ""
            while attempts < max_attempts:
                attempts += 1
                prompt_parts = []
                if boot_context:
                    prompt_parts.append(f"[boot] {boot_context}")
                if summary:
                    prompt_parts.append(f"[context summary] {summary}")
                if hint:
                    prompt_parts.append(f"[hint] {hint}")
                prompt_parts.append(f"[attempt {attempts}] {r.task}")
                reply = model("\n".join(prompt_parts), session_id, current_model)
                if reply.ok:
                    status = "completed"
                    session_id = reply.session_id
                    tokens = reply.tokens
                    session_tokens += reply.tokens
                    result = reply.result
                    error_class = None
                    # A5/A8: compaction at >= 80% of the context window
                    if session_tokens >= COMPACT_THRESHOLD * context_window:
                        summary = f"summary-of:{session_id}"
                        session_id = None
                        session_tokens = 0
                        compactions += 1
                    break
                error_class = classify_error_text(reply.error)
                if error_class == "auth":            # C3: abort, no retry
                    status = "failed"
                    break
                if error_class == "context_overflow":  # C3: fresh session + hint
                    session_id = None
                    session_tokens = 0
                    hint = "be concise; prior context overflowed"
                    continue
                if error_class in ("rate_limit", "timeout"):  # C2+C4
                    backoff_total += backoff_sec(attempts, error_class == "rate_limit")
                    current_model = (
                        fallback_model if current_model == primary_model else primary_model
                    )
                    continue
                if error_class == "network":
                    backoff_total += backoff_sec(attempts, False)
                    continue
                # unknown → U4 analysis decides retry + hint; malformed
                # analyzer output coalesces to retry=false
                verdict = analyze_failure(analyzer(r.task, reply.error))
                if not verdict["retry"]:
                    status = "failed"
                    break
                hint = verdict["hint"] or "previous attempt failed; try a different approach"
            else:
                status = "failed"
            if status == "failed":                  # C5: break the chain
                session_id = None
                session_tokens = 0
            out.append(
                dict(
                    task_idx=r.task_idx, grp=r.grp, task=r.task,
                    segment_id=r.segment_id, status=status, attempts=attempts,
                    session_id=session_id, model_used=current_model,
                    tokens=tokens, session_tokens=session_tokens,
                    error_class=error_class, hint=hint, compactions=compactions,
                    backoff_total_sec=backoff_total, result=result,
                )
            )
        return pd.DataFrame(out)

    state = tasks.groupBy("segment_id").applyInPandas(run_segment, STATE_SCHEMA)
    if carried is not None:
        state = state.unionByName(carried.select(*state.columns))
    return state


def summarize_segments(
    state: DataFrame,
    max_words: int = 500,
) -> DataFrame:
    """A8/U5 — the compaction aggregate as a standalone operator: fold a
    whole segment's completed work into one ≤max_words summary row
    (group of rows → one row, the canonical UDAF-via-applyInPandas;
    reference compact_session, agent-loop.sh:428-455).

    The summarizer is the deterministic stub (a real LLM consumes the
    same collected batch). Scale: one shuffle on segment_id; each
    group's payload is the segment's task list — bounded by segment
    size, not table size.
    """

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("task_idx")
        done = pdf[pdf.status == "completed"]
        words: list[str] = []
        for r in done.itertuples():
            words.extend(str(r.result).split())
        summary = " ".join(words[:max_words])
        return pd.DataFrame(
            [
                {
                    "segment_id": int(pdf.segment_id.iloc[0]),
                    "grp": pdf.grp.iloc[0],
                    "n_tasks": len(pdf),
                    "n_completed": len(done),
                    "total_tokens": int(pdf.tokens.sum()),
                    "summary": summary,
                    "summary_words": min(len(words), max_words),
                }
            ]
        )

    schema = (
        "segment_id LONG, grp STRING, n_tasks LONG, n_completed LONG, "
        "total_tokens LONG, summary STRING, summary_words LONG"
    )
    return state.groupBy("segment_id").applyInPandas(fold, schema)


def run_task_message(
    spark: SparkSession,
    text: str,
    model: ModelFn | None = None,
    **pipeline_kwargs,
) -> str:
    """U6 — the operator that invokes the engine recursively
    (SURVEY §2.10; reference telegram-agent.py:323-345): a single
    message becomes a one-task list, runs through the whole inner
    pipeline, and reduces to a status string for the reply sink."""
    lines = [(1, f"- {text.strip()}")]
    state = run_pipeline(spark, lines, model=model, **pipeline_kwargs)
    row = state.collect()[0]
    return f"{row.status} (attempts={row.attempts})"


def status_summary(state: DataFrame) -> DataFrame:
    """End-of-run summary aggregation (SURVEY A2)."""
    return (
        state.groupBy("status")
        .agg(F.count("*").alias("n"))
        .orderBy("status")
    )
