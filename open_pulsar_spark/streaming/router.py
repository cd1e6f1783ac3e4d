"""Message-stream routing — the reference's dispatch pipeline
(telegram-agent.py:538-572, SURVEY §3.2) as pure DataFrame transforms.

Every function here takes and returns a DataFrame and works unchanged
on a batch frame or a streaming frame (`readStream`): projection of
the nested update struct, non-text filter, authorization semi-join,
and the 3-way command/chat/task router. The classifier is a column
expression (deterministic heuristic) so the whole route stays
JVM-side; an LLM classifier would swap in as a pandas UDF producing
the same label column (SURVEY §2.10 U3).

Scale: auth is a broadcast semi-join (the allowed set is config-sized);
everything else is stateless map work — no shuffle in the router.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

# Raw update shape (reference: telegram-agent.py:543-546, 622-624).
MESSAGE_STRUCT = StructType(
    [
        StructField("chat", StructType([StructField("id", LongType())])),
        StructField(
            "from",
            StructType(
                [StructField("id", LongType()), StructField("username", StringType())]
            ),
        ),
        StructField("text", StringType()),
    ]
)
UPDATE_SCHEMA = StructType(
    [
        StructField("update_id", LongType()),
        StructField("message", MESSAGE_STRUCT),
        StructField("edited_message", MESSAGE_STRUCT),
    ]
)


def project_updates(updates: DataFrame) -> DataFrame:
    """Nested update → flat (update_id, chat_id, from_id, username, text);
    falls back message → edited_message (SURVEY §2.2 F10)."""
    msg = F.coalesce(F.col("message"), F.col("edited_message"))
    return updates.select(
        "update_id",
        msg["chat"]["id"].alias("chat_id"),
        msg["from"]["id"].alias("from_id"),
        msg["from"]["username"].alias("username"),
        msg["text"].alias("text"),
    )


def filter_text(messages: DataFrame) -> DataFrame:
    """Drop empty/absent text (photos, stickers) — SURVEY §2.2 F3."""
    return messages.where(F.length(F.trim(F.coalesce("text", F.lit("")))) > 0)


def filter_authorized(
    spark: SparkSession, messages: DataFrame, allowed_ids: set[int]
) -> DataFrame:
    """Authorization semi-filter (SURVEY §2.2 F2): keep rows whose
    from_id is in the allowed set; an EMPTY set allows everyone.

    Implemented as a broadcast left-semi join so the stream side never
    shuffles."""
    if not allowed_ids:
        return messages
    allowed = spark.createDataFrame(
        [(i,) for i in sorted(allowed_ids)], "from_id LONG"
    )
    return messages.join(F.broadcast(allowed), "from_id", "left_semi")


def live_auth_filter(
    spark: SparkSession, allowlist_path: str, marker_path: str | None = None
):
    """Hot-reloading authorization (the reference re-reads its config
    between polls — agent-loop.sh's env sourcing; SURVEY S7): returns
    `apply(batch_df) -> batch_df` for use INSIDE foreachBatch, where
    each call re-reads the allowlist parquet dir — appending a user
    row takes effect on the next trigger with no query restart.

    Why not an in-plan stream-static join: for a path-based parquet
    static side, Spark freezes the file LISTING when the streaming
    query is planned (InMemoryFileIndex), so rows appended to the dir
    after .start() are never seen — measured in this repo's test
    suite, not assumed. Inside foreachBatch the frame is batch-scoped,
    every `spark.read` builds a fresh listing, and the reload contract
    actually holds. (A Delta/catalog-table static side re-resolves
    snapshots in-plan and could move this back into the plan.)

    Semantics match filter_authorized: broadcast left-semi on from_id;
    an EMPTY allowlist allows everyone — but only while the allowlist
    has NEVER been configured. Once a trigger has seen a non-empty
    allowlist, a later unreadable-or-empty read FAILS CLOSED (the
    batch is blocked and a loud warning logged): "volume unmounted /
    dir truncated mid-rewrite" must not silently disable authorization,
    the opposite failure mode from the never-configured default. The
    "was configured" fact is DURABLE — a local marker file, not driver
    memory — because the standard operator response to a persistent
    fault is a job restart, and a restart that forgot the allowlist
    ever existed would re-open the exact hole this guard closes.

    `marker_path` defaults to a sibling of the allowlist dir, which is
    ONLY safe when the two live on different failure domains than the
    fault you care about; if the allowlist sits on an unmountable
    volume or a remote filesystem (s3a://, hdfs:// — where a local
    open() cannot write at all), pass a marker_path on
    DRIVER-LOCAL/checkpoint storage or the restart-durability degrades
    back to per-process memory (a warning is logged when the marker
    cannot be written). The emptiness check is one driver-side count
    over a config-sized dir — per-batch cost is one listing + one
    broadcast, the slowly-changing-dimension pattern.
    """
    import os

    marker = marker_path or (allowlist_path.rstrip("/") + ".configured")
    state = {"was_configured": os.path.exists(marker)}

    def _remember_configured() -> None:
        if state["was_configured"]:
            return
        state["was_configured"] = True
        try:
            with open(marker, "w") as f:
                f.write("")
        except OSError:
            # marker write failing degrades to per-process memory only —
            # authorization itself is unaffected for this run
            import logging

            logging.getLogger(__name__).warning(
                "live_auth_filter: could not persist configured-marker %s",
                marker,
            )

    def apply(batch_df: DataFrame) -> DataFrame:
        try:
            allowed = (
                spark.read.schema("from_id LONG")
                .parquet(allowlist_path)
                .select("from_id")
                .distinct()
            )
            empty = allowed.limit(1).count() == 0
        except AnalysisException:
            if state["was_configured"]:
                # configured-then-vanished: an operational fault, not a
                # policy change — block the batch rather than admit all
                import logging

                logging.getLogger(__name__).error(
                    "live_auth_filter: allowlist %s was configured but is "
                    "now unreadable — failing CLOSED for this batch",
                    allowlist_path,
                )
                return batch_df.limit(0)
            # allowlist dir not written yet: same contract as an empty
            # list (allow everyone) — a missing config file must not
            # kill the streaming query from inside foreachBatch
            return batch_df
        if empty:
            if state["was_configured"]:
                import logging

                logging.getLogger(__name__).error(
                    "live_auth_filter: allowlist %s was configured but is "
                    "now empty — failing CLOSED for this batch",
                    allowlist_path,
                )
                return batch_df.limit(0)
            return batch_df
        _remember_configured()
        return batch_df.join(F.broadcast(allowed), "from_id", "left_semi")

    return apply


def classify_heuristic() -> F.Column:
    """Deterministic task-vs-chat classifier column (stand-in for the
    LLM classifier U3; failure→'chat' default becomes `otherwise`).

    Heuristic: imperative task-ish openers or long multi-step text →
    'task'; everything else 'chat'."""
    t = F.lower(F.trim(F.col("text")))
    return (
        F.when(
            t.rlike(r"^(run|build|fix|implement|create|add|refactor|deploy|write)\b"),
            "task",
        )
        .when(F.length(t) > 200, "task")
        .otherwise("chat")
    )


def route(messages: DataFrame, mode: str = "auto") -> DataFrame:
    """3-way router (SURVEY §2.2 F4/F7): command / chat / task.

    `/...` text is always a command; otherwise `mode` pins the branch
    or 'auto' consults the classifier column. Adds `route`, and for
    commands the parsed `cmd` / `cmd_args` (F11: split on first
    whitespace, strip a @botname suffix)."""
    if mode not in ("auto", "chat", "task"):
        raise ValueError(f"bad mode {mode!r}")
    branch = F.lit(mode) if mode != "auto" else classify_heuristic()
    # trimmed, like cmd/cmd_args below — ' /status' is still a command
    is_cmd = F.trim(F.col("text")).startswith("/")
    parts = F.split(F.trim("text"), r"\s+", 2)
    return messages.select(
        "*",
        F.when(is_cmd, "command").otherwise(branch).alias("route"),
        F.when(is_cmd, F.regexp_replace(parts[0], "@.*$", "")).alias("cmd"),
        # try_element_at: a bare command ("/status") has no args slot,
        # and ANSI mode makes element_at throw on out-of-bounds
        F.when(is_cmd, F.try_element_at(parts, F.lit(2))).alias("cmd_args"),
    )
