"""Per-chat token-budget accounting (streaming A4/A5).

Streaming form of the reference's context-window accounting: tokens
accumulate per session (`SESSION_TOKENS`, agent-loop.sh:706), and
crossing 80% of the context window triggers compaction, which resets
the accumulator (agent-loop.sh:19, 788-797; defaults 200k window, 80%
threshold — BASELINE.md). Each chat's running token total is keyed
state; a message that pushes usage to >= the threshold emits
action='compact' and restarts the count at that message's own tokens
(the reference seeds the fresh session with the summary + current
task — its token cost restarts the meter the same way).

Implementation note: the current-generation API for this is
`transformWithStateInPandas` (typed named state, per-state TTL,
timers; requires the RocksDB state store provider — now the session
default). Its Python worker imports google.protobuf, which this
container does not ship, so `token_quota` keeps the
`applyInPandasWithState` implementation — same state semantics, one
tuple of state per key, processing-time timeout standing in for state
TTL. The TWS port is DONE below (`TokenQuotaProcessor` /
`token_quota_tws`, one ValueState[long] with ttlDurationMs) and
`token_quota_auto` selects it whenever the runtime actually has the
protobuf dependency (`has_tws()`), so deployments on a full Spark 4
install run the supported API with zero code change.

State per key is one LONG: at 100 TB of traffic the state store holds
|active chats| values, and idle chats are evicted by the timeout.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

CONTEXT_WINDOW = 200_000        # agent-loop.sh:18 fallback
COMPACT_PCT = 80                # agent-loop.sh:19
QUOTA_IDLE_TIMEOUT_MS = 30 * 24 * 3600 * 1000  # opt-in idle-chat eviction

OUTPUT_SCHEMA = (
    "chat_id LONG, update_id LONG, tokens LONG, used_tokens LONG, "
    "usage_pct DOUBLE, action STRING"
)
STATE_SCHEMA = StructType([StructField("used", LongType())])


_OUT_COLS = ["chat_id", "update_id", "tokens", "used_tokens", "usage_pct", "action"]


def _make_quota_fn(ttl_ms: int | None):
    def _quota_fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (chat_id,) = key
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()
            yield pd.DataFrame([], columns=_OUT_COLS)
            return
        used = state.get[0] if state.exists else 0
        out: list[tuple] = []
        # one concat + sort across ALL Arrow chunks — per-chunk sorting
        # would meter a multi-chunk group out of arrival order
        chunks = list(pdfs)
        batch = (
            pd.concat(chunks, ignore_index=True)
            if chunks
            else pd.DataFrame(columns=["update_id", "tokens"])
        )
        # arrival order within the batch: the reference's meter is
        # sequential per chat (update_id is its arrival cursor)
        for r in batch.sort_values("update_id").itertuples():
            used += int(r.tokens)
            pct = used * 100.0 / CONTEXT_WINDOW
            if pct >= COMPACT_PCT:
                out.append(
                    (chat_id, int(r.update_id), int(r.tokens), used, pct, "compact")
                )
                used = int(r.tokens)  # fresh session re-seeded by this turn
            else:
                out.append(
                    (chat_id, int(r.update_id), int(r.tokens), used, pct, "ok")
                )
        state.update((used,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(out, columns=_OUT_COLS)

    return _quota_fn


def token_quota(messages: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """messages(chat_id, update_id, tokens) → per-message quota ledger.

    One shuffle on chat_id; state is a single LONG per chat. Pass
    `ttl_ms` (e.g. QUOTA_IDLE_TIMEOUT_MS) to evict idle chats by
    processing-time timeout — and then ALWAYS run the query with a
    processing-time trigger: with the default ASAP trigger a
    ProcessingTimeTimeout query busy-loops no-data batches and
    processAllAvailable() never returns (see sessions.py's deployment
    note — same engine behavior).
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return messages.groupBy("chat_id").applyInPandasWithState(
        _make_quota_fn(ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def has_tws() -> bool:
    """True when transformWithStateInPandas can actually execute: its
    Python worker needs google.protobuf (the state-server wire format),
    which not every install ships."""
    try:
        import pyspark.sql.streaming.proto.StateMessage_pb2  # noqa: F401

        return True
    except ImportError:
        return False


def _make_tws_processor(ttl_ms: int | None):
    """TokenQuotaProcessor, built lazily so importing this module never
    touches the TWS API surface on protobuf-less installs."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TokenQuotaProcessor(StatefulProcessor):
        """transformWithStateInPandas form of the quota ledger: one
        named ValueState[long] per chat; idle-chat eviction is the
        state's OWN TTL (ttlDurationMs) instead of the hand-rolled
        processing-time timeout the applyInPandasWithState path needs.
        Metering logic is byte-identical to _make_quota_fn."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._used = handle.getValueState(
                "used", "used LONG", ttlDurationMs=ttl_ms
            )

        def handleInputRows(self, key, rows, timerValues):
            (chat_id,) = key
            used = self._used.get()[0] if self._used.exists() else 0
            chunks = list(rows)
            batch = (
                pd.concat(chunks, ignore_index=True)
                if chunks
                else pd.DataFrame(columns=["update_id", "tokens"])
            )
            out: list[tuple] = []
            for r in batch.sort_values("update_id").itertuples():
                used += int(r.tokens)
                pct = used * 100.0 / CONTEXT_WINDOW
                if pct >= COMPACT_PCT:
                    out.append(
                        (chat_id, int(r.update_id), int(r.tokens), used, pct, "compact")
                    )
                    used = int(r.tokens)
                else:
                    out.append(
                        (chat_id, int(r.update_id), int(r.tokens), used, pct, "ok")
                    )
            self._used.update((used,))
            yield pd.DataFrame(out, columns=_OUT_COLS)

        def close(self) -> None:
            pass

    return TokenQuotaProcessor()


def token_quota_tws(messages: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """token_quota on the supported Spark-4 stateful API. Requires
    has_tws(); same output contract as token_quota."""
    return messages.groupBy("chat_id").transformWithStateInPandas(
        _make_tws_processor(ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="ProcessingTime" if ttl_ms is not None else "None",
    )


def token_quota_auto(messages: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """The deployment entry point: the supported TWS implementation
    when the runtime can execute it, else the applyInPandasWithState
    fallback. Both carry identical metering semantics."""
    if has_tws():
        return token_quota_tws(messages, ttl_ms)
    return token_quota(messages, ttl_ms)
