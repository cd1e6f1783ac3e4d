"""Batch file sources with an explicit schema contract.

The reference reads three on-disk formats — markdown task files, JSON
config/usage payloads, and plain-text logs (`agent-loop.sh:236-268`,
`:418-422`, `telegram-agent.py:60-78`) — each with hand-rolled "is
this shaped right?" checks. This module is the Spark-side equivalent
for the engine's batch inputs: one reader per format, always with an
EXPLICIT schema, plus a drift check that fails loudly instead of
silently nulling.

Why explicit schemas matter at 100 TB:
  - schema inference is a full extra pass over the data for CSV/JSON
    (Spark samples, but correctness-grade inference reads everything);
  - an inferred schema drifts with the sample — a column that is int
    in today's files and string tomorrow flips the type under you;
  - with a declared schema, the reader prunes columns at the scan and
    pushes filters (parquet), and malformed rows are routed by
    `mode=PERMISSIVE` into `_corrupt_record` where they can be
    quarantined instead of killing the job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

BATCH_FORMATS = ("parquet", "orc", "csv", "json", "text")


class SchemaDriftError(ValueError):
    """Raised when a source's columns do not satisfy the declared schema."""


def read_batch(
    spark: SparkSession,
    path: str,
    file_format: str = "parquet",
    schema: StructType | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Read a batch dataset with a declared schema.

    parquet/orc carry their own schema (the declared one, when given,
    acts as the read contract — missing columns fail via check_schema);
    csv/json REQUIRE a schema: inference is an extra data pass and a
    correctness hazard. text yields one `value` column per line (the
    log-tail shape).
    """
    if file_format not in BATCH_FORMATS:
        raise ValueError(f"unknown format {file_format!r}; one of {BATCH_FORMATS}")
    reader = spark.read
    opts = dict(options or {})
    if file_format == "csv":
        opts.setdefault("header", "true")
        opts.setdefault("mode", "PERMISSIVE")
    if file_format == "json":
        opts.setdefault("mode", "PERMISSIVE")
    for k, v in opts.items():
        reader = reader.option(k, v)
    if file_format in ("csv", "json"):
        if schema is None:
            raise ValueError(
                f"{file_format} requires an explicit schema (inference is an "
                "extra full pass and drifts with the sample)"
            )
        reader = reader.schema(schema)
    df = getattr(reader, file_format)(path)
    if schema is not None:
        df = check_schema(df, schema)
    return df


def check_schema(df: DataFrame, expected: StructType) -> DataFrame:
    """Fail loudly if `df` is missing declared columns or disagrees on
    their types; extra columns are tolerated (projection prunes them).
    Returns `df` projected to the declared columns, in declared order.

    Type comparison is NULLABILITY-INSENSITIVE (simpleString): nested
    containsNull/valueContainsNull flags vary by writer (pyarrow marks
    array elements nullable by default) without changing a single
    readable value — exact DataType equality would raise a drift error
    whose 'expected array<string>, got array<string>' message can't
    even show a difference.
    """
    actual = {f.name: f.dataType for f in df.schema.fields}
    problems = []
    for f in expected.fields:
        if f.name not in actual:
            problems.append(f"missing column {f.name!r}")
        elif actual[f.name].simpleString() != f.dataType.simpleString():
            problems.append(
                f"column {f.name!r}: expected {f.dataType.simpleString()}, "
                f"got {actual[f.name].simpleString()}"
            )
    if problems:
        raise SchemaDriftError("; ".join(problems))
    return df.select(*[f.name for f in expected.fields])


def quarantine_corrupt(df: DataFrame, corrupt_col: str = "_corrupt_record"):
    """Split a PERMISSIVE-parsed frame into (clean, quarantined).

    The quarantine half keeps the raw record for replay after a parser
    fix — the 100 TB answer to "one bad row killed the 6-hour job".
    """
    if corrupt_col not in df.columns:
        return df, df.limit(0)
    # Spark refuses to answer queries that reference ONLY the corrupt
    # column of a raw JSON/CSV scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN);
    # its documented workaround is to materialize the parsed frame
    # first. localCheckpoint rather than cache(): the caller gets two
    # frames and no handle to unpersist, so a cache would pin every
    # parsed batch in executor storage for the session lifetime —
    # checkpoint blocks are reclaimed by the ContextCleaner once the
    # returned frames are dropped.
    df = df.localCheckpoint(eager=True)
    clean = df.where(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.where(F.col(corrupt_col).isNotNull())
    return clean, bad


STREAM_FORMATS = ("parquet", "orc", "csv", "json", "text")


def read_stream(
    spark: SparkSession,
    path: str,
    file_format: str = "parquet",
    schema: StructType | None = None,
    options: dict[str, str] | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Structured-Streaming twin of read_batch: a file-discovery
    stream over the same five formats with the same contract —
    streaming ALWAYS requires the declared schema (Spark refuses
    streaming inference, and the batch rationale holds doubly: an
    unbounded source can drift mid-stream), csv/json default to
    PERMISSIVE so corrupt rows flow to quarantine_corrupt inside
    foreachBatch instead of killing the query, and text yields the
    one-`value`-per-line log-tail shape.

    Scale: file discovery is the source's only state (checkpointed by
    the sink's query); `max_files_per_trigger` is the ingestion-rate
    knob (the bus.py micro-batch contract). check_schema runs ONCE on
    the unbounded frame — column drift in files added later surfaces
    as a per-batch parse failure into the corrupt column, never a
    silent column reorder, because the declared schema pins the read.
    """
    if file_format not in STREAM_FORMATS:
        raise ValueError(
            f"unknown format {file_format!r}; one of {STREAM_FORMATS}"
        )
    if schema is None and file_format != "text":
        raise ValueError(
            "streaming sources require an explicit schema (Spark does "
            "not infer on unbounded input)"
        )
    reader = spark.readStream
    opts = dict(options or {})
    if file_format == "csv":
        opts.setdefault("header", "true")
        opts.setdefault("mode", "PERMISSIVE")
    if file_format == "json":
        opts.setdefault("mode", "PERMISSIVE")
    if max_files_per_trigger is not None:
        opts["maxFilesPerTrigger"] = str(max_files_per_trigger)
    for k, v in opts.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    df = getattr(reader, file_format)(path)
    if schema is not None:
        df = check_schema(df, schema)
    return df
