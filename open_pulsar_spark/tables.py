"""Test-table catalog: the driver's TPC-H-ish star schema + docs/embeddings.

Tables live as one parquet file per table under a scale-factor dir
(TESTDATA.md).  At 100 TB each of these would be a partitioned parquet
/ Delta dataset; `load_table` keeps that substitution to one place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor: these
# are bounded catalogs (5 regions, 25 nations), not fact tables.
BROADCASTABLE = {"region", "nation"}


def _parquet_nanos_columns(path: str) -> set[str]:
    """Column names whose parquet logical type is TIMESTAMP(NANOS).

    Footer-only read (no data IO). Used to gate the ns->us bigint
    rescale below: a bigint column is only rescaled when the file
    actually declares nanosecond timestamps — a plain int64 column that
    merely shares the name must pass through untouched, otherwise its
    values would be silently divided by 1000.
    """
    try:
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
    except Exception:
        # directory-style parquet: read_schema wants a single file —
        # fall back to dataset discovery before giving up
        try:
            import pyarrow.dataset as pads

            schema = pads.dataset(path, format="parquet").schema
        except Exception:
            import warnings

            warnings.warn(
                f"could not read parquet footer for {path!r}; assuming no "
                "TIMESTAMP(NANOS) columns — if this table does carry ns "
                "timestamps they will NOT be rescaled",
                stacklevel=2,
            )
            return set()
    import pyarrow as pa

    return {
        f.name
        for f in schema
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    }


def _normalize_timestamps(df: DataFrame, nanos_cols: set[str] = frozenset()) -> DataFrame:
    """Map every temporal column to plain TIMESTAMP (UTC wall clock).

    The driver's parquet stores naive timestamps; depending on the
    writer they arrive as TIMESTAMP(NANOS) (rejected unless read as
    bigint) or timestamp[us] without tz (read as TIMESTAMP_NTZ under
    Spark 4's inferTimestampNTZ). Both are the same naive instant that
    DuckDB sees, so with a UTC session timezone the NTZ->TIMESTAMP cast
    and the ns->us truncation are identity wall-clock mappings — and
    downstream code (unix_micros, window(), watermarks) only has to
    handle one type.
    """
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
        elif dtype == "bigint" and col in nanos_cols:
            # nanosAsLong fired for this column (footer-verified):
            # ns -> us exactly like DuckDB's TIMESTAMP_NS -> TIMESTAMP
            # cast (truncation).
            df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    return df


def widen_for_kernel(df: DataFrame) -> DataFrame:
    """Raise a narrow scan's parallelism before an Arrow/Python kernel
    stage (mapInPandas and friends).

    The per-partition Python kernel is the serial unit: a local
    single-file parquet scan yields only as many splits as row groups
    (measured: 10 splits on 32 cores → the minhash kernel ran 2.3×
    slower than with full fan-out). At cluster scale inputs arrive in
    hundreds of splits and this is a no-op — the repartition only fires
    when splits < cores, so the production plan stays map-only while
    the narrow-scan case pays one tiny local round-robin exchange of
    the projected columns (project BEFORE widening so the shuffle
    carries only what the kernel reads).
    """
    if df.isStreaming:  # micro-batches already fan out per trigger
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; one of {TABLE_NAMES}")
    # Older driver testdata wrote events.ts as TIMESTAMP(NANOS), which
    # Spark rejects by default; the conf is runtime-settable, so set it
    # here too — callers (e.g. the verify driver) may hand us a session
    # built without it. Same for the session timezone: the NTZ cast in
    # _normalize_timestamps and every date_trunc/date_format downstream
    # must run in UTC to match DuckDB's naive-timestamp semantics, and
    # the driver's vanilla session may not have set it.
    #
    # DELIBERATE SESSION-WIDE SIDE EFFECT: the timezone conf applies at
    # EXECUTION time of the lazily-built plans, so it cannot be set and
    # restored around this call — it must stay UTC for as long as any
    # frame loaded here may execute. An application embedding this
    # engine in a non-UTC session should isolate it (own SparkSession /
    # `newSession()`), which shares the JVM but not runtime confs.
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None) != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/{name}.parquet"
    return _normalize_timestamps(
        spark.read.parquet(path), _parquet_nanos_columns(path)
    )


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql can see them."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str,
    buckets: int = 8,
) -> None:
    """Persist `df` as a bucketed (and in-bucket sorted) table on `key`.

    Bucketing is the zero-shuffle join layout: two tables bucketed on
    the same key with the same bucket count join WITHOUT exchanging
    either side — at 100 TB that turns the nightly fact⋈fact join from
    the dominant shuffle into a local merge per bucket. This is the
    one-place implementation of SCALE.md's "facts arrive bucketed on
    their natural keys" assumption.
    """
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )
