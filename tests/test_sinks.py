"""Sink behavior: chunk explosion (K1) and the date-partitioned audit
log (K3)."""

from __future__ import annotations

import datetime as dt
import os

from open_pulsar_spark.streaming.sinks import explode_chunks, write_audit


def test_explode_chunks_one_row_per_chunk(spark):
    df = spark.createDataFrame(
        [(1, "short"), (2, "y" * 1200)], "msg_id LONG, reply STRING"
    )
    out = explode_chunks(df, limit=500).collect()
    by_msg: dict[int, list] = {}
    for r in out:
        by_msg.setdefault(r.msg_id, []).append(r)
    assert len(by_msg[1]) == 1 and by_msg[1][0].chunk == "short"
    assert len(by_msg[2]) == by_msg[2][0].n_chunks > 1
    assert all(len(r.chunk) <= 500 for r in by_msg[2])
    idxs = sorted(r.chunk_idx for r in by_msg[2])
    assert idxs == list(range(len(by_msg[2])))


def test_idempotent_epoch_sink_replay_safe(spark, tmp_path):
    from open_pulsar_spark.streaming.sinks import idempotent_epoch_sink

    out = str(tmp_path / "epochs")
    write = idempotent_epoch_sink(out)
    batch = spark.createDataFrame([(1, "a"), (2, "b")], "id LONG, v STRING")
    write(batch, epoch_id=7)
    # replay of the SAME epoch (failure redelivery) — no duplication
    write(batch, epoch_id=7)
    write(spark.createDataFrame([(3, "c")], "id LONG, v STRING"), epoch_id=8)
    rows = sorted((r.id, r.epoch) for r in spark.read.parquet(out).collect())
    assert rows == [(1, 7), (2, 7), (3, 8)]


def test_audit_sink_partitions_by_date_and_truncates(spark, tmp_path):
    out = str(tmp_path / "audit")
    state = spark.createDataFrame(
        [
            (dt.datetime(2024, 3, 1, 12, 0), "completed", "g1", "task a", "r" * 500),
            (dt.datetime(2024, 3, 2, 9, 30), "failed", "g2", "task b", "line1\nline2"),
        ],
        "finished_at TIMESTAMP, status STRING, grp STRING, task STRING, result STRING",
    )
    write_audit(state, out)
    parts = {d for d in os.listdir(out) if d.startswith("log_date=")}
    assert parts == {"log_date=2024-03-01", "log_date=2024-03-02"}
    lines = [r.line for r in spark.read.parquet(out).collect()]
    done = next(l for l in lines if "COMPLETED" in l)
    assert "[2024-03-01 12:00:00] COMPLETED | g1 > task a" in done
    assert len(done.split(" :: ")[1]) == 300          # result truncation
    failed = next(l for l in lines if "FAILED" in l)
    assert "line1 line2" in failed                     # newline flatten


def test_write_with_metrics_observes_in_one_pass(spark, tmp_path):
    """Observation-API sink: the write returns data-quality metrics
    computed during the SAME job (no second scan of the producing
    plan), and the written data matches them."""
    from pyspark.sql import functions as F

    from open_pulsar_spark.streaming.sinks import write_with_metrics

    df = spark.createDataFrame(
        [(1, "a", 0.9), (2, None, 0.5), (3, "c", 0.7)],
        "doc_id LONG, txt STRING, quality DOUBLE",
    )
    out = str(tmp_path / "observed")
    m = write_with_metrics(
        df,
        out,
        {
            "n_rows": F.count(F.lit(1)),
            "null_txt": F.count(F.when(F.col("txt").isNull(), 1)),
            "avg_quality": F.round(F.avg("quality"), 2),
        },
    )
    assert m == {"n_rows": 3, "null_txt": 1, "avg_quality": 0.7}
    assert spark.read.parquet(out).count() == 3
