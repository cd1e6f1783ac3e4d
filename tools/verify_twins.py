"""Twins replica — bit-match every clean streaming-twin readout
against its batch anchor query at an arbitrary scale point.

The registry replica (tools/verify_oracle.py) is the hard gate for
the 325 batch queries, but streaming READOUTS are not registered
queries: their parity proof otherwise lives only in pytest at
sf0.001. This tool re-runs the fold-parity contract — deliver the
twin's input frame in three epochs (deterministic xxhash64 row
split, so every ledger grain accumulates ACROSS epochs), read out,
and compare row-for-row against the batch anchor query on the same
sf_dir — at whatever scale the caller picks:

    python tools/verify_twins.py                      # sf0.01
    python tools/verify_twins.py /root/testdata/sf0.1
    python tools/verify_twins.py /root/testdata/sf0.01 mk anova

Covered: the 35 full-row readouts across 26 twins (monitoring
ledgers, privacy audits, sketch estimates with their documented
column projections), plus the special-contract twins — psi (frozen
mid-split baseline), dq (direct-count parity on every stream rule +
shared-rule match with dq_violation_counts), posting (anchor rows
verbatim-contained in the maintained index), and novelty (ascending
doc_id tercile epochs — the contract is order-dependent). Out of
scope, pytest-covered: zonemap (bucket-frame compare), bloom (filter
bitsets), chunk (no registered anchor), lww (time-travel over
hand-built CDC epochs).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _events(spark, sf):
    from open_pulsar_spark.tables import load_table

    return load_table(spark, sf, "events")


def _orders(spark, sf):
    from open_pulsar_spark.tables import load_table

    return load_table(spark, sf, "orders")


def _customer(spark, sf):
    from open_pulsar_spark.tables import load_table

    return load_table(spark, sf, "customer")


def _documents(spark, sf):
    from open_pulsar_spark.tables import load_table

    return load_table(spark, sf, "documents")


def _order_spans(spark, sf):
    from open_pulsar_spark.operators.analytics import order_spans

    return order_spans(spark, sf)


def _trade_lines(spark, sf):
    from open_pulsar_spark.operators.analytics import attributed_trade_lines

    return attributed_trade_lines(spark, sf)


def _weekly_lines(spark, sf):
    from open_pulsar_spark.operators.analytics import attributed_order_cents

    return attributed_order_cents(spark, sf)


def _monthly_lines(spark, sf):
    from open_pulsar_spark.operators.analytics import (
        attributed_order_month_cents,
    )

    return attributed_order_month_cents(spark, sf)


def _quantile_anchor(df):
    return df.select("p", "est").orderBy("p")


def _kmv_anchor(df):
    return df.select("source", "n_est").orderBy("source")


def _hll_anchor(df):
    return df.select("event_type", "hll_keys").orderBy("event_type")


# twin -> (module, update fn, frame fn, [(readout fn, anchor query,
# anchor transform | None)])
SPECS = {
    "cusum": ("cusum_stream", "update_cusum", _orders, [
        ("cusum_readout", "revenue_cusum_changepoint", None),
        ("acf_readout", "revenue_acf", None),
        ("ewma_readout", "revenue_ewma", None),
        ("bootstrap_readout", "revenue_bootstrap_ci", None),
        ("holt_readout", "revenue_holt_forecast", None),
    ]),
    "benford": ("benford_stream", "update_benford", _orders, [
        ("benford_readout", "orders_benford_test", None),
    ]),
    "anova": ("anova_stream", "update_anova", _orders, [
        ("anova_readout", "revenue_dow_anova", None),
    ]),
    "scd2": ("scd2_stream", "update_scd2", _orders, [
        ("scd2_readout", "order_history_scd2", None),
    ]),
    "hll": ("hll_stream", "update_hll", _events, [
        ("hll_estimates", "events_hll_distinct", _hll_anchor),
    ]),
    "itemsets": ("itemsets_stream", "update_itemsets", _events, [
        ("itemset_readout", "event_type_itemsets", None),
    ]),
    "sequences": ("sequences_stream", "update_sequences", _events, [
        ("sequence_readout", "event_type_sequences", None),
    ]),
    "quantile": ("quantile_stream", "update_quantile", _events, [
        ("quantile_readout", "value_quantile_sketch", _quantile_anchor),
    ]),
    "stats": ("stats_stream", "update_stats", _events, [
        ("stats_readout", "join_size_estimate", None),
        ("partition_plan_readout", "events_partition_plan", None),
    ]),
    "sequential": ("sequential_stream", "update_experiment", _events, [
        ("monitor_readout", "ab_test_sequential", None),
    ]),
    "active": ("active_stream", "update_active", _events, [
        ("dau_readout", "events_dau_wau_mau", None),
        ("growth_readout", "user_growth_accounting", None),
    ]),
    "pchart": ("pchart_stream", "update_pchart", _events, [
        ("pchart_readout", "error_rate_pchart", None),
    ]),
    "fano": ("fano_stream", "update_fano", _events, [
        ("fano_readout", "events_hourly_fano", None),
        ("mix_readout", "weekday_weekend_mix", None),
    ]),
    "risk": ("risk_stream", "update_risk", _events, [
        ("risk_readout", "purchase_value_tail_risk", None),
    ]),
    "lag": ("lag_stream", "update_lag", _events, [
        ("lag_readout", "conversion_lag_quantiles", None),
    ]),
    "kanon": ("kanon_stream", "update_kanon", _customer, [
        ("kanon_readout", "customer_kanonymity_audit", None),
    ]),
    "ldiv": ("kanon_stream", "update_ldiv", _customer, [
        ("ldiv_readout", "customer_ldiversity_audit", None),
    ]),
    "kmv": ("kmv_stream", "update_kmv", _documents, [
        ("kmv_estimates", "source_kmv_distinct", _kmv_anchor),
    ]),
    "vocab": ("vocab_stream", "update_vocab", _documents, [
        ("zipf_readout", "corpus_zipf_fit", None),
    ]),
    "winnow": ("winnow_stream", "update_winnow_index", _documents, [
        ("overlap_pairs_readout", "winnowing_overlap_pairs", None),
    ]),
    "bm25": ("bm25_stream", "update_bm25", _documents, [
        ("bm25_readout", "bm25_topk", None),
    ]),
    "ks": ("ks_stream", "update_ks", _documents, [
        ("ks_readout", "source_length_ks_matrix", None),
    ]),
    "backlog": ("backlog_stream", "update_backlog", _order_spans, [
        ("backlog_readout", "orders_backlog_depth", None),
    ]),
    "trade": ("trade_stream", "update_trade", _trade_lines, [
        ("trade_readout", "nation_trade_matrix", None),
    ]),
    "mk": ("mk_stream", "update_mk", _weekly_lines, [
        ("mk_readout", "segment_revenue_mann_kendall", None),
    ]),
    "trend": ("trend_stream", "update_trend", _monthly_lines, [
        ("trend_readout", "segment_revenue_trend", None),
        ("theilsen_readout", "segment_revenue_theilsen", None),
    ]),
}

N_EPOCHS = 3


def _rows(df):
    return sorted(map(repr, (tuple(r) for r in df.collect())))


def _fold(spark, update, frame, store):
    """Deliver the frame in N_EPOCHS deterministic xxhash64 row
    splits, so every ledger grain (day, week, term, QI class, ...)
    accumulates ACROSS epochs — the property the fold must get right."""
    tagged = frame.withColumn(
        "_ep", F.abs(F.xxhash64(*frame.columns)) % N_EPOCHS
    )
    for k in range(N_EPOCHS):
        update(spark, tagged.where(F.col("_ep") == k).drop("_ep"), store, k)


def run_psi(spark, sf_dir, workdir):
    """psi is the one non-uniform spec: the batch events_value_psi
    self-baselines on the mid-timestamp split, so the twin freezes
    the first half and folds the second."""
    from open_pulsar_spark.registry import all_queries
    from open_pulsar_spark.streaming.psi_stream import (
        freeze_baseline,
        psi_readout,
        update_psi,
    )

    ev = _events(spark, sf_dir).select("ts", "value")
    piv = ev.agg(
        F.expr("(unix_micros(min(ts)) + unix_micros(max(ts))) div 2")
    ).first()[0]
    baseline = f"{workdir}/psi_baseline"
    store = f"{workdir}/psi_store"
    freeze_baseline(spark, ev.where(F.expr(f"unix_micros(ts) < {piv}")), baseline)
    _fold(
        spark, update_psi, ev.where(F.expr(f"unix_micros(ts) >= {piv}")), store
    )
    got = _rows(psi_readout(spark, baseline, store))
    want = _rows(all_queries()["events_value_psi"](spark, sf_dir))
    return got == want and bool(want), len(want)


def run_dq(spark, sf_dir, workdir):
    """dq's contract is two-part: the folded ledger equals direct
    conditional counts over the whole table for EVERY stream rule,
    and the rules shared with the batch suite match
    dq_violation_counts' documents rows."""
    from open_pulsar_spark.registry import all_queries
    from open_pulsar_spark.streaming.dq_stream import (
        DQ_STREAM_RULES,
        read_dq,
        update_dq,
    )

    docs = _documents(spark, sf_dir)
    store = f"{workdir}/dq_store"
    _fold(spark, update_dq, docs, store)
    got = {t[0]: (t[1], t[2]) for t in map(tuple, read_dq(spark, store).collect())}
    n_docs = docs.count()
    want = {
        name: (docs.where(F.expr(pred)).count(), n_docs)
        for name, pred in DQ_STREAM_RULES
    }
    ok = got == want and bool(want)
    batch = {
        r.rule: (r.n_violations, r.n_checked)
        for r in all_queries()["dq_violation_counts"](spark, sf_dir).collect()
        if r.rule.startswith("documents_")
    }
    for shared in ("documents_short_text", "documents_nchars_mismatch"):
        ok = ok and got.get(shared) == batch.get(shared)
    return ok, len(want)


def run_posting(spark, sf_dir, workdir):
    """posting's contract: the stream store maintains ALL terms; the
    batch term_posting_index emits a subset — every anchor
    (term, posting_sample) row must appear VERBATIM in the fold."""
    from open_pulsar_spark.registry import all_queries
    from open_pulsar_spark.streaming.posting_stream import (
        read_postings,
        update_postings,
    )

    docs = _documents(spark, sf_dir)
    store = f"{workdir}/posting_store"
    _fold(spark, update_postings, docs, store)
    merged = {
        (r.term, r.posting_sample)
        for r in read_postings(spark, store).collect()
    }
    want = {
        (r.term, r.posting_sample)
        for r in all_queries()["term_posting_index"](spark, sf_dir)
        .select("term", "posting_sample")
        .collect()
    }
    return bool(want) and want <= merged, len(want)


def run_novelty(spark, sf_dir, workdir):
    """novelty's contract is ORDER-dependent (first-seen shingle
    ownership = corpus-order min doc_id), so the epochs are ascending
    doc_id terciles, not hash splits; the union of the per-epoch
    outputs must equal doc_ngram_novelty over the whole corpus."""
    from open_pulsar_spark.registry import all_queries
    from open_pulsar_spark.streaming.novelty_stream import novelty_batch_step

    docs = _documents(spark, sf_dir).select("doc_id", "text")
    lo, hi = docs.selectExpr(
        "percentile(doc_id, 0.34)", "percentile(doc_id, 0.67)"
    ).first()
    index, out = f"{workdir}/novelty_index", f"{workdir}/novelty_out"
    got = []
    for k, pred in enumerate(
        (
            F.col("doc_id") <= lo,
            (F.col("doc_id") > lo) & (F.col("doc_id") <= hi),
            F.col("doc_id") > hi,
        )
    ):
        step = novelty_batch_step(spark, docs.where(pred), index, out, k)
        got += [
            (r.doc_id, r.n_shingles, r.n_novel, r.novelty)
            for r in step.collect()
        ]
    want = sorted(
        (r.doc_id, r.n_shingles, r.n_novel, r.novelty)
        for r in all_queries()["doc_ngram_novelty"](spark, sf_dir).collect()
    )
    return bool(want) and sorted(got) == want, len(want)


_SPECIAL = {
    "psi": (run_psi, "psi_readout vs events_value_psi"),
    "dq": (run_dq, "read_dq vs direct counts + dq_violation_counts"),
    "posting": (run_posting, "read_postings ⊇ term_posting_index"),
    "novelty": (run_novelty, "ordered epochs vs doc_ngram_novelty"),
}


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = set(a for a in args if "/" not in a)

    import importlib

    from pyspark.sql import SparkSession

    from open_pulsar_spark.registry import all_queries

    spark = (
        SparkSession.builder.appName("verify-twins")
        .master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    failures = 0
    workdir = tempfile.mkdtemp(prefix="verify_twins_")

    for twin, (mod_name, upd_name, frame_fn, readouts) in sorted(SPECS.items()):
        if only and twin not in only:
            continue
        t0 = time.time()
        try:
            mod = importlib.import_module(
                f"open_pulsar_spark.streaming.{mod_name}"
            )
            update = getattr(mod, upd_name)
            store = f"{workdir}/{twin}"
            _fold(spark, update, frame_fn(spark, sf_dir), store)
            for ro_name, anchor, transform in readouts:
                got = _rows(getattr(mod, ro_name)(spark, store))
                adf = qs[anchor](spark, sf_dir)
                want = _rows(transform(adf) if transform else adf)
                ok = got == want and bool(want)
                failures += 0 if ok else 1
                print(
                    f"{'PASS' if ok else 'FAIL'} {twin}.{ro_name} vs {anchor}"
                    f" rows={len(want)} sec={time.time() - t0:.2f}"
                )
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"FAIL {twin} ERROR {str(e)[:300]}")

    for twin, (runner, label) in sorted(_SPECIAL.items()):
        if only and twin not in only:
            continue
        t0 = time.time()
        try:
            ok, n = runner(spark, sf_dir, workdir)
            failures += 0 if ok else 1
            print(
                f"{'PASS' if ok else 'FAIL'} {twin}: {label}"
                f" rows={n} sec={time.time() - t0:.2f}"
            )
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"FAIL {twin} ERROR {str(e)[:300]}")

    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
