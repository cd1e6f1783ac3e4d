"""operators/prefix.py::global_prefix — the shared distributed prefix
rank/sum must be BIT-IDENTICAL to the single-window statement it
replaces, for any data and any partition count. Property-based: the
claim is partition-invariance over a total order, so that is what gets
generated and checked."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from open_pulsar_spark.operators.prefix import global_prefix


def _expected(rows: list[tuple[int, int, int]]):
    """Driver-side ground truth: rank + running sum over (k, rid)."""
    out = {}
    cum = 0
    for rk, (k, rid, d) in enumerate(
        sorted(rows, key=lambda t: (t[0], t[1])), start=1
    ):
        cum += d
        out[rid] = (rk, cum)
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.integers(-50, 50), st.integers(-1000, 1000)),
        min_size=1,
        max_size=60,
    ),
    st.sampled_from([2, 5, 32]),
)
def test_global_prefix_matches_single_window(spark, kd_rows, parts):
    rows = [(k, rid, d) for rid, (k, d) in enumerate(kd_rows)]
    df = spark.createDataFrame(rows, "k LONG, rid LONG, d LONG")
    aug, totals, release = global_prefix(
        spark, df, ["k", "rid"], cum_cols=("d",), parts=parts
    )
    got = {r.rid: (r.rk, r.cum_d) for r in aug.collect()}
    release()
    assert totals["n"] == len(rows)
    assert totals["d"] == sum(d for _, _, d in rows)
    assert got == _expected(rows)


def test_global_prefix_rejects_n_cum_col(spark):
    import pytest

    df = spark.createDataFrame([(1, 2)], "k LONG, n LONG")
    with pytest.raises(ValueError):
        global_prefix(spark, df, ["k"], cum_cols=("n",))
