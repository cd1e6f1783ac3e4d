"""Table catalog: nanos-timestamp events load on a session without the
legacy conf pre-set (the driver scenario), schema sanity."""

from __future__ import annotations

import pytest

from open_pulsar_spark.tables import TABLE_NAMES, load_table
from tests.conftest import SF_SMALL


def test_events_ts_is_usable_timestamp(spark):
    ev = load_table(spark, SF_SMALL, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    r = ev.orderBy("event_id").first()
    assert r.ts.year == 2024


def test_all_tables_load(spark):
    for name in TABLE_NAMES:
        assert load_table(spark, SF_SMALL, name).count() > 0


def test_unknown_table_rejected(spark):
    with pytest.raises(KeyError):
        load_table(spark, SF_SMALL, "nope")
