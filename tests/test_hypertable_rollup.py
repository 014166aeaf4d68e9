"""hypertable_rollup hierarchy invariants: each coarser level must be
exactly the sum of its children (the continuous-aggregate contract),
the grand total must match the raw table, and cents must be exact."""

import pytest

from material_parsers_spark.pipeline.session import build_session
from material_parsers_spark.queries import SPARK_QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    return build_session(app_name="rollup-tests", master="local[4]",
                         shuffle_partitions=4)


@pytest.fixture(scope="module")
def rows(spark):
    return SPARK_QUERIES["hypertable_rollup"](spark, SF_DIR).collect()


def _level(rows, d, h, t):
    """Select a rollup level by its grouping_id bitmask (1 bit = the
    column was aggregated OUT), never by NULL-ness — a NULL grouping
    value must not be mistaken for a subtotal row."""
    gid = (0 if d else 4) | (0 if h else 2) | (0 if t else 1)
    return [r for r in rows if r.grouping_level == gid]


def test_rollup_levels_are_consistent(rows):
    leaves = _level(rows, True, True, True)
    hours = _level(rows, True, True, False)
    days = _level(rows, True, False, False)
    total = _level(rows, False, False, False)
    assert len(total) == 1
    for level in (leaves, hours, days):
        assert sum(r.n_events for r in level) == total[0].n_events
        assert sum(r.total_value_cents for r in level) \
            == total[0].total_value_cents
    # hour rows aggregate their leaves exactly
    by_hour = {}
    for r in leaves:
        key = (r.day_bucket, r.hour_bucket)
        n, c = by_hour.get(key, (0, 0))
        by_hour[key] = (n + r.n_events, c + r.total_value_cents)
    for r in hours:
        assert by_hour[(r.day_bucket, r.hour_bucket)] \
            == (r.n_events, r.total_value_cents)


def test_grand_total_matches_raw_table(spark, rows):
    from decimal import Decimal

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    total = _level(rows, False, False, False)[0]
    assert total.n_events == ev.count()
    # Decimal over the printed value, not Python round(v*100): the
    # engines round HALF_UP, Python half-even (review lesson) — the
    # 2-decimal values make both agree, but Decimal states the intent
    cents = sum(int(Decimal(str(r.value)) * 100)
                for r in ev.select("value").collect())
    assert total.total_value_cents == cents


def test_hour_buckets_nest_inside_day_buckets(rows):
    for r in _level(rows, True, True, True):
        assert r.hour_bucket // 24 == r.day_bucket


def test_rollup_emits_only_hierarchy_levels(rows):
    """ROLLUP (not CUBE): exactly the 4 prefix levels exist, and the
    grouping bitmask always matches the columns' NULL pattern on this
    NULL-free corpus."""
    assert {r.grouping_level for r in rows} == {0, 1, 3, 7}
    for r in rows:
        assert (r.event_type is None) == bool(r.grouping_level & 1)
        assert (r.hour_bucket is None) == bool(r.grouping_level & 2)
        assert (r.day_bucket is None) == bool(r.grouping_level & 4)
