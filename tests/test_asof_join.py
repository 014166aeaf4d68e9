"""asof_join_backward semantics on hand-built frames: most-recent-wins,
at-or-before tie matching, NULLs when nothing precedes, per-key
isolation. The registered event_attribution_asof query is additionally
verified against DuckDB's NATIVE ASOF JOIN by the oracle gate."""

import pytest

from material_parsers_spark.pipeline.session import build_session
from material_parsers_spark.queries import SPARK_QUERIES, asof_join_backward


@pytest.fixture(scope="module")
def spark():
    return build_session(app_name="asof-tests", master="local[4]",
                         shuffle_partitions=4)


def _frames(spark):
    left = spark.createDataFrame(
        [("u1", 10, "p1"), ("u1", 5, "p2"), ("u1", 2, "p3"),
         ("u2", 10, "p4")],
        "k string, t long, purchase string")
    right = spark.createDataFrame(
        [("u1", 3, "c-early"), ("u1", 5, "c-tie"), ("u1", 7, "c-late"),
         ("u3", 1, "c-other-key")],
        "k string, t long, click string")
    return left, right


def test_most_recent_at_or_before_wins(spark):
    left, right = _frames(spark)
    out = {r.purchase: r for r in asof_join_backward(
        left, right, key="k", ts="t").collect()}
    assert out["p1"].click == "c-late"        # 7 <= 10, latest
    assert out["p1"].t_matched == 7
    assert out["p2"].click == "c-tie"         # equal ts matches
    assert out["p2"].t_matched == 5


def test_nothing_precedes_yields_nulls(spark):
    left, right = _frames(spark)
    out = {r.purchase: r for r in asof_join_backward(
        left, right, key="k", ts="t").collect()}
    assert out["p3"].click is None and out["p3"].t_matched is None


def test_keys_do_not_leak(spark):
    left, right = _frames(spark)
    out = {r.purchase: r for r in asof_join_backward(
        left, right, key="k", ts="t").collect()}
    # u2 has no clicks at all; u3's click must not cross keys
    assert out["p4"].click is None
    # every left row survives (LEFT semantics)
    assert len(out) == 4


def test_left_rows_never_serve_as_match_payload(spark):
    """An earlier LEFT row between the match and the probe must be
    skipped by the ignorenulls carry, not returned as a match."""
    left = spark.createDataFrame(
        [("u1", 4, "p-mid"), ("u1", 8, "p-late")],
        "k string, t long, purchase string")
    right = spark.createDataFrame(
        [("u1", 2, "c1")], "k string, t long, click string")
    out = {r.purchase: r for r in asof_join_backward(
        left, right, key="k", ts="t").collect()}
    assert out["p-late"].click == "c1" and out["p-late"].t_matched == 2


def test_attribution_query_gap_is_nonnegative(spark):
    rows = SPARK_QUERIES["event_attribution_asof"](
        spark, "/root/testdata/sf0.001").collect()
    matched = [r for r in rows if r.click_id is not None]
    unmatched = [r for r in rows if r.click_id is None]
    assert matched and unmatched            # both sides non-vacuous
    assert all(r.gap_us >= 0 for r in matched)
    assert all(r.ts_us_matched <= r.ts_us for r in matched)
    assert all(r.gap_us is None for r in unmatched)
