"""range_join_bucketed semantics on hand-built frames: inclusive band
edges, cross-bucket matches (the case the bucket expansion exists for),
no invented pairs, and the proximity query's LEFT/zero-count contract.
The registered query is verified against DuckDB's plain band theta-join
by the oracle gate."""

import pytest

from material_parsers_spark.pipeline.session import build_session
from material_parsers_spark.queries import (
    SPARK_QUERIES,
    range_join_bucketed,
)

W = 100   # test window


@pytest.fixture(scope="module")
def spark():
    return build_session(app_name="range-join-tests", master="local[4]",
                         shuffle_partitions=4)


def _pairs(spark, lefts, rights):
    left = spark.createDataFrame(
        [(i, t) for i, t in enumerate(lefts)], "lid long, lt long")
    right = spark.createDataFrame(
        [(i, t) for i, t in enumerate(rights)], "rid long, rt long")
    out = range_join_bucketed(left, right, "lt", "rt", W)
    return {(r.lid, r.rid) for r in out.collect()}


def test_band_edges_are_inclusive_and_tight(spark):
    got = _pairs(spark, lefts=[1000], rights=[900, 1100, 899, 1101])
    assert got == {(0, 0), (0, 1)}   # exactly ±W in; ±(W+1) out


def test_matches_cross_bucket_boundaries(spark):
    # left at 199 (bucket 1), right at 101 (bucket 1) and 299 (bucket
    # 2): both within W=100 — the adjacent-bucket expansion must find
    # the second; 310 is out of band even though bucket-adjacent
    got = _pairs(spark, lefts=[199], rights=[101, 299, 310])
    assert got == {(0, 0), (0, 1)}


def test_no_pairs_invented_across_distant_buckets(spark):
    got = _pairs(spark, lefts=[0, 1000], rights=[5000])
    assert got == set()


def test_all_true_pairs_survive_dense_cluster(spark):
    """Brute-force differential on a dense cluster straddling several
    bucket edges."""
    lefts = list(range(50, 450, 37))
    rights = list(range(60, 460, 53))
    expected = {(i, j) for i, lt in enumerate(lefts)
                for j, rt in enumerate(rights) if abs(lt - rt) <= W}
    assert _pairs(spark, lefts, rights) == expected


def test_proximity_query_keeps_zero_count_rows(spark):
    rows = SPARK_QUERIES["range_join_error_proximity"](
        spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 1000                 # one row per event
    zeros = [r for r in rows if r.n_nearby_errors == 0]
    hits = [r for r in rows if r.n_nearby_errors > 0]
    assert zeros and hits                    # both sides non-vacuous
