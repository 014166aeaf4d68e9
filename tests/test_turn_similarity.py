"""adjacent_turn_similarity semantics on planted turns: Jaccard math,
the strict integer boundary threshold, NULL on wordless pairs, and
per-conversation isolation — all through the operator's own core
(adjacent_turn_similarity_frame), never a re-implementation."""

import pytest

from material_parsers_spark.pipeline.session import build_session
from material_parsers_spark.queries import (
    SPARK_QUERIES,
    adjacent_turn_similarity_frame,
)


@pytest.fixture(scope="module")
def spark():
    return build_session(app_name="turnsim-tests", master="local[4]",
                         shuffle_partitions=4)


def _sim(spark, rows):
    turns = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string")
    return {(r.conv_id, r.turn_idx): r for r in
            adjacent_turn_similarity_frame(turns).collect()}


ROWS = [
    ("c1", 0, "user", "alpha beta gamma"),
    ("c1", 1, "assistant", "alpha beta gamma"),       # identical
    ("c1", 2, "user", "delta epsilon"),               # disjoint
    ("c1", 3, "assistant", "delta zeta"),             # 1 of 3 shared
    ("c2", 0, "user", "omega"),
    ("c2", 1, "assistant", "omega"),                  # new conv
]


def test_jaccard_values_and_boundaries(spark):
    out = _sim(spark, ROWS)
    assert out[("c1", 1)].jaccard == 1.0
    assert not out[("c1", 1)].is_boundary
    assert out[("c1", 2)].jaccard == 0.0
    assert out[("c1", 2)].is_boundary
    r3 = out[("c1", 3)]
    assert (r3.n_shared, r3.n_union) == (1, 3)
    assert r3.jaccard == round(1 / 3, 6)
    assert not r3.is_boundary


def test_threshold_is_strict_at_exactly_point_one(spark):
    rows = [("c1", 0, "user", "a b c d e f g h i j"),
            ("c1", 1, "user", "a k l m n o p q r s")]
    r = _sim(spark, rows)[("c1", 1)]
    assert (r.n_shared, r.n_union) == (1, 19)
    assert r.is_boundary                       # 10*1 < 19
    # shared=1, union=10 -> jaccard exactly 0.1: 10 < 10 is FALSE,
    # so 0.1 itself is NOT a boundary (strict <)
    rows2 = [("c1", 0, "user", "a b c d e"),
             ("c1", 1, "user", "a f g h i j")]
    r2 = _sim(spark, rows2)[("c1", 1)]
    assert (r2.n_shared, r2.n_union) == (1, 10)
    assert r2.jaccard == 0.1 and not r2.is_boundary


def test_wordless_pairs_report_null_similarity(spark):
    rows = [("c1", 0, "user", ""), ("c1", 1, "user", "")]
    r = _sim(spark, rows)[("c1", 1)]
    assert (r.n_shared, r.n_union) == (0, 0)
    assert r.jaccard is None and not r.is_boundary


def test_conversations_are_isolated(spark):
    out = _sim(spark, ROWS)
    assert ("c2", 0) not in out                # no predecessor
    assert out[("c2", 1)].jaccard == 1.0


def test_registered_query_runs_on_corpus(spark):
    rows = SPARK_QUERIES["adjacent_turn_similarity"](
        spark, "/root/testdata/sf0.001").collect()
    assert rows and any(r.is_boundary for r in rows) \
        and any(not r.is_boundary for r in rows)
