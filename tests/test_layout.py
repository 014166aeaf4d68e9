"""PDF/layout reading-order operator: margin filtering, column
assignment, multi-page ordering — pure column algebra, fixture-pinned."""

import pytest

from material_parsers_spark.pipeline.layout import (
    parse_layout,
    synthesize_layout_blocks,
)
from material_parsers_spark.pipeline.session import build_session

BLOCK_SCHEMA = ("doc_id bigint, blocks array<struct<page:int, x0:double, "
                "y0:double, text:string>>")


@pytest.fixture(scope="module")
def spark():
    return build_session(app_name="layout-tests", master="local[4]",
                         shuffle_partitions=4)


def _parse_one(spark, blocks):
    df = spark.createDataFrame([(1, blocks)], BLOCK_SCHEMA)
    return parse_layout(df).collect()[0]


def test_two_column_reading_order_beats_naive_y_sort(spark):
    # declared y-interleaved: naive y-sort yields "A C B D"
    blocks = [(1, 50.0, 100.0, "A"), (1, 350.0, 110.0, "C"),
              (1, 50.0, 400.0, "B"), (1, 350.0, 410.0, "D")]
    row = _parse_one(spark, blocks)
    assert row.main_text == "A B C D"
    assert row.kept_blocks == 4 and row.dropped_blocks == 0


def test_headers_and_footers_dropped(spark):
    blocks = [(1, 50.0, 20.0, "HEADER"), (1, 50.0, 300.0, "body"),
              (1, 50.0, 780.0, "FOOTER")]
    row = _parse_one(spark, blocks)
    assert row.main_text == "body"
    assert row.kept_blocks == 1 and row.dropped_blocks == 2


def test_pages_order_before_columns(spark):
    blocks = [(2, 50.0, 100.0, "page2"), (1, 350.0, 100.0, "p1right"),
              (1, 50.0, 100.0, "p1left")]
    row = _parse_one(spark, blocks)
    assert row.main_text == "p1left p1right page2"


def test_ties_break_left_to_right_within_column_band(spark):
    blocks = [(1, 100.0, 100.0, "first"), (1, 60.0, 100.0, "zeroth")]
    row = _parse_one(spark, blocks)
    assert row.main_text == "zeroth first"


def test_synthesized_layout_round_trips_document_text(spark):
    """synthesize -> parse recovers the original word order (the
    column-major quarters concatenate back to the full text)."""
    from pyspark.sql import functions as F

    text = " ".join(f"w{i}" for i in range(23))
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string") \
        .select("doc_id",
                synthesize_layout_blocks(F.col("text")).alias("blocks"))
    row = parse_layout(df).collect()[0]
    assert row.main_text == text
    assert row.kept_blocks == 4 and row.dropped_blocks == 2


def test_plan_is_pure_projection(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, "a b c d e f g h")],
                               "doc_id bigint, text string") \
        .select("doc_id",
                synthesize_layout_blocks(F.col("text")).alias("blocks"))
    plan = parse_layout(df)._jdf.queryExecution().executedPlan().toString()
    for node in ("Exchange", "ArrowEvalPython", "BatchEvalPython"):
        assert node not in plan


def test_bottom_origin_flips_margins_and_order(spark):
    """pdfminer-convention blocks (y grows upward): the header sits at
    y0 near page_height and body order is top-of-page-first only after
    the flip."""
    from pyspark.sql import functions as F
    from material_parsers_spark.pipeline.layout import reading_order_text

    blocks = [(1, 50.0, 770.0, "HEADER"),      # top of page, y near max
              (1, 50.0, 600.0, "first"),       # higher on page
              (1, 50.0, 200.0, "second"),      # lower on page
              (1, 50.0, 20.0, "FOOTER")]
    df = spark.createDataFrame([(1, blocks)], BLOCK_SCHEMA)
    row = df.select(
        reading_order_text(F.col("blocks"), y_origin="bottom")
        .alias("p")).select("p.*").collect()[0]
    assert row.main_text == "first second"
    assert row.dropped_blocks == 2
