"""PDF/layout text-block parsing (north rule: "parse PDF/layout text
blocks per turn").

The layout model is the standard PDF-extraction shape: a document is an
array of positioned text blocks ``(page, x0, y0, text)`` (what pdfminer/
MuPDF emit after decoding — the decode itself is a codec concern, like
the multimodal stubs; NOTE the two emit different y conventions:
MuPDF/fitz top-left origin vs pdfminer bottom-left — declare which via
``y_origin``). This module turns that block array into
reading-ordered main text ENTIRELY JVM-side: margin blocks (running
headers/footers) are dropped by y-position, blocks are assigned to
columns by x-midpoint, and ordering is one ``array_sort`` over
``struct(page, column, y0, x0)`` — lexicographic struct comparison IS
the reading order, so the whole operator is a single whole-stage-codegen
projection per row. No UDF, no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# block array element type (what a decoder stage yields per document)
LAYOUT_BLOCKS_TYPE = (
    "array<struct<page:int, x0:double, y0:double, text:string>>"
)

PAGE_WIDTH = 612.0      # US-Letter points; override per corpus
PAGE_HEIGHT = 792.0
HEADER_MARGIN = 0.08    # top fraction treated as running header
FOOTER_MARGIN = 0.92    # bottom fraction treated as running footer


def reading_order_text(blocks: Column,
                       page_width: float = PAGE_WIDTH,
                       page_height: float = PAGE_HEIGHT,
                       header_margin: float = HEADER_MARGIN,
                       footer_margin: float = FOOTER_MARGIN,
                       y_origin: str = "top") -> Column:
    """Column expression: block array -> (main_text, kept, dropped).

    Reading order = page, then column (x-midpoint split), then top-to-
    bottom, then left-to-right — the two-column academic-paper layout
    rule. Margin blocks are dropped before ordering.

    ``y_origin`` declares the coordinate convention of the decoder that
    produced the blocks: ``"top"`` (y grows downward — MuPDF/fitz,
    browsers, this module's synthetic generator) or ``"bottom"`` (y
    grows upward from the page bottom — pdfminer/PDF user space). With
    ``"bottom"`` the y axis is flipped once up front so margin
    classification and top-to-bottom ordering are correct for raw
    pdfminer output instead of silently reversed.
    """
    if y_origin not in ("top", "bottom"):
        raise ValueError(f"y_origin must be 'top' or 'bottom': {y_origin!r}")

    def y_down(b):
        y = b.getField("y0")
        return F.lit(page_height) - y if y_origin == "bottom" else y

    body = F.filter(
        blocks,
        lambda b: (y_down(b) > page_height * header_margin)
        & (y_down(b) < page_height * footer_margin),
    )
    keyed = F.transform(
        body,
        lambda b: F.struct(
            b.getField("page").alias("page"),
            F.when(b.getField("x0") >= page_width / 2, 1).otherwise(0)
            .alias("column"),
            y_down(b).alias("y0"),
            b.getField("x0").alias("x0"),
            b.getField("text").alias("text"),
        ),
    )
    ordered = F.array_sort(keyed)  # lexicographic struct order
    return F.struct(
        F.concat_ws(
            " ", F.transform(ordered, lambda b: b.getField("text")))
        .alias("main_text"),
        F.size(body).cast("long").alias("kept_blocks"),
        (F.size(blocks) - F.size(body)).cast("long").alias("dropped_blocks"),
    )


def parse_layout(df: DataFrame, blocks_col: str = "blocks",
                 **kwargs) -> DataFrame:
    """Append ``main_text`` / ``kept_blocks`` / ``dropped_blocks`` from a
    layout-block array column."""
    parsed = reading_order_text(F.col(blocks_col), **kwargs)
    return (
        df.withColumn("_parsed", parsed)
        .withColumn("main_text", F.col("_parsed.main_text"))
        .withColumn("kept_blocks", F.col("_parsed.kept_blocks"))
        .withColumn("dropped_blocks", F.col("_parsed.dropped_blocks"))
        .drop("_parsed")
    )


def synthesize_layout_blocks(text: Column) -> Column:
    """Deterministic two-column page layout for a document's text (pure
    column algebra, both engines can reproduce it): a running header and
    footer plus four body blocks — the text's words split into quarters,
    laid out column-major (quarters 1,2 in the left column, 3,4 in the
    right) but DECLARED in an order that a naive y-sort would interleave
    wrong, so reading-order reconstruction is actually exercised."""
    words = F.split(text, " ")
    n = F.size(words)
    quarter = (n / 4).cast("int")

    def chunk(start: Column, length: Column) -> Column:
        return F.concat_ws(" ", F.slice(words, start, length))

    left_1 = chunk(F.lit(1), quarter)
    left_2 = chunk(quarter + 1, quarter)
    right_1 = chunk(2 * quarter + 1, quarter)
    right_2 = chunk(3 * quarter + 1, n - 3 * quarter)

    def block(page, x0, y0, text_col):
        return F.struct(
            F.lit(page).cast("int").alias("page"),
            F.lit(x0).cast("double").alias("x0"),
            F.lit(y0).cast("double").alias("y0"),
            text_col.alias("text"),
        )

    # declared y-interleaved across columns on purpose
    return F.array(
        block(1, 50.0, 30.0, F.lit("Running header")),
        block(1, 50.0, 120.0, left_1),
        block(1, 330.0, 140.0, right_1),
        block(1, 50.0, 420.0, left_2),
        block(1, 330.0, 440.0, right_2),
        block(1, 50.0, 760.0, F.lit("Page 1 footer")),
    )
