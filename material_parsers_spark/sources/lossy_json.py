"""S2ORC LossyJSON reader (S11, SURVEY.md §2.1).

Re-expresses `converters/misc/lossyJSON2text.py:10-36` Spark-first: the
gzip-JSONL corpus is read with `spark.read.json` (gzip is transparent), and
the section extraction — abstract + body paragraphs, split on
``sentence_spans`` when present, paragraphs of <= 2 chars dropped — is pure
column algebra over the nested arrays (no Python in the path).

Documented edge-case divergences from the reference converter:
- a paragraph whose ``sentence_spans`` is present but EMPTY falls through
  to the whole-paragraph branch here; the reference iterates the empty
  list and emits nothing (drops the paragraph);
- the reference's body_text sentence_spans branch crashes on its own
  input shape (``paragraph['end']`` indexing into a str); this reader
  treats body and abstract paragraphs uniformly instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

S2ORC_SCHEMA = T.StructType([
    T.StructField("paper_id", T.StringType(), True),
    T.StructField("abstract", T.ArrayType(T.StructType([
        T.StructField("text", T.StringType(), True),
        T.StructField("sentence_spans", T.ArrayType(T.StructType([
            T.StructField("start", T.IntegerType(), True),
            T.StructField("end", T.IntegerType(), True),
        ])), True),
    ])), True),
    T.StructField("body_text", T.ArrayType(T.StructType([
        T.StructField("text", T.StringType(), True),
        T.StructField("sentence_spans", T.ArrayType(T.StructType([
            T.StructField("start", T.IntegerType(), True),
            T.StructField("end", T.IntegerType(), True),
        ])), True),
    ])), True),
])


def _sections(column: str) -> F.Column:
    """One array of section strings per paragraph entry, mirroring the
    reference's per-paragraph behavior: strip, drop <= 2 chars, split on
    sentence_spans when present."""
    para = F.col("para")
    stripped = F.trim(para.getField("text"))
    spans = para.getField("sentence_spans")
    by_sentence = F.transform(
        spans,
        lambda s: F.substring(
            stripped, s.getField("start") + 1,
            s.getField("end") - s.getField("start")),
    )
    return F.when(F.length(stripped) <= 2, F.array()) \
        .when(spans.isNotNull() & (F.size(spans) > 0), by_sentence) \
        .otherwise(F.array(stripped))


def read_sections(spark: SparkSession, path: str) -> DataFrame:
    """(paper_id, section_idx, section) rows from a LossyJSON corpus."""
    raw = spark.read.schema(S2ORC_SCHEMA).json(path)
    paragraphs = raw.select(
        "paper_id",
        F.explode_outer(
            F.concat(
                F.coalesce("abstract", F.array()),
                F.coalesce("body_text", F.array()),
            )
        ).alias("para"),
    ).where(F.col("para").isNotNull())
    sections = paragraphs.select(
        "paper_id", F.explode(_sections("para")).alias("section"))
    window = Window.partitionBy("paper_id") \
        .orderBy(F.monotonically_increasing_id())
    return (
        sections.where(F.length("section") > 0)
        .withColumn("section_idx", F.row_number().over(window) - 1)
        .select("paper_id", "section_idx", "section")
    )
