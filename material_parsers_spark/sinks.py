"""Batch sinks (S8-S10, SURVEY.md §2.1).

The reference's converter scripts write CoNLL/TSV/JSONL/CSV one file at a
time (`converters/misc/*.py`); here each is a distributed `df.write` over
the extraction output. TEI/WebAnno round-trip converters (S6, S12, S13) are
training-data tooling and documented out of scope (SURVEY.md §2.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_label_rows(extracted: DataFrame) -> DataFrame:
    """Flatten extraction output to one row per token with its BIO label —
    the CoNLL shape (S8). Tokens inside a span get B-/I- prefixes."""
    tokens = extracted.select(
        "conv_id", "turn_idx",
        F.posexplode("extraction.tokens").alias("token_pos", "token"),
    ).alias("tok")
    spans = extracted.select(
        F.col("conv_id").alias("s_conv_id"),
        F.col("turn_idx").alias("s_turn_idx"),
        F.explode("extraction.spans").alias("span"),
    ).select(
        "s_conv_id", "s_turn_idx",
        F.col("span.type").alias("span_type"),
        F.col("span.token_start").alias("token_start"),
        F.col("span.token_end").alias("token_end"),
    ).alias("sp")
    # the span-range predicate must live in the JOIN condition: a token
    # outside every span still needs its (null-span -> "O") row
    joined = tokens.join(
        spans,
        (F.col("tok.conv_id") == F.col("sp.s_conv_id"))
        & (F.col("tok.turn_idx") == F.col("sp.s_turn_idx"))
        & (F.col("token_pos") >= F.col("token_start"))
        & (F.col("token_pos") < F.col("token_end")),
        "left",
    ).drop("s_conv_id", "s_turn_idx")
    label = F.when(
        F.col("token_start").isNull(), F.lit("O")
    ).when(
        F.col("token_pos") == F.col("token_start"),
        F.concat(F.lit("B-"), F.col("span_type")),
    ).otherwise(F.concat(F.lit("I-"), F.col("span_type")))
    deduped = (
        joined
        .withColumn("label", label)
        .groupBy("conv_id", "turn_idx", "token_pos")
        .agg(F.first("token").alias("token"),
             F.min("label").alias("label"))
    )
    return deduped.select(
        "conv_id", "turn_idx", "token_pos",
        F.col("token.text").alias("token_text"), "label")


def write_conll(extracted: DataFrame, path: str) -> None:
    """S8: tab-separated token/label rows."""
    (token_label_rows(extracted)
     .where(~F.col("token_text").rlike(r"^\s$"))
     .orderBy("conv_id", "turn_idx", "token_pos")
     .select("token_text", "label")
     .write.mode("overwrite").option("sep", "\t").csv(path))


def write_jsonl(extracted: DataFrame, path: str) -> None:
    """S9: one JSON object per turn (text + spans + materials)."""
    (extracted.select(
        "conv_id", "turn_idx",
        F.col("extraction.spans").alias("spans"),
        F.col("extraction.materials").alias("materials"))
     .write.mode("overwrite").json(path))


def write_span_csv(extracted: DataFrame, path: str) -> None:
    """S10: flat CSV of spans (the supercon-extraction CSV shape)."""
    (extracted.select(
        "conv_id", "turn_idx", F.explode("extraction.spans").alias("span"))
     .select("conv_id", "turn_idx",
             F.col("span.text").alias("span_text"),
             F.col("span.type").alias("span_type"),
             F.col("span.offset_start").alias("offset_start"),
             F.col("span.offset_end").alias("offset_end"))
     .write.mode("overwrite").option("header", "true").csv(path))
