"""brat standoff (.ann) reader as a distributed source (S7, SURVEY.md §2.1).

Re-expresses `commons/ann_parser.py:21-71` Spark-first: `spark.read.text`
with the file path attached, JVM-side line parsing via regexp extraction
(whole-stage codegen; no Python in the parse), entity/relation rows joined
back by entity id. The reference's per-file dict becomes two DataFrames.

.ann format (tab-separated):
  T<k>\t<TAG> <start> <end>\t<surface>
  R<k>\t<TAG> Arg1:T<i> Arg2:T<j>
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_ann_lines(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.read.text(f"{path}/*.ann")
        .withColumn("file", F.element_at(
            F.split(F.input_file_name(), "/"), -1))
    )


def read_entities(spark: SparkSession, path: str) -> DataFrame:
    """One row per T-line: (file, ent_id, tag, start, end, surface)."""
    lines = read_ann_lines(spark, path)
    parts = F.split("value", "\t")
    header = F.split(F.element_at(parts, 2), " ")
    return (
        lines.where(F.col("value").rlike(r"^T\d"))
        .select(
            "file",
            F.element_at(parts, 1).alias("ent_id"),
            F.element_at(header, 1).alias("tag"),
            F.element_at(header, 2).cast("int").alias("start"),
            F.element_at(header, 3).cast("int").alias("end"),
            F.element_at(parts, 3).alias("surface"),
        )
    )


def read_relations(spark: SparkSession, path: str) -> DataFrame:
    """One row per R-line with both endpoint entities resolved:
    (file, rel_id, tag, arg1..., arg2...)."""
    lines = read_ann_lines(spark, path)
    parts = F.split("value", "\t")
    header = F.split(F.element_at(parts, 2), " ")
    rels = (
        lines.where(F.col("value").rlike(r"^R\d"))
        .select(
            "file",
            F.element_at(parts, 1).alias("rel_id"),
            F.element_at(header, 1).alias("tag"),
            F.regexp_extract(F.element_at(header, 2), r"Arg1:(T\d+)", 1)
            .alias("arg1_id"),
            F.regexp_extract(F.element_at(header, 3), r"Arg2:(T\d+)", 1)
            .alias("arg2_id"),
        )
    )
    entities = read_entities(spark, path)
    arg1 = entities.select(
        F.col("file").alias("file1"), F.col("ent_id").alias("arg1_id"),
        F.col("tag").alias("arg1_tag"), F.col("start").alias("arg1_start"),
        F.col("end").alias("arg1_end"), F.col("surface").alias("arg1_surface"))
    arg2 = entities.select(
        F.col("file").alias("file2"), F.col("ent_id").alias("arg2_id"),
        F.col("tag").alias("arg2_tag"), F.col("start").alias("arg2_start"),
        F.col("end").alias("arg2_end"), F.col("surface").alias("arg2_surface"))
    return (
        rels
        .join(arg1, (rels.file == arg1.file1)
              & (rels.arg1_id == arg1.arg1_id), "left").drop("file1")
        .join(arg2, (rels.file == arg2.file2)
              & (rels.arg2_id == arg2.arg2_id), "left").drop("file2")
    )


def read_documents(spark: SparkSession, path: str) -> DataFrame:
    """Sibling .txt corpus: (file, text) — whole-file reads."""
    return (
        spark.read.text(f"{path}/*.txt", wholetext=True)
        .select(
            F.regexp_replace(
                F.element_at(F.split(F.input_file_name(), "/"), -1),
                r"\.txt$", ".ann").alias("file"),
            F.col("value").alias("text"),
        )
    )
