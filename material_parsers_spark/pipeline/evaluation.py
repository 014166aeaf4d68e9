"""Distributed linking evaluation (A2 at corpus scale).

The Spark re-expression of the reference's evaluation loop
(`linking/linking_evaluation.py:410-560`): read an annotated TEI corpus,
run the rule-based linker over each paragraph's gold spans inside an
Arrow-batched UDF, join predicted against gold links, and aggregate the
reference's exact micro/macro averages — micro from globally summed
TP/FP/expected counters, macro as the mean of per-document P/R/F1 — as
one DataFrame aggregation (no driver-side loops; per-document metrics
are a groupBy, corpus averages a second tiny agg over n_docs rows).
"""

from __future__ import annotations

from typing import Iterator, List

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PREDICTED_SCHEMA = (
    "doc_id string, source_id string, target_id string, link_type string"
)


def _predicted_links(text: str, spans: List[dict],
                     tokens: List[dict]) -> List[tuple]:
    """Kernel path: the service's /process/link flow over gold spans;
    bidirectional link writes are canonicalized to one (src, tgt) pair."""
    from ..kernel.linker import get_link_type
    from ..kernel.service import process_link

    paragraph = {
        "text": text,
        "spans": [dict(span) for span in spans],
        "tokens": [dict(token) for token in tokens],
    }
    out = process_link([paragraph])[0]
    triples = set()
    for span in out["spans"]:
        for link in span.get("links") or []:
            if link.get("type") == "crf":
                continue
            link_type = get_link_type(span["type"], link["targetType"])
            a, b = str(span["id"]), str(link["targetId"])
            if a > b:
                a, b = b, a
            triples.add((a, b, link_type))
    return sorted(triples)


def predicted_links(tei_df: DataFrame) -> DataFrame:
    """One row per predicted link: (doc_id, source_id, target_id,
    link_type)."""
    import pandas as pd

    from ..kernel.metrics import tokenize_chunk

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for batch in batches:
            rows = []
            for doc_id, text, spans in zip(
                    batch["doc_id"], batch["text"], batch["spans"]):
                span_dicts = ([dict(s) for s in spans]
                              if spans is not None else [])
                if not span_dicts:
                    continue
                tokens, _ = tokenize_chunk(text, 0)
                for a, b, link_type in _predicted_links(
                        text, span_dicts, tokens):
                    rows.append({"doc_id": doc_id, "source_id": a,
                                 "target_id": b, "link_type": link_type})
            yield pd.DataFrame(
                rows, columns=["doc_id", "source_id", "target_id",
                               "link_type"])

    return tei_df.mapInPandas(run, schema=PREDICTED_SCHEMA)


def gold_links(tei_df: DataFrame) -> DataFrame:
    """Gold triples from the corresp graph, canonicalized like predicted."""
    link = F.explode("gold_links").alias("link")
    raw = tei_df.select("doc_id", link).select(
        "doc_id",
        F.least("link.source_id", "link.target_id").alias("source_id"),
        F.greatest("link.source_id", "link.target_id").alias("target_id"),
        F.col("link.link_type").alias("link_type"),
    )
    return raw.distinct()


def evaluate_linking(tei_df: DataFrame,
                     link_type: str = "<material-tcValue>") -> DataFrame:
    """Corpus micro/macro averages for one link type, reference semantics
    (`linking_evaluation.py:489-545`). Returns a single row:
    (link_type, n_docs, micro_precision, micro_recall, micro_f1,
    macro_precision, macro_recall, macro_f1, support)."""
    predicted = (predicted_links(tei_df)
                 .where(F.col("link_type") == link_type)
                 .withColumn("p", F.lit(1)))
    expected = (gold_links(tei_df)
                .where(F.col("link_type") == link_type)
                .withColumn("e", F.lit(1)))

    joined = predicted.join(
        expected, ["doc_id", "source_id", "target_id", "link_type"],
        "full_outer")

    counted = joined.groupBy("doc_id").agg(
        F.sum(F.when(F.col("p").isNotNull() & F.col("e").isNotNull(), 1)
              .otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("p").isNotNull() & F.col("e").isNull(), 1)
              .otherwise(0)).alias("fp"),
        F.sum(F.coalesce("e", F.lit(0))).alias("expected"),
    )
    # the reference's macro average divides by the FILE count, including
    # documents with no links of this type at all — keep those as zero rows
    per_doc = (
        tei_df.select("doc_id").distinct()
        .join(counted, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("tp", F.lit(0)).alias("tp"),
            F.coalesce("fp", F.lit(0)).alias("fp"),
            F.coalesce("expected", F.lit(0)).alias("expected"),
        )
    )

    precision = F.when(F.col("tp") + F.col("fp") > 0,
                       F.col("tp") / (F.col("tp") + F.col("fp"))) \
        .otherwise(F.lit(0.0))
    recall = F.when(F.col("expected") > 0,
                    F.col("tp") / F.col("expected")).otherwise(F.lit(0.0))
    with_metrics = per_doc.select(
        "tp", "fp", "expected",
        precision.alias("precision"), recall.alias("recall"),
    ).withColumn(
        "f1",
        F.when(F.col("precision") + F.col("recall") > 0,
               2 * F.col("precision") * F.col("recall")
               / (F.col("precision") + F.col("recall")))
        .otherwise(F.lit(0.0)),
    )

    totals = with_metrics.agg(
        F.count("*").alias("n_docs"),
        F.sum("tp").alias("tp"),
        F.sum("fp").alias("fp"),
        F.sum("expected").alias("expected"),
        F.avg("precision").alias("macro_precision"),
        F.avg("recall").alias("macro_recall"),
        F.avg("f1").alias("macro_f1"),
    )
    micro_p = F.when(F.col("tp") + F.col("fp") > 0,
                     F.col("tp") / (F.col("tp") + F.col("fp"))) \
        .otherwise(F.lit(0.0))
    micro_r = F.when(F.col("expected") > 0,
                     F.col("tp") / F.col("expected")).otherwise(F.lit(0.0))
    return totals.select(
        F.lit(link_type).alias("link_type"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.round(micro_p, 6).alias("micro_precision"),
        F.round(micro_r, 6).alias("micro_recall"),
        F.round(F.when(micro_p + micro_r > 0,
                       2 * micro_p * micro_r / (micro_p + micro_r))
                .otherwise(F.lit(0.0)), 6).alias("micro_f1"),
        F.round("macro_precision", 6).alias("macro_precision"),
        F.round("macro_recall", 6).alias("macro_recall"),
        F.round("macro_f1", 6).alias("macro_f1"),
        F.col("expected").cast("long").alias("support"),
    )


def corpus_statistics(tei_df: DataFrame) -> DataFrame:
    """A1 (full): the reference's per-document dataset analysis
    (`commons/dataset_analysis.py:28-100`) as one distributed aggregation
    — sentences, tokens, entity mentions, distinct classes, and
    positive/negative sentence counts (a sentence is positive when it
    carries at least one entity)."""
    per_para = tei_df.select(
        "doc_id",
        F.col("n_tokens").alias("tokens"),
        F.size("spans").alias("n_entities"),
    )
    return (
        per_para.groupBy("doc_id")
        .agg(
            F.count("*").alias("sentences"),
            F.sum("tokens").cast("long").alias("tokens"),
            F.sum("n_entities").cast("long").alias("entities"),
            F.sum(F.when(F.col("n_entities") > 0, 1).otherwise(0))
            .cast("long").alias("positive_examples"),
            F.sum(F.when(F.col("n_entities") == 0, 1).otherwise(0))
            .cast("long").alias("negative_examples"),
        )
    )


def class_content_distribution(tei_df: DataFrame) -> DataFrame:
    """A1 per-class content distribution: for every entity class, the
    mention count, distinct-surface count, and the modal surface form
    (ties broken lexicographically) — the compact projection of the
    reference's per-class content_distribution dict."""
    mentions = tei_df.select(
        F.explode("spans").alias("span")
    ).select(
        F.col("span.type").alias("entity_class"),
        F.col("span.text").alias("content"),
    )
    by_content = mentions.groupBy("entity_class", "content").agg(
        F.count("*").alias("n"))
    window = Window.partitionBy("entity_class").orderBy(
        F.desc("n"), F.asc("content"))
    ranked = by_content.withColumn("rn", F.row_number().over(window))
    totals = by_content.groupBy("entity_class").agg(
        F.sum("n").cast("long").alias("n_mentions"),
        F.count("*").cast("long").alias("n_distinct_contents"),
    )
    top = ranked.where(F.col("rn") == 1).select(
        "entity_class", F.col("content").alias("top_content"),
        F.col("n").cast("long").alias("top_count"))
    return totals.join(top, "entity_class")
