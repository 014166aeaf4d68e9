"""The extraction pipeline: turns DataFrame -> extraction DataFrame.

Spark re-expression of the reference's /process/material + /process/link
flows (SURVEY.md §3.1-3.2): one Arrow-batched pandas UDF per turn running
the pure kernel, with the dictionary trie broadcast once. The hot path is
shuffle-free — per-turn rows are independent; the only shuffles are the
optional output ordering and rollups.

Plan shape (verified via .explain): parquet scan with pushed filters and a
two-column ReadSchema -> WholeStageCodegen filter -> ArrowEvalPython ->
project. No groupBy, no join, no window in the hot path.
"""

from __future__ import annotations

import json
import os
from functools import lru_cache
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..kernel.gazetteer import (
    TokenTrieMatcher,
    crystal_structure_patterns,
    space_group_patterns,
)
from .schemas import EXTRACTION_TYPE

# tiny curated dictionary kept for fast kernel tests
DEFAULT_CRYSTAL_NAMES = ["Al B2", "Cu O2", "Fe As", "Nb Ti", "La O"]
DEFAULT_SPACE_GROUPS = [
    {"name": "P6/mmm", "type": "hexagonal"},
    {"name": "Fm_3m", "type": "cubic"},
    {"name": "I4/mmm", "type": "tetragonal"},
    {"name": "Pnma", "type": "orthorhombic"},
]

def _read_resource(name: str) -> str:
    """Zip-safe resource read: a spark-submit --py-files deployment
    imports this package from a zip, where __file__-relative open()
    fails — importlib.resources reads through the zip importer."""
    from importlib import resources

    return (resources.files("material_parsers_spark")
            .joinpath("resources", name).read_text())


def build_default_patterns() -> list:
    return (crystal_structure_patterns(DEFAULT_CRYSTAL_NAMES)
            + space_group_patterns(DEFAULT_SPACE_GROUPS))


@lru_cache(maxsize=1)
def _full_patterns_cached() -> tuple:
    space_groups = json.loads(_read_resource("space_groups.json"))
    crystal = json.loads(_read_resource("crystal_structures.json"))
    patterns = (
        crystal_structure_patterns([i.get("name", "") for i in crystal])
        + space_group_patterns(space_groups)
    )
    return tuple(patterns)


def load_full_patterns() -> list:
    """The production dictionary: the full 230-space-group +
    100-prototype-compound base lists (resources/, data from the
    reference's deployment: `resources/data/{space-groups,
    crystal-structure}.json`) expanded by the D2/D3 generators into the
    same pattern set the reference ships (5,925 unique patterns; shipped
    file parity proven in tests/test_reference_differential.py)."""
    return list(_full_patterns_cached())


def run_extraction(turns: DataFrame,
                   patterns: Optional[list] = None,
                   include_tokens: bool = True) -> DataFrame:
    """Append an ``extraction`` struct column (tokens, spans, materials).

    The matcher trie is built per executor from the broadcast pattern list
    (cheap, built once per python worker via closure caching).
    ``include_tokens=False`` halves the Arrow payload for consumers that
    only read spans/materials.
    """
    spark = turns.sparkSession
    pattern_list = patterns if patterns is not None else load_full_patterns()
    broadcast_patterns = spark.sparkContext.broadcast(pattern_list)
    with_tokens = include_tokens

    @F.pandas_udf(EXTRACTION_TYPE)
    def extract_udf(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        # imports inside the UDF so executors resolve them locally
        from ..kernel.gazetteer import TokenTrieMatcher as _Matcher
        from ..kernel.turns import extract_turn as _extract

        matcher = _Matcher(broadcast_patterns.value)
        for series in batches:
            rows = [_extract(text, matcher, include_tokens=with_tokens)
                    for text in series]
            yield pd.DataFrame(rows, columns=["tokens", "spans", "materials"])

    # The kernel is deterministic, but the non-deterministic flag stops
    # Catalyst from DUPLICATING the UDF: InferFiltersFromGenerate otherwise
    # pushes a size(materials)>0 predicate below a downstream explode and
    # re-evaluates the whole Python stage a second time (observed via
    # .explain: two ArrowEvalPython nodes for one query).
    extract_udf = extract_udf.asNondeterministic()

    # column pruning: only (conv_id, turn_idx, text) feed the kernel; the
    # cheap null/empty filter runs JVM-side before any Python is invoked
    return (
        turns
        .where(F.col("text").isNotNull() & (F.length("text") > 0))
        .withColumn("extraction", extract_udf(F.col("text")))
    )


def ordered_output(extracted: DataFrame) -> DataFrame:
    """Stable (conv_id, turn_idx) ordering with a global row_number —
    the per-turn invariant surface (north rule)."""
    window = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (
        extracted
        .withColumn("turn_rank", F.row_number().over(window))
        .select(
            "conv_id", "turn_idx", "turn_rank",
            F.col("extraction.tokens").alias("tokens"),
            F.col("extraction.spans").alias("spans"),
            F.col("extraction.materials").alias("materials"),
        )
    )


def extract_ordered(turns: DataFrame,
                    patterns: Optional[list] = None,
                    include_tokens: bool = True,
                    dense_turn_idx: bool = True) -> DataFrame:
    """Per-turn extraction with a stable per-conversation rank.

    ``dense_turn_idx=True`` (the input contract: turn_idx is the dense
    0-based order within its conversation, which the stable-ordering
    invariant keys on) derives ``turn_rank = turn_idx + 1`` as a pure
    column expression — the hot path then has ZERO shuffles: scan ->
    JVM filter -> Arrow UDF. Input rows are not conversation-grouped at
    the scan, so skew needs no rebalancing either.

    With ``dense_turn_idx=False`` (sparse/unordered turn_idx) the rank
    comes from a window over the NARROW (conv_id, turn_idx, text) frame
    before the UDF — the shuffle moves ~3 columns, never the nested
    extraction payload — followed by a round-robin rebalance so no
    straggler task carries a whole hot conversation through Python."""
    narrow = (
        turns.select("conv_id", "turn_idx", "text")
        .where(F.col("text").isNotNull() & (F.length("text") > 0))
    )
    if dense_turn_idx:
        narrow = narrow.withColumn(
            "turn_rank", (F.col("turn_idx") + F.lit(1)).cast("int"))
    else:
        window = Window.partitionBy("conv_id").orderBy("turn_idx")
        n_parts = turns.sparkSession.sparkContext.defaultParallelism * 4
        narrow = (
            narrow.withColumn("turn_rank", F.row_number().over(window))
            .repartition(n_parts)
        )
    return run_extraction(narrow, patterns,
                          include_tokens=include_tokens).select(
        "conv_id", "turn_idx", "turn_rank",
        F.col("extraction.tokens").alias("tokens"),
        F.col("extraction.spans").alias("spans"),
        F.col("extraction.materials").alias("materials"),
    )


def extract_ordered_deduped(turns: DataFrame,
                            patterns: Optional[list] = None,
                            include_tokens: bool = False,
                            dense_turn_idx: bool = True) -> DataFrame:
    """``extract_ordered`` with cross-row common-subexpression
    elimination: the Python kernel runs ONCE PER DISTINCT TEXT and the
    results join back to every occurrence.

    Real transcript corpora repeat turn texts heavily (canned tool
    output, empty replies, boilerplate greetings); at 10^12 turns the
    kernel cost becomes O(distinct texts) instead of O(turns) while the
    added cost is one distinct + one hash join, both keyed on the
    128-bit md5 of the text (collision odds negligible; the join never
    shuffles the raw text on the probe side). Prefer the direct
    zero-shuffle ``extract_ordered`` when texts are mostly unique — the
    two shuffles only pay for themselves past ~2x average duplication.

    Output rows are identical to ``extract_ordered`` (parity-tested)."""
    narrow = (
        turns.select("conv_id", "turn_idx", "text")
        .where(F.col("text").isNotNull() & (F.length("text") > 0))
        .withColumn("text_hash", F.md5("text"))
    )
    if dense_turn_idx:
        narrow = narrow.withColumn(
            "turn_rank", (F.col("turn_idx") + F.lit(1)).cast("int"))
    else:
        window = Window.partitionBy("conv_id").orderBy("turn_idx")
        narrow = narrow.withColumn("turn_rank", F.row_number().over(window))

    distinct = narrow.select("text_hash", "text") \
        .dropDuplicates(["text_hash"])
    per_text = run_extraction(distinct, patterns,
                              include_tokens=include_tokens) \
        .select("text_hash", "extraction")
    return (
        narrow.drop("text")
        .join(per_text, "text_hash")
        .select(
            "conv_id", "turn_idx", "turn_rank",
            F.col("extraction.tokens").alias("tokens"),
            F.col("extraction.spans").alias("spans"),
            F.col("extraction.materials").alias("materials"),
        )
    )


def span_counts_per_conversation(extracted: DataFrame,
                                 salt_buckets: int = 16) -> DataFrame:
    """Two-phase (salted) aggregation of span counts per conversation.

    Conversation sizes are heavy-tailed; a direct groupBy(conv_id) puts a
    hot conversation in one task. Salting splits each conversation across
    ``salt_buckets`` partial aggregates, then combines — both phases are
    map-side-combinable hash aggregates (SURVEY.md §4 item 1).
    """
    salted = extracted.withColumn(
        "salt", F.pmod(F.hash("turn_idx"), F.lit(salt_buckets)))
    partial = (
        salted.groupBy("conv_id", "salt")
        .agg(
            F.count("*").alias("turns_partial"),
            F.sum(F.size("spans")).alias("spans_partial"),
            F.sum(F.size("materials")).alias("materials_partial"),
        )
    )
    return (
        partial.groupBy("conv_id")
        .agg(
            F.sum("turns_partial").alias("n_turns"),
            F.sum("spans_partial").alias("n_spans"),
            F.sum("materials_partial").alias("n_materials"),
        )
    )


def observe_counters(turns: DataFrame):
    """Attach an Observation collecting pipeline counters (rows in, null
    texts) without a separate pass (`df.observe`, SURVEY.md §4 item 4)."""
    from pyspark.sql import Observation

    observation = Observation("extraction_counters")
    observed = turns.observe(
        observation,
        F.count(F.lit(1)).alias("rows_in"),
        F.sum(F.when(F.col("text").isNull(), 1).otherwise(0)).alias("null_texts"),
    )
    return observed, observation
