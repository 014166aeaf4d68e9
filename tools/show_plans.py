"""Dump formatted physical plans for the headline queries to BENCH/PLANS.md.

The plan shapes are the design contract (README "Scale design"): pushed
filters + pruned ReadSchema at scans, exactly one ArrowEvalPython per
extraction pipeline, no shuffle of the nested payload.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

QUERIES = [
    "extract_materials",
    "conversation_span_stats",
    "dedup_minhash_lsh",
    "dedup_minhash_components",
    "dedup_ngram_jaccard",
    "similarity_topk",
    "similarity_ann_lsh",
    "linking_eval",
    "stable_ordering",
    "tagger_spans",
    "multimodal_frame_sample",
    "bpe_encode_stats",
    "sft_examples",
    "tool_output_stats",
]


def main() -> None:
    from material_parsers_spark.pipeline.session import build_session
    from material_parsers_spark.queries import SPARK_QUERIES

    spark = build_session(app_name="plans", master="local[4]",
                          shuffle_partitions=4)
    sf_dir = "/root/testdata/sf0.01"

    sections = []
    for name in QUERIES:
        df = SPARK_QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution
            .ExplainMode.fromString("formatted"))
        # keep the operator tree, trim the verbose operator detail section
        tree = plan.split("\n\n")[0]
        arrow_nodes = tree.count("ArrowEvalPython")
        sections.append(
            f"## {name}\n\n"
            f"ArrowEvalPython nodes: {arrow_nodes}\n\n"
            f"```\n{tree}\n```\n")

    with open("/root/repo/BENCH/PLANS.md", "w") as fh:
        fh.write(
            "# Physical plans (explain formatted, operator tree)\n\n"
            "Invariants checked by tests/test_pipeline_spark.py: parquet "
            "scans carry PushedFilters + pruned ReadSchema; each extraction "
            "pipeline contains exactly ONE ArrowEvalPython node (the UDF is "
            "non-deterministic to stop Catalyst duplicating it under "
            "explodes); the ordering window shuffles only the narrow "
            "(conv_id, turn_idx, text) projection.\n\n"
            + "\n".join(sections))
    print("wrote BENCH/PLANS.md")


if __name__ == "__main__":
    main()
