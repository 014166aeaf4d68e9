"""Scale spot-check for the round-5 late operators: run each at two
corpus sizes in ONE session and report per-unit cost at both levels
plus the hi/lo ratio — the same flat-cost evidence scale_proof.py
records for the flagships, extended to the operators added after that
run (span-level decontamination repair, dense training order, BPE
merge candidates over replicated documents; line-dedup repair over the
synthetic transcript corpus scaled by SPARK_GRAFT_TURNS).

Documents levels: 10x and 100x replication of the sf0.1 corpus via
scale_proof.build_scaled_documents (disjoint per-replica vocabularies,
identical word lengths at both levels). Conversation level: 400k vs
4M turns (~17k vs ~170k rendered conversations).

Output: ONE JSON line with per-unit costs, ratios, and the in-run host
ceiling. A ratio near 1.0 = flat per-unit cost; <1 = economies of
scale (fixed job overhead amortizing); >>1 = a superlinear operator.

Usage: python tools/scale_spot.py [--quick]
  --quick uses 2x/10x docs and 40k/400k turns (smoke-testing the tool).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DOC_QUERIES = ("decontaminate_span_removal", "training_order",
               "bpe_merge_candidates", "dedup_substring_repair",
               "dsir_importance_weights", "eval_leakage_report",
               "quality_classifier", "bpe_learn_merges",
               "bpe_encode_stats", "top_ngrams",
               "packing_efficiency", "temperature_sampling",
               "cms_word_counts", "token_length_quantiles")
# bloom_decon_prefilter is deliberately NOT spot-scaled: the replicated
# corpora have disjoint per-replica vocabularies, so the 100x level
# carries ~1M distinct eval grams — the FIXED 65,536-bit filter
# saturates (~100% FP) and the measurement would certify the degenerate
# everything-survives path, not the prefilter. Its scale story is the
# probe's zero-shuffle plan (plan-gated) + the driver-scale oracles.

# events-table operators: replicas get disjoint users, ids and YEARLY
# time offsets so join/rollup output grows LINEARLY with input (same-
# range replication would densify the band and grow pairs quadratically
# — a corpus artifact, not an operator property)
EVENT_QUERIES = ("event_attribution_asof", "range_join_error_proximity",
                 "hypertable_rollup", "sessionize_events")


def build_scaled_events(spark, out: str, reps: int) -> int:
    from pyspark.sql import functions as F
    ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    n = ev.count()
    r = spark.range(reps).select(F.col("id").alias("rep"))
    year_us = 365 * 86400 * 1_000_000
    (ev.crossJoin(r)
     .select((F.col("event_id") + F.col("rep") * 100_000_000)
             .alias("event_id"),
             F.timestamp_micros(
                 F.unix_micros(F.col("ts").cast("timestamp"))
                 + F.col("rep") * year_us).alias("ts"),
             (F.col("user_id") + F.col("rep") * 1_000_000)
             .alias("user_id"),
             "event_type", "value", "props")
     .repartition(64)
     .write.mode("overwrite").parquet(f"{out}/events.parquet"))
    return n * reps


def build_scaled_embeddings(spark, out: str, reps: int) -> int:
    """Replicate the sf0.1 embeddings table reps-x with deterministic
    per-replica perturbation (so replicas are near- but not exact
    duplicates) and disjoint vec_id ranges; replica 0 keeps the
    original ids, so the k-means init vectors (200..207) exist."""
    from pyspark.sql import functions as F
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    n = emb.count()
    r = spark.range(reps).select(F.col("id").alias("rep"))
    perturbed = F.transform(
        "embedding",
        lambda x, i: (x + ((F.col("rep") * 37 + i) % 101 - 50)
                      / 10000.0).cast("float"))
    (emb.crossJoin(r)
     .select((F.col("vec_id") + F.col("rep") * 100000).alias("vec_id"),
             perturbed.alias("embedding"), "label")
     .write.mode("overwrite").parquet(f"{out}/embeddings.parquet"))
    return n * reps


def main() -> None:
    quick = "--quick" in sys.argv

    from bench import busy_rate, materialize
    from material_parsers_spark import queries as q
    from material_parsers_spark.pipeline.session import build_session
    from tools.scale_proof import build_scaled_documents

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(app_name="scale-spot", master=f"local[{cpus}]",
                          shuffle_partitions=cpus)

    doc_levels = (("lo", 2), ("hi", 10)) if quick else (("lo", 10),
                                                        ("hi", 100))
    turn_levels = (("lo", 40_000), ("hi", 400_000)) if quick else \
        (("lo", 400_000), ("hi", 4_000_000))

    results: dict = {}
    with tempfile.TemporaryDirectory() as tmp:
        for label, reps in doc_levels:
            out = f"{tmp}/docs_{label}"
            n_docs = build_scaled_documents(spark, out, reps)
            for name in DOC_QUERIES:
                start = time.time()
                materialize(q.SPARK_QUERIES[name](spark, out))
                wall = time.time() - start
                results.setdefault(name, {})[label] = {
                    "units": n_docs, "sec": round(wall, 3),
                    "us_per_unit": round(wall / n_docs * 1e6, 3)}

    with tempfile.TemporaryDirectory() as tmp:
        ev_levels = (("lo", 2), ("hi", 10)) if quick else (("lo", 10),
                                                           ("hi", 100))
        for label, reps in ev_levels:
            out = f"{tmp}/events_{label}"
            n_events = build_scaled_events(spark, out, reps)
            for name in EVENT_QUERIES:
                start = time.time()
                materialize(q.SPARK_QUERIES[name](spark, out))
                wall = time.time() - start
                results.setdefault(name, {})[label] = {
                    "units": n_events, "sec": round(wall, 3),
                    "us_per_unit": round(wall / n_events * 1e6, 3)}

    with tempfile.TemporaryDirectory() as tmp:
        emb_levels = (("lo", 2), ("hi", 10)) if quick else (("lo", 10),
                                                            ("hi", 100))
        for label, reps in emb_levels:
            out = f"{tmp}/emb_{label}"
            n_vecs = build_scaled_embeddings(spark, out, reps)
            start = time.time()
            materialize(q.SPARK_QUERIES["kmeans_embeddings"](spark, out))
            wall = time.time() - start
            results.setdefault("kmeans_embeddings", {})[label] = {
                "units": n_vecs, "sec": round(wall, 3),
                "us_per_unit": round(wall / n_vecs * 1e6, 3)}

    for label, turns in turn_levels:
        os.environ["SPARK_GRAFT_TURNS"] = str(turns)
        q.clear_turns_cache()
        # warm the shared turns cache OUTSIDE the timers so the first
        # query does not pay the synthetic-turns build the second one
        # skips — both rows then measure the operator, not the cache
        q._turns_for(spark, "/root/testdata/sf0.1").count()
        for name in ("conversation_line_repair",
                     "conversation_substring_repair",
                     "tool_transitions",
                     "sft_examples",
                     "tool_output_stats",
                     "adjacent_turn_similarity"):
            start = time.time()
            materialize(q.SPARK_QUERIES[name](
                spark, "/root/testdata/sf0.1"))
            wall = time.time() - start
            results.setdefault(name, {})[label] = {
                "units": turns, "sec": round(wall, 3),
                "us_per_unit": round(wall / turns * 1e6, 3)}
    os.environ.pop("SPARK_GRAFT_TURNS", None)
    q.clear_turns_cache()

    for name, levels in results.items():
        levels["hi_over_lo_per_unit"] = round(
            levels["hi"]["us_per_unit"] / levels["lo"]["us_per_unit"], 3)

    rate_1 = busy_rate(1)
    rate_n = busy_rate(cpus)
    print(json.dumps({
        "metric": "scale_spot_r05_late_ops",
        "results": results,
        "host": {"per_core_ceiling": round(rate_n / rate_1, 3)},
        "cpus": cpus,
    }))


if __name__ == "__main__":
    main()
