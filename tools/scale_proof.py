"""sf1 scale-proof run (VERDICT r4 ask #1): execute the flagship jobs at
sf0.1 (400k turns) AND sf1 (4M turns) in one session and report per-unit
cost at both levels plus their ratio — turning the "would survive 100x"
design arguments into a measured flat-cost record.

Jobs and their scale axes:
- extraction_job / web_extraction_job: the scaling targets from bench.py
  (scan -> Arrow UDF [-> web wrap+strip], no cache), scaled by
  SPARK_GRAFT_TURNS via the synthetic transcript generator.
- conversation_near_dedup: rendered conversations -> skew-safe minhash ->
  components, scaled the same way (the hot-conversation tail grows 10x).
- dedup_containment: documents-table operator; scaled by a deterministic
  10x replication of the sf0.1 documents corpus where every word in
  replica r is suffixed "_r<r>" (INCLUDING replica 0, so both levels see
  identical word lengths and the per-document hash cost is genuinely
  comparable) — replicas keep the original corpus's internal near-dup
  structure but share no n-grams across replicas, so the pair workload
  scales linearly. n_chars is recomputed from the suffixed text.

Per-unit cost is wall_seconds / units (turns or docs). The run also
measures the in-run host ceiling (bench.py busy_rate) so a degraded
shared-VM window is visible in the record. Output: ONE JSON line.

Usage: python tools/scale_proof.py [--quick]
  --quick uses 40k/400k turns and 5k/10k docs (smoke-testing the tool);
  the full run uses 400k/4M turns and 5k/50k docs.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf0.1"


def build_scaled_documents(spark, out_dir: str, replicas: int) -> int:
    """Replicate the sf0.1 documents corpus `replicas`x with disjoint
    vocabularies per replica (deterministic, no RNG)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    reps = spark.range(0, replicas).withColumnRenamed("id", "rep")
    scaled = (
        docs.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("rep") * n_docs).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split("text", " "),
                    lambda w: F.concat(w, F.lit("_r"),
                                       F.col("rep").cast("string"))),
                " ").alias("text"),
            "lang", "source",
        )
        .withColumn("n_chars", F.length("text").cast("long"))
    )
    scaled.repartition(32).write.mode("overwrite") \
        .parquet(f"{out_dir}/documents.parquet")
    return n_docs * replicas


def main() -> None:
    quick = "--quick" in sys.argv
    import tempfile

    from bench import busy_rate, materialize
    from material_parsers_spark.pipeline.extraction import extract_ordered
    from material_parsers_spark.pipeline.session import build_session
    from material_parsers_spark.pipeline.web import (
        extract_materials_from_html,
        wrap_turns_in_html,
    )
    from material_parsers_spark.queries import (
        SPARK_QUERIES,
        _turns_for,
        clear_turns_cache,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.environ.setdefault("SPARK_DRIVER_MEMORY", f"{2 * cpus}g")
    spark = build_session(app_name="scale-proof", master=f"local[{cpus}]",
                          shuffle_partitions=cpus)

    turn_levels = [40_000, 400_000] if quick else [400_000, 4_000_000]
    doc_replicas = [1, 2] if quick else [1, 10]

    def timed(fn, reps: int = 3) -> tuple:
        # min-of-3 per level (r6: VERDICT r5 ask #4 — the r5 record's
        # extraction ratio rested on min-of-2 at a degraded window)
        samples = []
        for _ in range(reps):
            start = time.time()
            materialize(fn())
            samples.append(round(time.time() - start, 3))
        return min(samples), samples

    results: dict = {}

    # --- turn-scaled jobs
    for n_turns in turn_levels:
        os.environ["SPARK_GRAFT_TURNS"] = str(n_turns)
        clear_turns_cache()
        turns = _turns_for(spark, SF_DIR)
        turns.count()   # fill the cache (input materialization, untimed)

        jobs = {
            "extraction_job": lambda: extract_ordered(
                turns, include_tokens=False),
            "web_extraction_job": lambda: extract_materials_from_html(
                wrap_turns_in_html(turns)),
            "conversation_near_dedup": lambda: SPARK_QUERIES[
                "conversation_near_dedup"](spark, SF_DIR),
        }
        for name, fn in jobs.items():
            materialize(fn())   # warm-up (UDF workers, codegen)
            best, samples = timed(fn)
            results.setdefault(name, {})[n_turns] = {
                "sec": best, "samples": samples,
                "per_million_units_sec": round(best / (n_turns / 1e6), 3),
            }
            print(f"[{name}] {n_turns} turns: {best}s {samples}",
                  flush=True)
        clear_turns_cache()
    del os.environ["SPARK_GRAFT_TURNS"]

    # --- document-scaled containment
    with tempfile.TemporaryDirectory(prefix="scale-proof-docs-") as tmp:
        for rep in doc_replicas:
            level_dir = os.path.join(tmp, f"x{rep}")
            n_docs = build_scaled_documents(spark, level_dir, rep)
            fn = lambda: SPARK_QUERIES["dedup_containment"](
                spark, level_dir)
            materialize(fn())
            best, samples = timed(fn)
            results.setdefault("dedup_containment", {})[n_docs] = {
                "sec": best, "samples": samples,
                "per_million_units_sec": round(best / (n_docs / 1e6), 3),
            }
            print(f"[dedup_containment] {n_docs} docs: {best}s {samples}",
                  flush=True)

    rate_1 = busy_rate(1)
    rate_n = busy_rate(cpus)
    summary = {}
    for name, levels in results.items():
        keys = sorted(levels)
        lo, hi = levels[keys[0]], levels[keys[-1]]
        summary[name] = {
            "levels": {str(k): levels[k] for k in keys},
            "scaleup": round(keys[-1] / keys[0], 1),
            "per_unit_cost_ratio": round(
                hi["per_million_units_sec"]
                / lo["per_million_units_sec"], 3),
        }
    out = {
        "metric": "scale_proof_per_unit_cost_ratio",
        "jobs": summary,
        "host": {
            "busy_rate_1proc": round(rate_1),
            f"busy_rate_{cpus}proc": round(rate_n),
            "per_core_ceiling": round(rate_n / rate_1, 3),
        },
        "cpus": cpus,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
