"""Per-partition checkpoint manifest + anti-join resume (SURVEY.md §4 item 4).

Emulates Iceberg-style snapshot bookkeeping over plain parquet (documented
substitution, SURVEY.md §7.3): the input is bucketed into logical partitions
by conv_id hash; each completed bucket writes a manifest row with row/span
counters and a lineage stamp. A resumed run anti-joins the input against the
manifest and processes only missing buckets — no duplicate, no missing turns.

Commit rule making that claim crash-safe: bucket data is visible iff its
manifest entry exists. Resume first reconciles orphans (bucket parquet
whose writer died before the manifest landed) by deleting them, so the
reprocessing append can never duplicate rows.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_SCHEMA = "bucket INT, n_turns LONG, n_spans LONG, run_id STRING, completed_at DOUBLE"


def with_bucket(turns: DataFrame, n_buckets: int = 64) -> DataFrame:
    return turns.withColumn(
        "bucket", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int"))


def completed_buckets(spark: SparkSession, manifest_dir: str) -> DataFrame:
    rows = []
    if os.path.isdir(manifest_dir):
        for name in sorted(os.listdir(manifest_dir)):
            if name.startswith("bucket-") and name.endswith(".json"):
                with open(os.path.join(manifest_dir, name)) as handle:
                    entry = json.load(handle)
                rows.append((int(entry["bucket"]), int(entry["n_turns"]),
                             int(entry["n_spans"]), str(entry["run_id"]),
                             float(entry["completed_at"])))
    return spark.createDataFrame(rows, MANIFEST_SCHEMA)


def pending_turns(turns_with_bucket: DataFrame,
                  manifest: DataFrame) -> DataFrame:
    """left_anti join: drop turns whose bucket already checkpointed."""
    return turns_with_bucket.join(
        F.broadcast(manifest.select("bucket")), "bucket", "left_anti")


def write_manifest_entry(manifest_dir: str, bucket: int, n_turns: int,
                         n_spans: int, run_id: str) -> None:
    os.makedirs(manifest_dir, exist_ok=True)
    entry = {
        "bucket": bucket,
        "n_turns": n_turns,
        "n_spans": n_spans,
        "run_id": run_id,
        "completed_at": time.time(),
    }
    path = os.path.join(manifest_dir, f"bucket-{bucket:05d}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as handle:
        json.dump(entry, handle)
    os.replace(tmp, path)


def reconcile_orphans(output_dir: str, manifest_dir: str) -> list:
    """Commit rule: a bucket's data is visible iff its manifest entry
    exists. A crash between the parquet commit and the manifest write
    leaves orphan bucket directories; delete them on resume so the
    reprocessing append cannot duplicate rows. Returns deleted buckets."""
    import shutil

    done = set()
    if os.path.isdir(manifest_dir):
        for name in os.listdir(manifest_dir):
            if name.startswith("bucket-") and name.endswith(".json"):
                done.add(int(name[len("bucket-"):-len(".json")]))
    removed = []
    if os.path.isdir(output_dir):
        for entry in sorted(os.listdir(output_dir)):
            if not entry.startswith("bucket="):
                continue
            bucket = int(entry.split("=", 1)[1])
            if bucket not in done:
                shutil.rmtree(os.path.join(output_dir, entry))
                removed.append(bucket)
    return removed


def run_with_checkpoint(turns: DataFrame, output_dir: str, manifest_dir: str,
                        run_id: str, n_buckets: int = 64,
                        patterns: Optional[list] = None) -> dict:
    """Resumable extraction: process only pending buckets, write parquet per
    (bucket, run_id) partition, checkpoint each with counters. Returns a
    lineage dict.

    Exactly-once across crashes: orphan bucket data (committed parquet
    whose manifest never landed) is reconciled away before the anti-join,
    and per-bucket counters come from READING BACK the just-written
    partitions (pruned by the run_id partition column) instead of
    re-executing the expensive Python UDF stage a second time."""
    from .extraction import run_extraction

    spark = turns.sparkSession
    orphans = reconcile_orphans(output_dir, manifest_dir)
    bucketed = with_bucket(turns, n_buckets)
    manifest = completed_buckets(spark, manifest_dir)
    pending = pending_turns(bucketed, manifest)

    already_done = [row["bucket"] for row in manifest.collect()]

    stats: dict = {}
    if not pending.isEmpty():  # cheap: stops at the first anti-join row
        extracted = run_extraction(pending, patterns=patterns)
        (extracted
         .withColumn("spans", F.col("extraction.spans"))
         .withColumn("materials", F.col("extraction.materials"))
         .drop("extraction")
         .withColumn("run_id", F.lit(run_id))
         .write.mode("append").partitionBy("bucket", "run_id")
         .parquet(output_dir))

        # counters come from the pending buckets only: filtering on run_id
        # alone would, on a resume that REUSES a prior attempt's run_id,
        # also count that attempt's already-committed buckets as processed
        # this run (inflating turns_processed and double-listing buckets in
        # processed and skipped). already_done is the manifest read from
        # before this write, so the complement is exactly this run's work.
        written = spark.read.parquet(output_dir) \
            .where((F.col("run_id") == run_id)
                   & ~F.col("bucket").isin(already_done))
        per_bucket = (
            written.groupBy("bucket")
            .agg(F.count("*").alias("n_turns"),
                 F.sum(F.size("spans")).alias("n_spans"))
        )
        stats = {int(r["bucket"]): (int(r["n_turns"]), int(r["n_spans"] or 0))
                 for r in per_bucket.collect()}
    for bucket, (n_turns, n_spans) in sorted(stats.items()):
        write_manifest_entry(manifest_dir, bucket, n_turns, n_spans, run_id)

    lineage = {
        "run_id": run_id,
        "buckets_processed": sorted(stats),
        "buckets_skipped": sorted(already_done),
        "orphans_reconciled": sorted(orphans),
        "turns_processed": sum(v[0] for v in stats.values()),
        "spans_extracted": sum(v[1] for v in stats.values()),
    }
    lineage_path = os.path.join(manifest_dir, f"lineage-{run_id}.json")
    with open(lineage_path, "w") as handle:
        json.dump(lineage, handle, indent=2)
    return lineage
