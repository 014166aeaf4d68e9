"""Freeze the extraction-path query outputs as golden parquet fixtures.

The turns corpus is a pure function of its size, so each extraction
query's full result set is deterministic per scale factor. This tool runs
every GOLDEN_QUERIES entry at sf0.001 (the fast drift-test scale) and
sf0.01 (the driver's correctness scale) and writes each result as ONE
parquet file under material_parsers_spark/resources/golden/<sf>/ — the
DuckDB oracles read these back for row-level hash comparison against the
live Spark results.

Run after any DELIBERATE change to the extraction kernels
(tagger/gazetteer/materials/formulas/linker) and commit the regenerated
fixtures together with the kernel change; an un-regenerated golden makes
the sf0.001 drift test (tests/test_golden_extraction.py) fail loudly.

Results are written through Spark (coalesce(1)) so the parquet types are
exactly the query output types the driver will compare.
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIRS = {
    "sf0.001": "/root/testdata/sf0.001",
    "sf0.01": "/root/testdata/sf0.01",
}


def freeze(spark, sf_name: str, sf_dir: str, only=()) -> None:
    from material_parsers_spark.queries import (
        GOLDEN_QUERIES,
        SPARK_QUERIES,
        golden_path,
    )

    unknown = set(only) - set(GOLDEN_QUERIES)
    assert not unknown, f"not golden queries: {sorted(unknown)}"
    for name in GOLDEN_QUERIES:
        if only and name not in only:
            continue
        target = golden_path(sf_name, name)
        os.makedirs(os.path.dirname(target), exist_ok=True)
        staging = tempfile.mkdtemp(prefix=f"golden-{name}-")
        try:
            out_dir = os.path.join(staging, "out")
            SPARK_QUERIES[name](spark, sf_dir) \
                .coalesce(1).write.mode("overwrite").parquet(out_dir)
            part = glob.glob(os.path.join(out_dir, "part-*.parquet"))
            assert len(part) == 1, part
            shutil.copyfile(part[0], target)
        finally:
            shutil.rmtree(staging, ignore_errors=True)
        size_kb = os.path.getsize(target) // 1024
        print(f"frozen {sf_name}/{name}.parquet ({size_kb} KiB)")


def main() -> None:
    from material_parsers_spark.pipeline.session import build_session

    spark = build_session(app_name="freeze-goldens", master="local[8]",
                         shuffle_partitions=8)
    only = tuple(sys.argv[1:])   # optional query subset
    for sf_name, sf_dir in SF_DIRS.items():
        freeze(spark, sf_name, sf_dir, only=only)


if __name__ == "__main__":
    main()
