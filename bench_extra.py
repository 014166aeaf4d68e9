"""Extra measurement harness for the optimization rounds (guide §1.4).

bench.py is FROZEN for driver measurement; this file hosts the working
benches: per-query noop-sink isolation, configurable reps, and
explain("formatted") capture.

Usage:
  SPARK_GRAFT_SF_DIR=... python bench_extra.py q1,q2 [--reps N] [--plans DIR]

Prints one JSON line {"queries": {...}, "samples": {...}, "sf_dir": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> None:
    names = sys.argv[1].split(",") if len(sys.argv) > 1 else []
    reps = 3
    plans_dir = None
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    if "--plans" in sys.argv:
        plans_dir = sys.argv[sys.argv.index("--plans") + 1]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from material_parsers_spark.pipeline.session import build_session
    from material_parsers_spark.queries import SPARK_QUERIES

    spark = build_session(app_name="bench_extra",
                          master=f"local[{cpus}]", shuffle_partitions=cpus)
    # JVM warm-up, mirrors bench.py's methodology
    SPARK_QUERIES["stable_ordering"](spark, sf_dir).limit(1).collect()

    if not names:
        names = list(SPARK_QUERIES)

    timings, samples = {}, {}
    for name in names:
        fn = SPARK_QUERIES[name]
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            with open(f"{plans_dir}/{name}.txt", "w") as fh:
                fh.write(fn(spark, sf_dir)._jdf.queryExecution()
                         .explainString(
                             spark._jvm.org.apache.spark.sql.execution
                             .ExplainMode.fromString("formatted")))
        rs = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            rs.append(round(time.time() - t0, 3))
        samples[name] = rs
        timings[name] = min(rs)
    print(json.dumps({"queries": timings, "samples": samples,
                      "sf_dir": sf_dir, "cpus": cpus}))


if __name__ == "__main__":
    main()
