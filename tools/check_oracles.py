"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet tables,
compare row count, schema width, and an order-insensitive value hash.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(value):
    import datetime
    import math
    if value is None:
        return "NULL"
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        return f"{value:.6f}"
    if isinstance(value, datetime.datetime):
        return value.replace(tzinfo=None).isoformat(sep=" ")
    return str(value)


def value_hash(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(
        "|".join(normalize(row[i]) for i in order) for row in rows
    )
    digest = hashlib.sha1()
    for line in lines:
        digest.update(line.encode("utf-8"))
        digest.update(b"\n")
    return digest.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_module
    from material_parsers_spark.pipeline.session import build_session

    spark = build_session(app_name="oracle-check", master="local[8]",
                          shuffle_partitions=8)
    con = duckdb.connect()
    for table in TABLES:
        con.execute(
            f"CREATE VIEW {table} AS SELECT * FROM '{sf_dir}/{table}.parquet'")

    spark_queries = entry_module.queries()
    oracles = entry_module.oracle_sql()

    # the driver-contract oracles pin the sf0.01 golden fixtures (the
    # driver's correctness scale); when this tool is pointed at another
    # scale with committed fixtures, swap the fixture path so the
    # comparison stays meaningful locally
    from material_parsers_spark.queries import (
        GOLDEN_ORACLE_FIXTURES,
        golden_path,
    )
    from material_parsers_spark.queries import (
        GOLDEN_INPUT_ORACLE_TEMPLATES,
    )
    sf_name = "sf" + sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    if sf_name != "sf0.01":
        import os
        for name, fixture in GOLDEN_ORACLE_FIXTURES.items():
            swapped = golden_path(sf_name, fixture)
            if name in oracles and os.path.exists(swapped):
                oracles[name] = f"SELECT * FROM read_parquet('{swapped}')"
        for name, (template, fixture) in \
                GOLDEN_INPUT_ORACLE_TEMPLATES.items():
            swapped = golden_path(sf_name, fixture)
            if name in oracles and os.path.exists(swapped):
                # literal replace, NOT str.format (regex braces in
                # the PII oracle would break format())
                oracles[name] = template.replace("{path}", swapped)

    failures = []
    for name, fn in spark_queries.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            spark_rows = [tuple(r) for r in df.collect()]
            spark_cols = df.columns
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error {exc}")
            failures.append(name)
            continue

        if name not in oracles:
            print(f"rows  {name}: {len(spark_rows)} rows (rows-only check)")
            continue

        try:
            result = con.execute(oracles[name])
            duck_cols = [d[0] for d in result.description]
            duck_rows = result.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error {exc}")
            failures.append(name)
            continue

        problems = []
        if len(spark_rows) != len(duck_rows):
            problems.append(
                f"rowcount {len(spark_rows)} vs {len(duck_rows)}")
        if sorted(c.lower() for c in spark_cols) != \
                sorted(c.lower() for c in duck_cols):
            problems.append(f"columns {spark_cols} vs {duck_cols}")
        if not problems:
            h1 = value_hash(spark_rows, [c.lower() for c in spark_cols])
            h2 = value_hash(duck_rows, [c.lower() for c in duck_cols])
            if h1 != h2:
                problems.append(f"value-hash {h1} vs {h2}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            failures.append(name)
        else:
            print(f"OK    {name}: {len(spark_rows)} rows match")

    print()
    if failures:
        print("FAILURES:", ", ".join(failures))
        sys.exit(1)
    print("all checks passed")


if __name__ == "__main__":
    main()
