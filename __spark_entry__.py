"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship extraction on sf0.001-scale data;
``queries``/``oracle_sql`` expose the operator suite from SURVEY.md §2 plus
the training-data operators (dedup, similarity search, text analysis,
multimodal plumbing). Every query carries a DuckDB oracle: the UDF-driven
extraction queries use frozen-golden parquet fixtures (row-level
hash-checkable; see the golden block at the end of
material_parsers_spark/queries.py), everything else an equivalent SQL
re-expression.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the driver may import this module from any working directory
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-turn material extraction at sf0.001 scale."""
    from material_parsers_spark.queries import SPARK_QUERIES

    return SPARK_QUERIES["extract_materials"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from material_parsers_spark.queries import SPARK_QUERIES

    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    from material_parsers_spark.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
