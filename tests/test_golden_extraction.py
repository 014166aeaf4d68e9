"""Golden-drift gate for the extraction path: every frozen-golden query's
live result at sf0.001 must hash-match its committed parquet fixture. A
failure here means a kernel change altered extraction output — either fix
the regression or, for a deliberate change, regenerate the fixtures with
`python tools/freeze_goldens.py` and commit them with the change."""

import duckdb
import pytest

from material_parsers_spark.pipeline.session import build_session
from material_parsers_spark.queries import (
    GOLDEN_QUERIES,
    SPARK_QUERIES,
    golden_path,
)
from tools.check_oracles import value_hash

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    return build_session(app_name="golden-drift", master="local[8]",
                         shuffle_partitions=8)


@pytest.mark.parametrize("name", GOLDEN_QUERIES)
def test_live_result_matches_frozen_golden(spark, name):
    df = SPARK_QUERIES[name](spark, SF_DIR)
    live_rows = [tuple(r) for r in df.collect()]

    result = duckdb.connect().execute(
        f"SELECT * FROM read_parquet('{golden_path('sf0.001', name)}')")
    golden_cols = [d[0] for d in result.description]
    golden_rows = result.fetchall()

    assert sorted(c.lower() for c in df.columns) == \
        sorted(c.lower() for c in golden_cols)
    assert len(live_rows) == len(golden_rows)
    assert value_hash(live_rows, [c.lower() for c in df.columns]) == \
        value_hash(golden_rows, [c.lower() for c in golden_cols])
