"""tool_output_stats: planted-JSON semantics, malformed-payload parity
(the NULL-on-malformed contract on BOTH engines), and Spark/DuckDB
oracle parity on a custom fixture via the re-rendered template."""

import os

import duckdb
import pytest

from material_parsers_spark.pipeline.session import build_session
from material_parsers_spark.queries import (
    GOLDEN_INPUT_ORACLE_TEMPLATES,
    tool_output_rollup,
)
from tools.check_oracles import value_hash


@pytest.fixture(scope="module")
def spark():
    return build_session(app_name="tool-output-tests", master="local[4]",
                         shuffle_partitions=4)


ROWS = [
    ("c1", 0, "tool", 'tool output: {"status": "ok", "rows": 7, '
                      '"table": "alpha"}'),
    ("c1", 1, "tool", 'tool output: {"status": "ok", "rows": 3, '
                      '"table": "alpha"}'),
    ("c1", 2, "tool", 'tool output: {"status": "error", "rows": 0, '
                      '"table": "beta"}'),
    # malformed payload: must land in the NULL table_name group with
    # n_ok 0, never abort either engine
    ("c2", 0, "tool", "tool output: truncated {not json"),
    # non-tool-output turns are out of scope entirely
    ("c2", 1, "user", "please run the query"),
]


@pytest.fixture(scope="module")
def turns(spark):
    return spark.createDataFrame(
        ROWS, "conv_id string, turn_idx int, role string, text string")


def test_rollup_per_table_counts(spark, turns):
    out = {r.table_name: r for r in tool_output_rollup(turns).collect()}
    a = out["alpha"]
    assert (a.n_calls, a.n_ok, a.total_rows) == (2, 2, 10)
    assert (a.min_rows, a.max_rows, a.avg_rows) == (3, 7, 5.0)
    b = out["beta"]
    assert (b.n_calls, b.n_ok, b.total_rows) == (1, 0, 0)


def test_malformed_payload_groups_as_null_with_zero_ok(spark, turns):
    out = {r.table_name: r for r in tool_output_rollup(turns).collect()}
    bad = out[None]
    assert (bad.n_calls, bad.n_ok) == (1, 0)
    assert bad.total_rows is None and bad.avg_rows is None


def test_oracle_parity_including_malformed_payload(spark, turns,
                                                   tmp_path_factory):
    """The DuckDB template must not throw on the malformed blob
    (json_valid gate) and must hash-match Spark row for row."""
    fixture = str(tmp_path_factory.mktemp("turns") / "turns.parquet")
    turns.toPandas().to_parquet(fixture, index=False)
    template, _ = GOLDEN_INPUT_ORACLE_TEMPLATES["tool_output_stats"]
    sql = template.replace("{path}", fixture)
    oracle = duckdb.connect().execute(sql)
    o_cols = [d[0] for d in oracle.description]
    o_rows = oracle.fetchall()
    s_df = tool_output_rollup(turns)
    s_rows = [tuple(r) for r in s_df.collect()]
    assert len(s_rows) == len(o_rows) == 3
    assert value_hash(s_rows, s_df.columns) == value_hash(o_rows, o_cols)
