"""Planted fixture for line-dedup repair: cross-document duplicate
lines must be excised everywhere except the canonical (min doc_id)
owner, empty lines must survive as structure, within-document repeats
without a cross-document twin must be untouched, a fully-duplicated
document must rebuild to the empty string, and the DuckDB oracle must
agree on the fixture."""

import duckdb
import pytest

from material_parsers_spark.pipeline.session import build_session
from material_parsers_spark.queries import (
    ORACLE_SQL,
    line_dedup_repair,
    _line_repair_oracle_sql,
)
from tests.conftest import h60
from tools.check_oracles import value_hash


@pytest.fixture(scope="module")
def spark():
    return build_session(app_name="line-repair-tests", master="local[8]",
                         shuffle_partitions=8)


@pytest.fixture(scope="module")
def repair_rows(spark):
    rows = [
        (1, "shared\nonly-one"),        # owner of "shared": untouched
        (2, "shared\nonly-two"),        # loses "shared" to doc 1
        (3, "solo"),                    # no duplicates anywhere
        (4, "shared\n\nkeep-four"),     # duplicate + EMPTY line kept
        (5, "shared"),                  # fully duplicated -> empty text
        (6, "twice\ntwice"),            # within-doc repeat, no twin
        (7, "both\nboth"),              # owner keeps BOTH copies
        (8, "both\ntail-eight"),        # non-owner loses its one copy
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    return docs, {r.doc_id: r for r in line_dedup_repair(docs).collect()}


def test_repair_semantics(repair_rows):
    _, rows = repair_rows
    assert rows[1].n_removed_lines == 0
    assert rows[1].cleaned_hash == h60("shared\nonly-one")
    assert rows[2].n_removed_lines == 1
    assert rows[2].cleaned_hash == h60("only-two")
    assert rows[3].n_removed_lines == 0
    # empty line survives; the duplicate before it is excised
    assert rows[4].n_removed_lines == 1
    assert rows[4].cleaned_hash == h60("\nkeep-four")
    # full removal rebuilds to the empty string
    assert (rows[5].n_removed_lines, rows[5].removed_frac) == (1, 1.0)
    assert rows[5].cleaned_hash == h60("")
    # within-doc repetition with no cross-doc twin is not touched
    assert rows[6].n_removed_lines == 0
    assert rows[6].cleaned_hash == h60("twice\ntwice")
    # the owner keeps every copy; the non-owner loses its one
    assert rows[7].n_removed_lines == 0
    assert rows[7].cleaned_hash == h60("both\nboth")
    assert rows[8].n_removed_lines == 1
    assert rows[8].cleaned_hash == h60("tail-eight")


def test_fixture_oracle_parity(repair_rows, tmp_path):
    docs, _ = repair_rows
    path = str(tmp_path / "docs.parquet")
    docs.write.mode("overwrite").parquet(path)
    df = line_dedup_repair(docs)
    spark_rows = [tuple(r) for r in df.collect()]
    con = duckdb.connect()
    sql = _line_repair_oracle_sql(
        f"SELECT doc_id, text FROM read_parquet('{path}/*.parquet')")
    result = con.execute(sql)
    oracle_rows = result.fetchall()
    oracle_cols = [d[0] for d in result.description]
    assert len(spark_rows) == len(oracle_rows)
    assert sorted(df.columns) == sorted(oracle_cols)
    assert value_hash(spark_rows, df.columns) == \
        value_hash(oracle_rows, oracle_cols)


def test_registered_conversation_oracle_present():
    assert "conversation_line_repair" in ORACLE_SQL
