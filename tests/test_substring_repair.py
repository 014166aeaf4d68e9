"""Planted fixture for cross-document repeated-substring repair: a
passage shared by two documents must survive only in the min-doc_id
owner (window union covering the whole passage elsewhere), a
within-document repeat must keep its first copy only, unique documents
must be untouched, sub-25-word documents must be absent from the row
universe, and the DuckDB oracle must agree on the fixture."""

import duckdb
import pytest

from material_parsers_spark.pipeline.session import build_session
from material_parsers_spark.queries import (
    ORACLE_SQL,
    dedup_substrings,
    _substring_repair_oracle_sql,
)
from tests.conftest import h60
from tools.check_oracles import value_hash

PASSAGE = " ".join(f"p{i}" for i in range(30))       # 30 words
REPEAT = " ".join(f"x{i}" for i in range(25))        # 25 words


@pytest.fixture(scope="module")
def spark():
    return build_session(app_name="substring-repair-tests",
                         master="local[8]", shuffle_partitions=8)


@pytest.fixture(scope="module")
def repair_rows(spark):
    rows = [
        # owner of the shared passage: untouched
        (1, PASSAGE + " one-a one-b one-c one-d one-e"),
        # same passage, larger doc_id: loses all 30 passage words
        (2, PASSAGE + " two-a two-b two-c two-d two-e"),
        # 25 unique words: no repeats anywhere
        (3, " ".join(f"solo{i}" for i in range(25))),
        # under 25 words: outside the row universe
        (4, "short doc"),
        # within-doc repeat: second copy excised, first kept
        (5, REPEAT + " " + REPEAT),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    return docs, {r.doc_id: r for r in dedup_substrings(docs).collect()}


def test_repair_semantics(repair_rows):
    _, rows = repair_rows
    assert set(rows) == {1, 2, 3, 5}      # doc 4 is under 25 words
    # the owner keeps everything, including the shared passage
    assert rows[1].n_dup_windows == 0
    assert rows[1].n_removed_words == 0
    assert rows[1].cleaned_hash == h60(
        PASSAGE + " one-a one-b one-c one-d one-e")
    # the non-owner loses the full 30-word passage: 6 repeated grams
    # at starts 0..5 whose windows union to positions 0..29
    assert rows[2].n_dup_windows == 6
    assert rows[2].n_removed_words == 30
    assert rows[2].removed_frac == pytest.approx(30 / 35, abs=1e-6)
    assert rows[2].cleaned_hash == h60("two-a two-b two-c two-d two-e")
    # unique doc untouched
    assert rows[3].n_removed_words == 0
    # within-doc repeat: one repeated gram (start 25), window 25..49
    assert rows[5].n_dup_windows == 1
    assert rows[5].n_removed_words == 25
    assert rows[5].cleaned_hash == h60(REPEAT)


def test_fixture_oracle_parity(repair_rows, tmp_path):
    docs, _ = repair_rows
    path = str(tmp_path / "docs.parquet")
    docs.write.mode("overwrite").parquet(path)
    df = dedup_substrings(docs)
    spark_rows = [tuple(r) for r in df.collect()]
    con = duckdb.connect()
    sql = _substring_repair_oracle_sql(
        f"SELECT doc_id, string_split(text, ' ') AS w "
        f"FROM read_parquet('{path}/*.parquet')")
    result = con.execute(sql)
    oracle_rows = result.fetchall()
    oracle_cols = [d[0] for d in result.description]
    assert len(spark_rows) == len(oracle_rows)
    assert sorted(df.columns) == sorted(oracle_cols)
    assert value_hash(spark_rows, df.columns) == \
        value_hash(oracle_rows, oracle_cols)


def test_string_ids_owner_is_byte_min_composite_key(spark, tmp_path):
    """The string_ids path (conversation chunk keys): the canonical
    owner is the byte-wise min composite key, so the lexicographically
    smallest id keeps the passage; and the DuckDB mirror agrees."""
    rows = [
        ("z-chunk#000001", PASSAGE + " z-a z-b z-c z-d z-e"),
        ("a-chunk#000002", PASSAGE + " a-a a-b a-c a-d a-e"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r.doc_id: r for r in
           dedup_substrings(docs, string_ids=True).collect()}
    assert out["a-chunk#000002"].n_removed_words == 0
    assert out["z-chunk#000001"].n_removed_words == 30
    assert out["z-chunk#000001"].cleaned_hash == h60("z-a z-b z-c z-d z-e")

    path = str(tmp_path / "docs.parquet")
    docs.write.mode("overwrite").parquet(path)
    df = dedup_substrings(docs, string_ids=True)
    spark_rows = [tuple(r) for r in df.collect()]
    con = duckdb.connect()
    sql = _substring_repair_oracle_sql(
        f"SELECT doc_id, string_split(text, ' ') AS w "
        f"FROM read_parquet('{path}/*.parquet')", string_ids=True)
    result = con.execute(sql)
    oracle_rows = result.fetchall()
    oracle_cols = [d[0] for d in result.description]
    assert value_hash(spark_rows, df.columns) == \
        value_hash(oracle_rows, oracle_cols)


def test_occ_key_packing_bound_is_enforced(spark, monkeypatch):
    """A document longer than the packing stride must FAIL the job
    (assert_true), never silently collide owner keys into the next
    doc_id. Exercised by shrinking the stride below the fixture's
    positions."""
    import material_parsers_spark.queries as q
    monkeypatch.setattr(q, "_OCC_STRIDE", 4)
    docs = spark.createDataFrame(
        [(1, PASSAGE + " t1 t2 t3 t4 t5"),
         (2, PASSAGE + " u1 u2 u3 u4 u5")],
        "doc_id bigint, text string")
    with pytest.raises(Exception, match="is not true"):
        dedup_substrings(docs).collect()


def test_registered_oracle_present():
    assert "dedup_substring_repair" in ORACLE_SQL
    assert "conversation_substring_repair" in ORACLE_SQL
