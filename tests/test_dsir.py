"""Planted fixture for DSIR importance weights: raw documents whose
hashed-ngram features match the target (eval-partition) vocabulary
must outscore raw documents drawn from a disjoint vocabulary, the
selected flag must pick exactly the top-K by (log_weight, doc_id),
eval documents must be absent from the row universe, and the DuckDB
oracle must agree on the fixture."""

import duckdb
import pytest

from material_parsers_spark.pipeline.session import build_session
from material_parsers_spark.queries import (
    _DSIR_TOP_K,
    ORACLE_SQL,
    SPARK_QUERIES,
)
from tests.conftest import h60
from tools.check_oracles import value_hash

TARGET_TEXT = "alpha beta gamma delta epsilon zeta eta theta"
OFF_TEXT = "zz1 zz2 zz3 zz4 zz5 zz6 zz7 zz8"


def _is_eval(doc_id: int) -> bool:
    return h60(str(doc_id)) % 20 == 0


@pytest.fixture(scope="module")
def spark():
    return build_session(app_name="dsir-tests", master="local[8]",
                         shuffle_partitions=8)


@pytest.fixture(scope="module")
def dsir_dir(spark, tmp_path_factory):
    eval_ids = [i for i in range(400) if _is_eval(i)][:4]
    raw_ids = [i for i in range(400) if not _is_eval(i)]
    on_ids, off_ids = raw_ids[:6], raw_ids[6:12]
    rows = ([(i, TARGET_TEXT, "en", "fix", len(TARGET_TEXT))
             for i in eval_ids + on_ids]
            + [(i, OFF_TEXT, "en", "fix", len(OFF_TEXT))
               for i in off_ids])
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
              "n_chars bigint")
    path = tmp_path_factory.mktemp("dsir")
    docs.write.mode("overwrite").parquet(str(path / "documents.parquet"))
    return str(path), set(on_ids), set(off_ids)


def test_target_vocab_outscores_disjoint_vocab(spark, dsir_dir):
    path, on_ids, off_ids = dsir_dir
    rows = {r.doc_id: r for r in
            SPARK_QUERIES["dsir_importance_weights"](spark, path).collect()}
    # eval docs define the target model; they are not scored rows
    assert set(rows) == on_ids | off_ids
    worst_on = min(rows[i].log_weight for i in on_ids)
    best_off = max(rows[i].log_weight for i in off_ids)
    assert worst_on > best_off
    # 12 raw docs < top-K, so everything is selected here; the ranking
    # itself is pinned by the ordering assertion above
    assert _DSIR_TOP_K >= 12
    assert all(r.selected for r in rows.values())


def test_fixture_oracle_parity(spark, dsir_dir):
    path, _, _ = dsir_dir
    df = SPARK_QUERIES["dsir_importance_weights"](spark, path)
    spark_rows = [tuple(r) for r in df.collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{path}/documents.parquet/*.parquet'")
    result = con.execute(ORACLE_SQL["dsir_importance_weights"])
    oracle_rows = result.fetchall()
    oracle_cols = [d[0] for d in result.description]
    assert len(spark_rows) == len(oracle_rows)
    assert sorted(df.columns) == sorted(oracle_cols)
    assert value_hash(spark_rows, df.columns) == \
        value_hash(oracle_rows, oracle_cols)
