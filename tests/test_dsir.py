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


@pytest.fixture(scope="module")
def classifier_dir(spark, tmp_path_factory):
    """Separable corpus for the perceptron: positives (eval partition)
    carry the target vocabulary; the raw pool is mostly off-vocabulary
    with two on-vocabulary docs the classifier should recover."""
    eval_ids = [i for i in range(400) if _is_eval(i)][:4]
    raw_ids = [i for i in range(400) if not _is_eval(i)]
    on_ids, off_ids = raw_ids[:2], raw_ids[2:12]
    rows = ([(i, TARGET_TEXT, "en", "fix", len(TARGET_TEXT))
             for i in eval_ids + on_ids]
            + [(i, OFF_TEXT, "en", "fix", len(OFF_TEXT))
               for i in off_ids])
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
              "n_chars bigint")
    path = tmp_path_factory.mktemp("qc")
    docs.write.mode("overwrite").parquet(str(path / "documents.parquet"))
    return str(path), set(eval_ids), set(on_ids), set(off_ids)


def test_classifier_separates_planted_vocabularies(spark, classifier_dir):
    """The synthetic driver corpus is NON-separable (the target
    partition is a random hash split), so the classifier correctly
    predicts nothing positive there — this fixture proves the
    perceptron actually learns when signal exists: on-vocabulary raw
    docs score positive, off-vocabulary docs negative."""
    path, eval_ids, on_ids, off_ids = classifier_dir
    rows = {r.doc_id: r for r in
            SPARK_QUERIES["quality_classifier"](spark, path).collect()}
    assert set(rows) == eval_ids | on_ids | off_ids
    for i in eval_ids | on_ids:
        assert rows[i].predicted_target, i
        assert rows[i].margin > 0
    for i in off_ids:
        assert not rows[i].predicted_target, i
        assert rows[i].margin < 0


def assert_documents_oracle_parity(spark, name: str, path: str) -> None:
    """Shared Spark-vs-DuckDB parity harness for fixture dirs holding
    only a documents table."""
    df = SPARK_QUERIES[name](spark, path)
    spark_rows = [tuple(r) for r in df.collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{path}/documents.parquet/*.parquet'")
    result = con.execute(ORACLE_SQL[name])
    oracle_rows = result.fetchall()
    oracle_cols = [d[0] for d in result.description]
    assert len(spark_rows) == len(oracle_rows)
    assert sorted(df.columns) == sorted(oracle_cols)
    assert value_hash(spark_rows, df.columns) == \
        value_hash(oracle_rows, oracle_cols)


def test_classifier_fixture_oracle_parity(spark, classifier_dir):
    assert_documents_oracle_parity(
        spark, "quality_classifier", classifier_dir[0])


def test_fixture_oracle_parity(spark, dsir_dir):
    assert_documents_oracle_parity(
        spark, "dsir_importance_weights", dsir_dir[0])
