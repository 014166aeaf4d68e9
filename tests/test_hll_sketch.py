"""hll_distinct_ngrams: accuracy in the n >> m regime it targets,
bounded register state, and bit-for-bit determinism across runs."""

import pytest

from material_parsers_spark.pipeline.session import build_session
from material_parsers_spark.queries import _HLL_M, SPARK_QUERIES


@pytest.fixture(scope="module")
def spark():
    return build_session(app_name="hll-tests", master="local[4]",
                         shuffle_partitions=4)


def _row(spark, sf_dir):
    rows = SPARK_QUERIES["hll_distinct_ngrams"](spark, sf_dir).collect()
    assert len(rows) == 1
    return rows[0]


def test_estimate_accuracy_in_target_regime(spark):
    """sf0.01: ~20k distinct 13-grams vs 2048 registers (n/m ~ 10).
    The raw HLL standard error is 1.04/sqrt(m) ~ 2.3%; assert a
    generous 4-sigma bound so the test pins accuracy, not luck."""
    r = _row(spark, "/root/testdata/sf0.01")
    assert r.m == _HLL_M
    assert 0 < r.n_filled <= _HLL_M
    assert r.true_distinct > 5 * _HLL_M          # genuinely n >> m
    assert abs(r.rel_error) < 4 * 1.04 / (_HLL_M ** 0.5)


def test_estimate_is_deterministic(spark):
    a = _row(spark, "/root/testdata/sf0.001")
    b = _row(spark, "/root/testdata/sf0.001")
    assert (a.estimate, a.n_filled, a.true_distinct) \
        == (b.estimate, b.n_filled, b.true_distinct)


def test_planted_high_cardinality_corpus(spark, tmp_path):
    """5 docs x ~2,000 unique sliding 13-grams each (disjoint
    vocabularies): ~10k distinct grams, n/m ~ 5 — the estimator must
    land within the same 4-sigma band."""
    docs = []
    for d in range(5):
        words = " ".join(f"w{d}_{i}" for i in range(2012))
        docs.append((d, words))
    frame = spark.createDataFrame(docs, "doc_id long, text string")
    frame.toPandas().to_parquet(f"{tmp_path}/documents.parquet",
                                index=False)
    r = _row(spark, str(tmp_path))
    assert r.true_distinct == 5 * 2000
    assert abs(r.rel_error) < 4 * 1.04 / (_HLL_M ** 0.5)
