"""token_length_quantiles: the histogram method must equal the type-1
quantile of the fully-sorted data (smallest value whose cumulative
count reaches ceil(num*N/den)), on a planted multiset with ties and on
the synthetic corpus."""

# integer ceil below; no float math needed

import pytest

from material_parsers_spark.pipeline.session import build_session
from material_parsers_spark.queries import _QUANTILES, SPARK_QUERIES


@pytest.fixture(scope="module")
def spark():
    return build_session(app_name="quantile-tests", master="local[4]",
                         shuffle_partitions=4)


def _ref(values, num, den):
    s = sorted(values)
    k = (num * len(s) + den - 1) // den   # integer ceil, like the op
    return s[k - 1]


def _run(spark, sf_dir):
    return {r.quantile: r.n_tokens for r in
            SPARK_QUERIES["token_length_quantiles"](
                spark, sf_dir).collect()}


def test_matches_sorted_reference_on_planted_multiset(spark, tmp_path):
    # heavy ties and a skewed tail: 60 one-word docs, 30 ten-word,
    # 9 hundred-word, 1 thousand-word
    docs = ([("x " * 1).strip()] * 60 + [("x " * 10).strip()] * 30
            + [("x " * 100).strip()] * 9 + [("x " * 1000).strip()])
    frame = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string")
    frame.toPandas().to_parquet(f"{tmp_path}/documents.parquet",
                                index=False)
    got = _run(spark, str(tmp_path))
    lengths = [1] * 60 + [10] * 30 + [100] * 9 + [1000]
    for label, num, den in _QUANTILES:
        assert got[label] == _ref(lengths, num, den), label
    assert got["p50"] == 1 and got["p99"] == 100 and len(got) == 5


def test_matches_sorted_reference_on_corpus(spark):
    sf_dir = "/root/testdata/sf0.001"
    got = _run(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lengths = [len(r.text.split()) for r in docs.collect()
               if r.text.strip()]
    for label, num, den in _QUANTILES:
        assert got[label] == _ref(lengths, num, den), label
    assert got["p25"] <= got["p50"] <= got["p75"] \
        <= got["p90"] <= got["p99"]
