"""Semantics of the CCNet bucket and boilerplate-census operators:
buckets must partition the scored universe with tercile-balanced
counts under the independent cutoff sample, bucket assignment must be
monotone in perplexity, and top_ngrams must order by (count desc,
gram asc) with exact counts on a planted corpus."""

import pytest

from material_parsers_spark.pipeline.session import build_session
from material_parsers_spark.queries import SPARK_QUERIES, _read

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    return build_session(app_name="ppl-bucket-tests", master="local[8]",
                         shuffle_partitions=8)


def test_buckets_partition_and_are_monotone(spark):
    rows = SPARK_QUERIES["perplexity_buckets"](spark, SF_DIR).collect()
    scored = _read(spark, SF_DIR, "documents").where(
        "size(split(text, ' ')) >= 2").count()
    assert len(rows) == scored
    order = {"head": 0, "middle": 1, "tail": 2}
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, []).append(r.lm_perplexity)
    assert set(by_bucket) == {"head", "middle", "tail"}
    # monotone: every head perplexity <= every middle <= every tail
    assert max(by_bucket["head"]) <= min(by_bucket["middle"])
    assert max(by_bucket["middle"]) <= min(by_bucket["tail"])
    # the independent cutoff sample keeps the split roughly tercile
    # (the LM-train-doc sample skewed this 46/60/394 before the fix)
    for bucket in order:
        assert len(by_bucket[bucket]) > 0.15 * scored


def test_top_ngrams_counts_and_order_on_planted_corpus(spark, tmp_path):
    rows = [
        (1, "a b c d e f"),        # grams: "a b c d e", "b c d e f"
        (2, "a b c d e"),          # repeats "a b c d e"
        (3, "a b c d e"),          # and again
        (4, "x y z"),              # under 5 words: no grams
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = SPARK_QUERIES["top_ngrams"](spark, str(tmp_path)).collect()
    assert [(r.ngram, r.n_occ, r.n_docs) for r in out] == [
        ("a b c d e", 3, 3), ("b c d e f", 1, 1)]
