"""Semantics of the dense-global-shuffle and tokenizer-induction
operators: the training order must be a dense permutation of [0, N)
matching a Python mirror of the (shard, hash, doc_id) total order, and
the BPE merge candidates must equal a brute-force pair count."""

from collections import Counter

import pytest

from material_parsers_spark.pipeline.session import build_session
from material_parsers_spark.queries import (
    _BPE_TOP_K,
    _ORDER_SHARDS,
    SPARK_QUERIES,
)
from tests.conftest import h60


@pytest.fixture(scope="module")
def spark():
    return build_session(app_name="order-tests", master="local[8]",
                         shuffle_partitions=8)


def test_training_order_is_a_dense_mirrored_permutation(spark, tmp_path):
    ids = [3, 17, 42, 100, 1001, 54321, 7, 8, 9, 10_000_019]
    docs = spark.createDataFrame([(i, "x", "en") for i in ids],
                                 "doc_id bigint, text string, lang string")
    base = tmp_path / "order"
    docs.write.mode("overwrite").parquet(str(base / "documents.parquet"))
    rows = SPARK_QUERIES["training_order"](spark, str(base)).collect()
    assert sorted(r.global_pos for r in rows) == list(range(len(ids)))
    expected = {
        doc_id: pos for pos, doc_id in enumerate(sorted(
            ids, key=lambda d: (h60(str(d)) % _ORDER_SHARDS,
                                h60(str(d)), d)))
    }
    assert {r.doc_id: r.global_pos for r in rows} == expected
    assert all(r.shard == h60(str(r.doc_id)) % _ORDER_SHARDS for r in rows)


def test_bpe_candidates_match_brute_force(spark, tmp_path):
    texts = ["abab abab cd", "abab xy xy  xy", "héé héé"]
    docs = spark.createDataFrame(
        [(i, t, "en") for i, t in enumerate(texts)],
        "doc_id bigint, text string, lang string")
    base = tmp_path / "bpe"
    docs.write.mode("overwrite").parquet(str(base / "documents.parquet"))
    rows = SPARK_QUERIES["bpe_merge_candidates"](spark, str(base)).collect()
    counter = Counter()
    for t in texts:
        for w in t.split(" "):
            for i in range(len(w) - 1):
                counter[w[i:i + 2]] += 1
    expected = sorted(counter.items(), key=lambda kv: (-kv[1], kv[0]))
    expected = expected[:_BPE_TOP_K]
    got = sorted(((r.pair, r.n_occurrences) for r in rows),
                 key=lambda kv: (-kv[1], kv[0]))
    assert got == expected
    # 'ab' dominates: 'abab' carries it twice per occurrence, 3 occ
    assert got[0] == ("ab", 6)
    # multi-byte pairs counted per CHARACTER, not per byte
    assert ("éé" in counter) and counter["hé"] == 2
