"""bloom_decon_prefilter: the Bloom contract (no false negatives —
bloom hits always cover true hits), planted full-containment
detection, and the measured false-positive margin staying sane."""

import pytest

from material_parsers_spark.pipeline.session import build_session
from material_parsers_spark.queries import SPARK_QUERIES

from tests.conftest import h60


@pytest.fixture(scope="module")
def spark():
    return build_session(app_name="bloom-tests", master="local[4]",
                         shuffle_partitions=4)


def _ids(pred, n, start=0):
    out, i = [], start
    while len(out) < n:
        if pred(h60(str(i)) % 20 == 0):
            out.append(i)
        i += 1
    return out


def test_no_false_negatives_on_corpus(spark):
    rows = SPARK_QUERIES["bloom_decon_prefilter"](
        spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r.n_grams >= r.n_bloom_hits >= r.n_true_hits >= 0, r


def test_planted_contamination_is_fully_detected(spark, tmp_path):
    (ev_id,) = _ids(lambda e: e, 1)              # hash -> eval split
    clean_ids = _ids(lambda e: not e, 2)
    leaked = " ".join(f"secret{i}" for i in range(20))   # 8 13-grams
    clean = " ".join(f"plain{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(ev_id, leaked),
         (clean_ids[0], leaked + " " + clean),   # contains the eval doc
         (clean_ids[1], clean)],                 # unrelated
        "doc_id bigint, text string")
    docs.toPandas().to_parquet(f"{tmp_path}/documents.parquet",
                               index=False)
    out = {r.doc_id: r for r in SPARK_QUERIES["bloom_decon_prefilter"](
        spark, str(tmp_path)).collect()}
    assert set(out) == set(clean_ids)            # eval doc not reported
    hit = out[clean_ids[0]]
    # every one of the eval doc's 8 grams appears verbatim -> true
    # hits == 8, and bloom (no false negatives) reports at least that
    assert hit.n_true_hits == 8
    assert hit.n_bloom_hits >= 8
    miss = out[clean_ids[1]]
    assert miss.n_true_hits == 0
    # 32 eval-gram bits in 65,536: false positives are possible but a
    # clean 18-gram doc lighting up ALL its grams would mean the
    # filter is broken
    assert miss.n_bloom_hits < miss.n_grams or miss.n_grams == 0
