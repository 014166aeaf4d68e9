"""Count-Min Sketch operator: the CMS guarantee (estimate >= true,
over-estimation only), exact estimates when the sketch is collision-
free, planted-collision behavior, and bounded sketch size."""

import pytest

from material_parsers_spark.pipeline.session import build_session
from material_parsers_spark.queries import _CMS_D, _CMS_W, SPARK_QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    return build_session(app_name="cms-tests", master="local[4]",
                         shuffle_partitions=4)


def test_cms_never_underestimates(spark):
    rows = SPARK_QUERIES["cms_word_counts"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.cms_estimate >= r.true_count, r


def test_cms_exact_on_sparse_vocabulary(spark, tmp_path):
    """11 distinct planted words into 4x1024 counters: collisions are
    possible but an estimate can only inflate by a FULL colliding
    word's count; with every word's count below the planted heavy
    hitter, the heavy hitter's estimate identifies it regardless."""
    text = " ".join(["heavy"] * 50 + [f"w{i}" for i in range(10)])
    docs = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    rows = {r.word: r for r in SPARK_QUERIES["cms_word_counts"](
        spark, str(tmp_path)).collect()}
    assert rows["heavy"].true_count == 50
    assert rows["heavy"].cms_estimate >= 50
    # every other word is rare; even with a collision against another
    # rare word its estimate stays far below the heavy hitter's
    others = [r for w, r in rows.items() if w != "heavy"]
    assert all(r.cms_estimate < 50 for r in others)
    # top-32 probe covers the whole 11-word vocabulary here
    assert len(rows) == 11


def test_operator_sketch_state_is_bounded(spark, tmp_path):
    """The OPERATOR'S OWN sketch frame (cms_sketch — the exact build
    cms_word_counts probes) must stay within d*w rows even when the
    vocabulary is far larger than the sketch: 10,000 distinct words
    into 4x1024 counters. A build whose state grew with vocabulary
    (e.g. keyed by word) would fail this at 10k."""
    from pyspark.sql import functions as F
    from material_parsers_spark.queries import cms_sketch

    text = " ".join(f"word{i}" for i in range(10_000))
    docs = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    words = (docs.select(F.explode(F.split("text", " ")).alias("w"))
             .where(F.col("w") != ""))
    sketch = cms_sketch(words)
    assert sketch.count() <= _CMS_D * _CMS_W
    # and the counters account for every (word, seed) occurrence
    total = sketch.groupBy().sum("c").collect()[0][0]
    assert total == 10_000 * _CMS_D


def test_top_k_cut_is_deterministic_across_engines(spark, tmp_path):
    """_CMS_TOP smaller than the vocabulary, with a COUNT TIE
    straddling rank 32: the (count desc, word asc) tie-break must pick
    the same words on both engines — the cut behavior the driver
    corpus (31 distinct words) never exercises."""
    import duckdb

    from material_parsers_spark.queries import ORACLE_SQL, SPARK_QUERIES

    # words t00..t39 all count 2 (tie spans the rank-32 boundary),
    # plus 5 heavy words
    body = " ".join(f"t{i:02d} t{i:02d}" for i in range(40))
    heavy = " ".join(f"h{i} h{i} h{i}" for i in range(5))
    docs = spark.createDataFrame(
        [(1, body), (2, heavy)], "doc_id bigint, text string")
    sf_dir = str(tmp_path)
    docs.toPandas().to_parquet(f"{sf_dir}/documents.parquet", index=False)

    srows = sorted(tuple(r) for r in SPARK_QUERIES["cms_word_counts"](
        spark, sf_dir).collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet("
                f"'{sf_dir}/documents.parquet')")
    orows = sorted(con.execute(ORACLE_SQL["cms_word_counts"]).fetchall())
    assert srows == orows
    words = [r[0] for r in srows]
    assert len(words) == 32
    # 5 heavies + the 27 asc-first tied words survive the cut
    assert all(f"h{i}" in words for i in range(5))
    assert f"t{26:02d}" in words and f"t{27:02d}" not in words
