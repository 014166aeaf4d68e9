"""Mass-duplicate stress fixture: 1,000 identical documents (the web-data
worst case) through both MinHash queries, with the DuckDB oracle run on
the same parquet — verifying the bounded pair expansion and the O(n)
representative-edge components path stay correct AND bounded."""

import duckdb
import pytest

from material_parsers_spark.pipeline.session import build_session
from material_parsers_spark.queries import ORACLE_SQL, SPARK_QUERIES
from tools.check_oracles import value_hash


@pytest.fixture(scope="module")
def spark():
    return build_session(app_name="dedup-stress", master="local[8]",
                         shuffle_partitions=8)


@pytest.fixture(scope="module")
def stress_dir(spark, tmp_path_factory):
    """documents.parquet with 1,000 byte-identical docs + 50 distinct."""
    base = tmp_path_factory.mktemp("stress")
    dup_text = ("the exact same duplicated web page text appears here "
                "again and again across the crawl")
    # identical lang + identical length -> ALL 1,000 dups share one
    # (lang, len_bucket) ngram-jaccard block as well as every minhash band
    rows = [(i, dup_text, "en", len(dup_text)) for i in range(1000)]
    # every shingle of a distinct doc embeds i, so none are near-dups
    rows += [(1000 + i,
              f"doc{i} alpha{i} beta{i} gamma{i} delta{i} epsilon{i}",
              "en",
              len(f"doc{i} alpha{i} beta{i} gamma{i} delta{i} epsilon{i}"))
             for i in range(50)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, n_chars bigint")
    df.write.mode("overwrite").parquet(str(base / "documents.parquet"))
    return str(base)


def _oracle_rows(sql: str, sf_dir: str):
    con = duckdb.connect()
    # Spark writes documents.parquet as a directory of part files
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet/*.parquet'")
    result = con.execute(sql)
    return result.fetchall(), [d[0] for d in result.description]


def test_minhash_pairs_capped_and_oracle_green(spark, stress_dir):
    df = SPARK_QUERIES["dedup_minhash_lsh"](spark, stress_dir)
    rows = df.collect()
    # 1,000 identical docs share every band bucket; uncapped expansion
    # would emit C(1000,2) = 499,500 pairs in ONE task. The 32-member cap
    # bounds it to C(32,2) = 496 pairs (the 50 distinct docs share no
    # shingles, so they pair with nothing).
    assert len(rows) == 496
    assert all(r.n_shared_bands == 4 for r in rows)

    expected, columns = _oracle_rows(ORACLE_SQL["dedup_minhash_lsh"],
                                     stress_dir)
    assert len(expected) == 496
    assert value_hash([tuple(r) for r in rows], df.columns) == \
        value_hash(expected, columns)


def test_ngram_jaccard_blocks_capped_and_oracle_green(spark, stress_dir):
    """All 1,000 identical docs share one (lang, len_bucket) block; the
    rank-window cap bounds the in-block expansion to C(32,2) = 496 pairs
    exactly like the minhash path (uncapped would be 499,500 pairs in one
    task). The 50 distinct docs share no shingles, so no pair of them
    clears the 0.5 jaccard threshold."""
    df = SPARK_QUERIES["dedup_ngram_jaccard"](spark, stress_dir)
    rows = df.collect()
    assert len(rows) == 496
    assert all(r.jaccard == 1.0 for r in rows)
    assert {r.doc_a for r in rows} | {r.doc_b for r in rows} == set(range(32))

    expected, columns = _oracle_rows(ORACLE_SQL["dedup_ngram_jaccard"],
                                     stress_dir)
    assert len(expected) == 496
    assert value_hash([tuple(r) for r in rows], df.columns) == \
        value_hash(expected, columns)


def test_min_label_propagation_converges_past_15_rounds(spark):
    """A path graph of 20 nodes has diameter 19: min-label propagation
    moves label 0 ONE hop per round, so the old fixed 15-round loop
    exits unconverged with wrong cluster ids. The loop must run to
    convergence."""
    from material_parsers_spark.queries import propagate_min_labels

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(19)], "a bigint, b_ bigint")
    labels = {r.doc: r.label for r in propagate_min_labels(edges).collect()}
    assert labels == {i: 0 for i in range(20)}


def test_min_label_propagation_raises_instead_of_partial_labels(
        spark, monkeypatch):
    from material_parsers_spark import queries as q

    # force the DISTRIBUTED loop (the r6 small-graph union-find fast
    # path would otherwise solve this tiny graph exactly): the loop
    # must still raise rather than return partial labels
    monkeypatch.setattr(q, "_CC_LOCAL_EDGE_CAP", -1)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "a bigint, b_ bigint")
    with pytest.raises(RuntimeError, match="did not converge"):
        q.propagate_min_labels(edges, max_rounds=2)


def test_min_label_fast_path_matches_distributed_loop(spark, monkeypatch):
    """r6 focused test: the bounded union-find fast path and the
    distributed min-label loop must produce identical labels on a graph
    with multiple components, a long path, and a star."""
    from material_parsers_spark import queries as q

    raw = ([(i, i + 1) for i in range(25)]           # path 0..25
           + [(100, j) for j in range(101, 140)]     # star at 100
           + [(200, 201), (202, 201), (203, 202)])   # small tree
    edges = spark.createDataFrame(raw, "a bigint, b_ bigint")
    fast = {r.doc: r.label
            for r in q.propagate_min_labels(edges).collect()}
    monkeypatch.setattr(q, "_CC_LOCAL_EDGE_CAP", -1)
    dist = {r.doc: r.label
            for r in q.propagate_min_labels(edges).collect()}
    assert fast == dist
    assert fast[25] == 0 and fast[139] == 100 and fast[203] == 200


def test_minhash_components_cover_the_full_cluster(spark, stress_dir):
    """The components path has NO cap and still costs O(n): all 1,000
    duplicates resolve to one cluster labeled by the smallest doc_id."""
    df = SPARK_QUERIES["dedup_minhash_components"](spark, stress_dir)
    rows = df.collect()
    assert len(rows) == 1000  # every duplicate is clustered, none dropped
    assert {r.cluster_id for r in rows} == {0}
    assert {r.doc_id for r in rows} == set(range(1000))

    expected, columns = _oracle_rows(
        ORACLE_SQL["dedup_minhash_components"], stress_dir)
    assert value_hash([tuple(r) for r in rows], df.columns) == \
        value_hash(expected, columns)


def test_gopher_rules_survive_one_word_documents(spark, tmp_path_factory):
    """A 1-word document must yield top_bigram_frac = 0, not a Spark
    array-index crash (sequence(0,-1) is DESCENDING in Spark)."""
    base = tmp_path_factory.mktemp("oneword")
    df = spark.createDataFrame(
        [(1, "hello", "en", 5), (2, "two words here now ok", "en", 21)],
        "doc_id bigint, text string, lang string, n_chars bigint")
    df.write.mode("overwrite").parquet(str(base / "documents.parquet"))
    rows = {r.doc_id: r for r in
            SPARK_QUERIES["quality_gopher_rules"](spark, str(base)).collect()}
    assert rows[1].top_bigram_frac == 0.0
    assert rows[1].n_words == 1
    assert rows[2].top_bigram_frac > 0

    expected, columns = _oracle_rows(
        ORACLE_SQL["quality_gopher_rules"], str(base))
    got = [tuple(r) for r in rows.values()]
    assert value_hash(got, list(rows[1].asDict().keys())) == \
        value_hash(expected, columns)
