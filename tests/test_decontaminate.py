"""Planted-contamination fixture for the benchmark-decontamination
operator (VERDICT r4 ask #2): documents sharing a 13-gram with held-out
eval documents must be flagged, the per-gram eval index must cap at 32
members (the hot-bucket guard), clean and too-short documents must
behave per contract, and the DuckDB oracle must agree on the fixture."""

import hashlib

import duckdb
import pytest

from material_parsers_spark.pipeline.session import build_session
from material_parsers_spark.queries import ORACLE_SQL, SPARK_QUERIES
from tests.conftest import h60
from tools.check_oracles import value_hash


def _is_eval(doc_id: int, mod: int = 20) -> bool:
    """Python mirror of the query's deterministic eval sample."""
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15],
               16) % mod == 0


COMMON_13 = " ".join(f"w{k}" for k in range(13))


@pytest.fixture(scope="module")
def spark():
    return build_session(app_name="decontaminate-tests", master="local[8]",
                         shuffle_partitions=8)


@pytest.fixture(scope="module")
def contaminated_dir(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("contam")
    eval_ids = [i for i in range(5000) if _is_eval(i)][:40]
    assert len(eval_ids) == 40
    assert not any(_is_eval(i) for i in (1, 2, 3, 4, 5))
    rows = []
    # 40 eval docs all containing COMMON_13 (plus a per-doc tail so the
    # docs are distinct): 40 > the 32-member per-gram cap
    for i in eval_ids:
        rows.append((i, f"{COMMON_13} eval{i}", "en"))
    # corpus doc 1: contains the eval 13-gram -> flagged
    rows.append((1, f"{COMMON_13} unique1a unique1b", "en"))
    # corpus doc 2: 13+ words, no overlap -> present, unflagged
    rows.append((2, " ".join(f"clean{k}" for k in range(15)), "en"))
    # corpus doc 3: under 13 words -> no row at all
    rows.append((3, "too short for thirteen", "en"))
    # corpus doc 4: two disjoint eval windows around a clean word ->
    # span repair must excise the union and keep only "mid"
    rows.append((4, f"{COMMON_13} mid {COMMON_13}", "en"))
    # corpus doc 5: exactly the eval 13-gram -> kept set is EMPTY
    # (pins the concat_ws("")/array_to_string(NULL) parity edge)
    rows.append((5, COMMON_13, "en"))
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    df.write.mode("overwrite").parquet(str(base / "documents.parquet"))
    return str(base)


def test_planted_contamination_flags_and_cap(spark, contaminated_dir):
    rows = {r.doc_id: r for r in SPARK_QUERIES["decontaminate_ngrams"](
        spark, contaminated_dir).collect()}
    # eval docs never appear in the output
    assert all(not _is_eval(d) for d in rows)
    # doc 1: 15 words -> 3 distinct 13-grams, exactly one contaminated
    r1 = rows[1]
    assert r1.flagged
    assert r1.total_ngrams == 3
    assert r1.contaminated_ngrams == 1
    # 40 eval docs share the gram but the inverted index caps at 32
    assert r1.eval_docs_hit == 32
    assert r1.contamination_frac == pytest.approx(1 / 3, abs=1e-6)
    # doc 2: present and clean
    r2 = rows[2]
    assert not r2.flagged
    assert r2.contaminated_ngrams == 0
    assert r2.eval_docs_hit == 0
    assert r2.contamination_frac == 0.0
    # doc 3: too short for any 13-gram -> absent
    assert 3 not in rows


def test_span_removal_excises_covered_positions(spark, contaminated_dir):
    rows = {r.doc_id: r for r in SPARK_QUERIES["decontaminate_span_removal"](
        spark, contaminated_dir).collect()}
    assert all(not _is_eval(d) for d in rows)
    # doc 1: one matched gram at position 0 -> words 0..12 removed,
    # the two unique tail words survive
    r1 = rows[1]
    assert (r1.n_words, r1.n_contaminated_grams) == (15, 1)
    assert r1.n_removed_words == 13
    assert r1.cleaned_hash == h60("unique1a unique1b")
    # doc 2: clean -> nothing removed, hash of the original text
    r2 = rows[2]
    assert r2.n_contaminated_grams == 0 and r2.n_removed_words == 0
    assert r2.cleaned_hash == h60(" ".join(f"clean{k}" for k in range(15)))
    # doc 3: under 13 words -> absent (same row universe as the flag op)
    assert 3 not in rows
    # doc 4: matched windows at positions 0 and 14 -> union covers all
    # but the middle word
    r4 = rows[4]
    assert (r4.n_words, r4.n_contaminated_grams) == (27, 2)
    assert r4.n_removed_words == 26
    assert r4.cleaned_hash == h60("mid")
    # doc 5: fully contaminated -> empty kept set hashes the empty string
    r5 = rows[5]
    assert (r5.n_removed_words, r5.removed_frac) == (13, 1.0)
    assert r5.cleaned_hash == h60("")


def test_eval_leakage_report_transposes_the_flags(spark, contaminated_dir):
    rows = {r.eval_id: r for r in SPARK_QUERIES["eval_leakage_report"](
        spark, contaminated_dir).collect()}
    # one row per eval doc, none for corpus docs
    assert all(_is_eval(d) for d in rows)
    assert len(rows) == 40
    for r in rows.values():
        # 14 words -> 2 distinct grams; only COMMON_13 leaks, into
        # corpus docs 1, 4, 5 — the 39 OTHER eval docs sharing it are
        # NOT leakage
        assert (r.n_grams, r.n_leaked_grams) == (2, 1)
        assert r.leak_frac == pytest.approx(0.5, abs=1e-6)
        assert r.corpus_docs_hit == 3


def test_eval_leakage_fixture_oracle_parity(spark, contaminated_dir):
    df = SPARK_QUERIES["eval_leakage_report"](spark, contaminated_dir)
    spark_rows = [tuple(r) for r in df.collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{contaminated_dir}/documents.parquet/*.parquet'")
    result = con.execute(ORACLE_SQL["eval_leakage_report"])
    oracle_rows = result.fetchall()
    oracle_cols = [d[0] for d in result.description]
    assert len(spark_rows) == len(oracle_rows)
    assert sorted(df.columns) == sorted(oracle_cols)
    assert value_hash(spark_rows, df.columns) == \
        value_hash(oracle_rows, oracle_cols)


def test_span_removal_fixture_oracle_parity(spark, contaminated_dir):
    df = SPARK_QUERIES["decontaminate_span_removal"](spark, contaminated_dir)
    spark_rows = [tuple(r) for r in df.collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{contaminated_dir}/documents.parquet/*.parquet'")
    result = con.execute(ORACLE_SQL["decontaminate_span_removal"])
    oracle_rows = result.fetchall()
    oracle_cols = [d[0] for d in result.description]
    assert len(spark_rows) == len(oracle_rows)
    assert sorted(df.columns) == sorted(oracle_cols)
    assert value_hash(spark_rows, df.columns) == \
        value_hash(oracle_rows, oracle_cols)


def test_fixture_oracle_parity(spark, contaminated_dir):
    df = SPARK_QUERIES["decontaminate_ngrams"](spark, contaminated_dir)
    spark_rows = [tuple(r) for r in df.collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{contaminated_dir}/documents.parquet/*.parquet'")
    result = con.execute(ORACLE_SQL["decontaminate_ngrams"])
    oracle_rows = result.fetchall()
    oracle_cols = [d[0] for d in result.description]
    assert len(spark_rows) == len(oracle_rows)
    assert sorted(df.columns) == sorted(oracle_cols)
    assert value_hash(spark_rows, df.columns) == \
        value_hash(oracle_rows, oracle_cols)
