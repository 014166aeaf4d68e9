"""PII scrub operator: planted-PII fixture (emails, phones, IPs),
redaction content checks, Spark/DuckDB oracle parity on the fixture, and
the corpus-level invariant that the planted transcript template flags."""

import duckdb
import pytest
from pyspark.sql import functions as F

from material_parsers_spark.pipeline.session import build_session
from material_parsers_spark.queries import (
    SPARK_QUERIES,
    _pii_oracle_sql,
    pii_scrub,
)
from tools.check_oracles import value_hash


@pytest.fixture(scope="module")
def spark():
    return build_session(app_name="pii-tests", master="local[4]",
                         shuffle_partitions=4)


@pytest.fixture(scope="module")
def pii_docs(spark):
    rows = [
        (1, "reach me at alice.smith+lab@uni-example.org today"),
        (2, "call +1-555-0100 or 44-020-123456 now"),
        (3, "server at 192.168.0.1 and 10.0.0.255 responded"),
        (4, "mixed: bob@example.com then +1-555-0199 then 127.0.0.1"),
        (5, "clean text with no personal identifiers at all"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_planted_pii_counts_and_redaction(spark, pii_docs):
    rows = {r.doc_id: r for r in pii_scrub(pii_docs).collect()}
    assert (rows[1].n_emails, rows[1].n_phones, rows[1].n_ips) == (1, 0, 0)
    assert (rows[2].n_emails, rows[2].n_phones, rows[2].n_ips) == (0, 2, 0)
    assert (rows[3].n_emails, rows[3].n_phones, rows[3].n_ips) == (0, 0, 2)
    assert (rows[4].n_emails, rows[4].n_phones, rows[4].n_ips) == (1, 1, 1)
    assert rows[4].n_pii == 3 and rows[4].flagged
    assert rows[5].n_pii == 0 and not rows[5].flagged


def test_redacted_text_has_no_pii_left(spark, pii_docs):
    """Apply the same replacement chain and assert the scrubbed text
    carries the placeholders and none of the original identifiers."""
    from material_parsers_spark.queries import PII_PATTERNS

    redacted = F.col("text")
    for _, pat, repl in PII_PATTERNS:
        redacted = F.regexp_replace(redacted, pat, repl)
    texts = {r.doc_id: r.scrubbed for r in
             pii_docs.select("doc_id", redacted.alias("scrubbed"))
             .collect()}
    assert texts[1] == "reach me at <EMAIL> today"
    assert texts[2] == "call <PHONE> or <PHONE> now"
    assert texts[3] == "server at <IP> and <IP> responded"
    assert texts[4] == "mixed: <EMAIL> then <PHONE> then <IP>"
    assert texts[5] == "clean text with no personal identifiers at all"


def test_fixture_oracle_parity(spark, pii_docs, tmp_path):
    path = str(tmp_path / "documents.parquet")
    pii_docs.write.mode("overwrite").parquet(path)
    df = pii_scrub(spark.read.parquet(path))
    spark_rows = [tuple(r) for r in df.collect()]
    con = duckdb.connect()
    result = con.execute(_pii_oracle_sql(
        f"SELECT doc_id, text FROM '{path}/*.parquet'"))
    oracle_rows = result.fetchall()
    oracle_cols = [d[0] for d in result.description]
    assert sorted(df.columns) == sorted(oracle_cols)
    assert value_hash(spark_rows, df.columns) == \
        value_hash(oracle_rows, oracle_cols)


def test_planted_template_flags_conversations(spark):
    """The synthetic corpus plants an email+phone template
    (transcripts.py TEMPLATES[15]); most multi-turn conversations must
    flag, and every flag must come with a matching email+phone count."""
    from material_parsers_spark.queries import clear_turns_cache

    clear_turns_cache()
    df = SPARK_QUERIES["conversation_pii_scrub"](
        spark, "/root/testdata/sf0.001")
    rows = df.collect()
    flagged = [r for r in rows if r.flagged]
    assert len(flagged) > len(rows) // 2
    for r in flagged:
        assert r.n_emails >= 1 and r.n_phones >= 1 and r.n_ips == 0
