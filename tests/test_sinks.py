"""Sink tests (S8-S10): CoNLL labeling covers every token, JSONL/CSV round-
trip."""

import shutil
import tempfile

import pytest

from material_parsers_spark.pipeline.extraction import run_extraction
from material_parsers_spark.pipeline.session import build_session
from material_parsers_spark.pipeline.transcripts import generate_turns
from material_parsers_spark.sinks import (
    token_label_rows,
    write_conll,
    write_jsonl,
    write_span_csv,
)


@pytest.fixture(scope="module")
def spark():
    return build_session(app_name="sink-tests", master="local[4]",
                         shuffle_partitions=4)


@pytest.fixture(scope="module")
def extracted(spark):
    return run_extraction(generate_turns(spark, 60, partitions=2)).cache()


def test_conll_rows_cover_every_token(spark, extracted):
    rows = token_label_rows(extracted)
    n_tokens = extracted.selectExpr(
        "sum(size(extraction.tokens))").collect()[0][0]
    assert rows.count() == n_tokens
    sample = rows.where("turn_idx = 0") \
        .orderBy("conv_id", "token_pos").limit(7).collect()
    labels = [r.label for r in sample]
    assert labels[:4] == ["O", "O", "O", "O"]  # "The material " prefix
    assert labels[4].startswith("B-")
    assert labels[5].startswith("I-")


def test_sinks_roundtrip(spark, extracted):
    workdir = tempfile.mkdtemp(prefix="sinks-test-")
    try:
        write_conll(extracted, f"{workdir}/conll")
        write_jsonl(extracted, f"{workdir}/jsonl")
        write_span_csv(extracted, f"{workdir}/csv")
        assert spark.read.option("sep", "\t").csv(f"{workdir}/conll").count() > 0
        assert spark.read.json(f"{workdir}/jsonl").count() == 60
        csv = spark.read.option("header", "true").csv(f"{workdir}/csv")
        assert csv.columns == ["conv_id", "turn_idx", "span_text",
                               "span_type", "offset_start", "offset_end"]
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
