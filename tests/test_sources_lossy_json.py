"""LossyJSON (S2ORC) reader tests (S11) — semantics from
converters/misc/lossyJSON2text.py:10-36."""

import gzip
import json
import shutil
import tempfile

import pytest

from material_parsers_spark.pipeline.session import build_session
from material_parsers_spark.sources.lossy_json import read_sections

DOC1 = {
    "paper_id": "p1",
    "abstract": [
        {"text": " First sentence here. Second sentence there. ",
         "sentence_spans": [{"start": 0, "end": 20},
                            {"start": 21, "end": 43}]},
    ],
    "body_text": [
        {"text": "A plain body paragraph without spans."},
        {"text": "ab"},            # <= 2 chars after strip -> dropped
        {"text": "   "},           # blank -> dropped
    ],
}
DOC2 = {"paper_id": "p2", "body_text": [{"text": "Only body."}]}


@pytest.fixture(scope="module")
def spark():
    return build_session(app_name="lossy-tests", master="local[2]",
                         shuffle_partitions=2)


@pytest.fixture(scope="module")
def corpus(spark):
    workdir = tempfile.mkdtemp(prefix="lossy-test-")
    with gzip.open(f"{workdir}/part1.jsonl.gz", "wt") as fh:
        fh.write(json.dumps(DOC1) + "\n")
        fh.write(json.dumps(DOC2) + "\n")
    yield workdir
    shutil.rmtree(workdir, ignore_errors=True)


def test_sections_extracted(spark, corpus):
    rows = read_sections(spark, corpus).collect()
    by_paper = {}
    for row in rows:
        by_paper.setdefault(row.paper_id, []).append(row.section)
    assert by_paper["p2"] == ["Only body."]
    p1 = by_paper["p1"]
    assert "First sentence here." in p1
    assert "Second sentence there." in p1
    assert "A plain body paragraph without spans." in p1
    assert len(p1) == 3  # short/blank paragraphs dropped
