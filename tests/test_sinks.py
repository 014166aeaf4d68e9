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


def test_webanno_tsv_document_golden():
    """S5 golden: column layout, global offsets (+1 between paragraphs),
    per-entity marks, and relations on the destination's first token,
    pinned to the reference converter's emission
    (`converters/xml2tsv/xml2tsv.py:17-207`)."""
    from material_parsers_spark.sinks import webanno_tsv_document
    from material_parsers_spark.sources.tei import parse_tei_paragraphs

    xml = (
        '<TEI xmlns="http://www.tei-c.org/ns/1.0"><text><body>\n'
        '<p>The <rs type="material" xml:id="m1">MgB 2</rs> shows '
        '<rs type="tcValue" corresp="#m1" xml:id="t1">39 K</rs>.</p>\n'
        '</body></text></TEI>'
    )
    paragraphs, _, _ = parse_tei_paragraphs(xml)
    tsv = webanno_tsv_document(paragraphs)
    lines = tsv.splitlines()
    assert lines[0] == "#FORMAT=WebAnno TSV 3.2"
    assert lines[3] == ("#T_RL=webanno.custom.Supercon_link|relationships|"
                        "BT_webanno.custom.Supercon")
    assert "#Text=The MgB 2 shows 39 K." in lines
    body = [l for l in lines if l and l[0].isdigit()]
    assert body[0] == "1-1\t0-3\tThe\tbody[10000]\t_\t_\t_\t_\t"
    # relation lands on the destination (material) first token, naming the
    # source coordinates and [sourceEnt_destEnt]
    assert body[1] == ("1-2\t4-7\tMgB\tbody[10000]\t*[1]\tmaterial[1]\t"
                       "tcValue-material\t1-5[2_1]\t")
    assert body[4] == "1-5\t16-18\t39\tbody[10000]\t*[2]\ttcValue[2]\t_\t_\t"


def test_webanno_relationship_name_raises_like_reference():
    import pytest

    from material_parsers_spark.sinks import _webanno_relationship_name

    assert _webanno_relationship_name("<tcValue>", "<material>") == \
        "tcValue-material"
    assert _webanno_relationship_name("<tcValue>", "<me_method>") == \
        "tcValue-me_method"
    assert _webanno_relationship_name("<pressure>", "<tcValue>") == \
        "tcValue-pressure"
    with pytest.raises(ValueError):
        _webanno_relationship_name("<material>", "<tcValue>")


def test_write_webanno_distributed(spark, tmp_path):
    from material_parsers_spark.sinks import write_webanno
    from material_parsers_spark.sources.tei import (
        read_tei, synthesize_tei_corpus)

    corpus = str(tmp_path / "tei")
    synthesize_tei_corpus(corpus, n_docs=3, paragraphs_per_doc=2)
    out = str(tmp_path / "webanno")
    write_webanno(read_tei(spark, corpus + "/*.xml"), out)

    produced = list((tmp_path / "webanno").rglob("*.txt"))
    texts = [p.read_text() for p in produced]
    combined = "\n".join(texts)
    assert combined.count("#FORMAT=WebAnno TSV 3.2") == 3
    assert "tcValue-material" in combined


def test_sentence_classification_rows(spark, tmp_path):
    """S10 sentence-classification shape: one row per in-sentence entity
    pair, linked flag from the gold corresp graph, id = md5(sentence)."""
    import hashlib

    from material_parsers_spark.sinks import sentence_classification_rows
    from material_parsers_spark.sources.tei import (
        read_tei, synthesize_tei_corpus)

    corpus = str(tmp_path / "tei")
    synthesize_tei_corpus(corpus, n_docs=2, paragraphs_per_doc=4)
    rows = sentence_classification_rows(
        read_tei(spark, corpus + "/*.xml")).collect()
    # per doc: 3 simple paragraphs (1 pair, linked) + 1 decoy paragraph
    # (3 spans -> 3 pairs: decoy-material unlinked, decoy-tc linked,
    # material-tc unlinked)
    assert len(rows) == 2 * (3 * 1 + 3)
    linked = sum(r.linked for r in rows)
    assert linked == 2 * (3 + 1)
    for row in rows:
        assert row.id == hashlib.md5(row.sentence.encode()).hexdigest()
